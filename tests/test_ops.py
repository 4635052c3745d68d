"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on
TPU by bench/verify runs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_arabic_tpu.align import mas
from tts_arabic_tpu.ops import mas_fused
from tts_arabic_tpu.ops.mas_pallas import mas_pallas


def _case(seed, B=4, T_mel=96, T_txt=24):
    rng = np.random.default_rng(seed)
    attn = np.log(rng.random((B, T_mel, T_txt)).astype(np.float32) + 1e-3)
    in_lens = rng.integers(2, T_txt + 1, B).astype(np.int32)
    out_lens = rng.integers(in_lens, T_mel + 1).astype(np.int32)
    return attn, in_lens, out_lens


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mas_pallas_matches_lax(seed):
    attn, in_lens, out_lens = _case(seed)
    ref = np.asarray(mas(jnp.asarray(attn), jnp.asarray(in_lens),
                         jnp.asarray(out_lens)))
    got = np.asarray(mas_pallas(jnp.asarray(attn), jnp.asarray(in_lens),
                                jnp.asarray(out_lens), interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_mas_fused_dispatches_off_tpu():
    attn, in_lens, out_lens = _case(3)
    out = np.asarray(mas_fused(jnp.asarray(attn), jnp.asarray(in_lens),
                               jnp.asarray(out_lens)))
    ref = np.asarray(mas(jnp.asarray(attn), jnp.asarray(in_lens),
                         jnp.asarray(out_lens)))
    np.testing.assert_array_equal(out, ref)
