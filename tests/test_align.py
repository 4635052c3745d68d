"""MAS differential tests vs the reference numba kernel (run as plain
python via the stub) + prior checks."""
import numpy as np
import pytest

import jax.numpy as jnp

from ref_loader import load_reference
from tts_arabic_tpu.align import (BetaBinomialInterpolator, beta_binomial_prior,
                                  mas, mas_durations)


@pytest.fixture(scope="module")
def ref_mas(reference_dir):
    load_reference(reference_dir)
    from models.fastpitch.fastpitch.alignment import mas_width1
    return mas_width1


def test_mas_matches_reference(ref_mas):
    rng = np.random.default_rng(0)
    B, T_mel, T_txt = 5, 37, 11
    attn = rng.random((B, T_mel, T_txt)).astype(np.float32) + 1e-3
    log_attn = np.log(attn)
    # note: in_len >= 2 — the reference kernel index-wraps (and as plain
    # python raises) at in_len == 1; ours guards j > 0 and stays correct
    in_lens = np.array([11, 7, 11, 3, 2])
    out_lens = np.array([37, 30, 14, 37, 5])

    ours = np.asarray(mas(jnp.asarray(log_attn), jnp.asarray(in_lens),
                          jnp.asarray(out_lens)))
    for b in range(B):
        ref = ref_mas(log_attn[b, :out_lens[b], :in_lens[b]].copy())
        np.testing.assert_array_equal(
            ours[b, :out_lens[b], :in_lens[b]], ref,
            err_msg=f"sample {b}")
        # zeros outside valid region
        assert ours[b, out_lens[b]:].sum() == 0
        assert ours[b, :, in_lens[b]:].sum() == 0


def test_mas_properties():
    rng = np.random.default_rng(1)
    attn = np.log(rng.random((2, 50, 9)).astype(np.float32) + 1e-4)
    in_lens = np.array([9, 6])
    out_lens = np.array([50, 41])
    hard, durs = mas_durations(jnp.asarray(np.exp(attn)),
                               jnp.asarray(in_lens), jnp.asarray(out_lens))
    hard = np.asarray(hard)
    durs = np.asarray(durs)
    for b in range(2):
        # each valid mel frame attends exactly one token
        assert (hard[b, :out_lens[b]].sum(-1) == 1).all()
        # durations sum to mel length and are monotonic coverage
        assert durs[b].sum() == out_lens[b]
        assert durs[b, in_lens[b]:].sum() == 0
        path = hard[b, :out_lens[b]].argmax(-1)
        assert ((np.diff(path) == 0) | (np.diff(path) == 1)).all()
        assert path[0] == 0 and path[-1] == in_lens[b] - 1


def test_beta_binomial_prior_shape_and_rows():
    p = beta_binomial_prior(12, 40)
    assert p.shape == (40, 12)
    # rows are BetaBinom(n=P) pmfs truncated to 0..P-1 (reference evaluates
    # x=arange(P), data_function.py:71-77), so late rows sum to < 1
    assert (p.sum(axis=1) <= 1.0 + 1e-6).all()
    # diagonal-ish: argmax advances with the mel frame
    centers = p.argmax(axis=1)
    assert (np.diff(centers) >= 0).all()


def test_interpolator_matches_reference_shapes(reference_dir):
    load_reference(reference_dir)
    import torch  # noqa: F401  (reference module imports it)
    from models.fastpitch.fastpitch.data_function import (
        BetaBinomialInterpolator as RefInterp)
    ours = BetaBinomialInterpolator()
    theirs = RefInterp()
    for w, h in [(123, 17), (514, 33), (77, 8)]:
        a = ours(w, h)
        b = theirs(w, h).numpy() if hasattr(theirs(w, h), "numpy") else \
            np.asarray(theirs(w, h))
        assert a.shape == (w, h)
        np.testing.assert_allclose(a, b, atol=1e-5)
