"""Tensor-parallel (Megatron-style FFN split) tests on the virtual mesh.

The TP axis shards each ConvFFN's d_inner contraction over 'model'
(`parallel/tp.py`); these tests pin (a) the sharding rule touches ONLY
the FFN pair, (b) params are genuinely distributed (per-device shard is
a slice, not a replica), and (c) the DPxTP mel-infer matches the
single-device program numerically.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tts_arabic_tpu.models.fastpitch import FastPitch, FastPitchConfig
from tts_arabic_tpu.parallel.tp import (MODEL_AXIS, fastpitch_tp_shardings,
                                        make_mesh_dp_tp, tp_mel_infer_jit)

CFG = FastPitchConfig(
    d_model=32, enc_n_layers=2, dec_n_layers=2, enc_d_head=8, dec_d_head=8,
    enc_filter_size=64, dec_filter_size=64, dur_filter_size=16,
    pitch_filter_size=16, energy_filter_size=16, attn_channels=8)


@pytest.fixture(scope="module")
def model_vars_tokens():
    model = FastPitch(CFG)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(1, 40, (4, 12)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens, max_frames=64,
                           method=FastPitch.infer)
    # random init predicts ~0 frames/token; bias to a few so the
    # regulated mel actually has content to compare
    fc = variables["params"]["duration_predictor"]["fc"]
    fc["bias"] = fc["bias"] + 2.0
    return model, variables, tokens


def test_tp_shardings_touch_only_the_ffn_pair(model_vars_tokens):
    _, variables, _ = model_vars_tokens
    mesh = make_mesh_dp_tp(2, 4)
    shardings = fastpitch_tp_shardings(variables, mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    sharded = {tuple(getattr(k, "key", "") for k in path)
               for path, s in flat if s.spec != P()}
    # 2 enc + 2 dec FFN blocks x {conv1.kernel, conv1.bias, conv2.kernel}
    assert len(sharded) == 12, sorted(sharded)
    for path in sharded:
        assert "ff" in path and path[-2] in ("conv1", "conv2"), path


def test_mesh_dp_tp_rejects_too_few_devices():
    with pytest.raises(ValueError, match="needs 16 devices"):
        make_mesh_dp_tp(4, 4)  # virtual mesh has 8


def test_tp_compiles_exactly_one_all_reduce_per_ffn(model_vars_tokens):
    """The load-bearing perf property (tp.py docstring): each ConvFFN's
    row-parallel conv2 contributes exactly ONE all-reduce of partial
    sums, and the hidden [B, T, d_inner/n] activation is never resharded
    (no all-gather / all-to-all / collective-permute between the convs).
    Pinned by counting collectives in the compiled HLO so a layer change
    that regresses to activation resharding fails loudly even though
    exactness tests still pass."""
    model, variables, tokens = model_vars_tokens
    mesh = make_mesh_dp_tp(2, 4)
    fn, sharded_vars = tp_mel_infer_jit(model, variables, mesh,
                                        max_frames=64)
    hlo = fn.lower(sharded_vars, tokens).compile().as_text()
    n_ffn = CFG.enc_n_layers + CFG.dec_n_layers
    # one all-reduce per FFN block + at most one for the replicated
    # output spec (GSPMD sometimes folds it into an existing reduce)
    import re
    n_ar = len(re.findall(r"\ball-reduce(?:-start)?\(", hlo))
    assert n_ffn <= n_ar <= n_ffn + 1, f"all-reduce count {n_ar}"
    assert not re.search(r"\ball-to-all\(", hlo)
    assert not re.search(r"\bcollective-permute(?:-start)?\(", hlo)
    # the ONLY all-gathers allowed are the replicated-output collections
    # (mel + mel_lens) over the batch axis — dimensions={0}; an FFN
    # activation reshard would gather the hidden (minor) dimension
    ag_lines = [l for l in hlo.splitlines()
                if re.search(r"\ball-gather(?:-start)?\(", l)]
    assert len(ag_lines) <= 2, ag_lines
    for line in ag_lines:
        assert "dimensions={0}" in line, f"non-batch all-gather: {line}"


def test_tp_infer_matches_single_device(model_vars_tokens):
    model, variables, tokens = model_vars_tokens
    mesh = make_mesh_dp_tp(2, 4)
    fn, sharded_vars = tp_mel_infer_jit(model, variables, mesh,
                                        max_frames=64)

    # the FFN hidden dim is genuinely distributed: each device holds a
    # 64/4-slice of conv1's kernel, not a replica
    k1 = sharded_vars["params"]["encoder"]["layer_0"]["ff"]["conv1"]["kernel"]
    assert MODEL_AXIS in tuple(k1.sharding.spec)
    assert k1.addressable_shards[0].data.shape[-1] == k1.shape[-1] // 4

    mel_tp, lens_tp = jax.device_get(fn(sharded_vars, tokens))

    ref_fn = jax.jit(lambda v, t: model.apply(
        v, t, max_frames=64, method=FastPitch.infer))
    ref = jax.device_get(ref_fn(variables, tokens))

    np.testing.assert_array_equal(lens_tp, ref["mel_lens"])
    np.testing.assert_allclose(mel_tp, ref["mel"], rtol=2e-4, atol=2e-5)
