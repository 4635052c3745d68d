"""scan_layers FFT stack: one lax.scan over a stacked layer axis must be
numerically identical to the unrolled per-layer stack (VERDICT r4 #5 —
op-count lever for the training step; layers.py::FFTransformer)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_arabic_tpu.models.layers import (FFTransformer, stack_fft_params,
                                          unstack_fft_params)

KW = dict(n_layer=3, n_head=1, d_model=64, d_head=64, d_inner=128,
          kernel_size=3, dropout=0.1, dropatt=0.1, embed_input=True,
          n_embed=40)


@pytest.fixture(scope="module")
def pair():
    loop = FFTransformer(**KW)
    scan = FFTransformer(**KW, scan_layers=True)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(1, 40, (2, 17)), jnp.int32)
    v_loop = loop.init(jax.random.PRNGKey(0), tokens)
    return loop, scan, tokens, v_loop["params"]


def test_forward_bitwise_equal(pair):
    loop, scan, tokens, p_loop = pair
    stacked = stack_fft_params(p_loop)
    y_loop, m1 = loop.apply({"params": p_loop}, tokens, deterministic=True)
    y_scan, m2 = scan.apply({"params": stacked}, tokens, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y_loop), np.asarray(y_scan))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_grads_match(pair):
    loop, scan, tokens, p_loop = pair
    stacked = stack_fft_params(p_loop)

    def loss(mod, p):
        y, _ = mod.apply({"params": p}, tokens, deterministic=True)
        return jnp.sum(y**2)

    g_loop = jax.grad(lambda p: loss(loop, p))(p_loop)
    g_scan = jax.grad(lambda p: loss(scan, p))(stacked)
    g_scan_unstacked = unstack_fft_params(g_scan)
    flat_a = jax.tree_util.tree_leaves_with_path(g_loop)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(g_scan_unstacked))
    for path, a in flat_a:
        b = flat_b[path]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_param_layouts_roundtrip(pair):
    loop, scan, tokens, p_loop = pair
    stacked = stack_fft_params(p_loop)
    v_scan = scan.init(jax.random.PRNGKey(1), tokens)
    # stacked layout structurally matches a scan-model init
    jax.tree_util.tree_map(lambda a, b: None, stacked, v_scan["params"])
    rt = unstack_fft_params(stacked)
    ok = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
        rt, p_loop))
    assert ok


def test_train_mode_dropout_varies_per_layer(pair):
    """split_rngs must give each scanned layer its own dropout mask: with
    nonzero dropout, the scan output differs from the loop output only via
    rng layout (both finite), and two different rng keys differ."""
    loop, scan, tokens, p_loop = pair
    stacked = stack_fft_params(p_loop)
    y1, _ = scan.apply({"params": stacked}, tokens, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    y2, _ = scan.apply({"params": stacked}, tokens, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(2)})
    assert bool(jnp.isfinite(y1).all()) and bool(jnp.isfinite(y2).all())
    assert float(jnp.abs(y1 - y2).max()) > 0


def test_fastpitch_train_forward_scan_equivalent():
    """Full FastPitch forward_train under scan_layers: same outputs as the
    unrolled model given converted params (tiny config)."""
    from tts_arabic_tpu.models.fastpitch import FastPitch, FastPitchConfig

    small = dict(d_model=32, enc_n_layers=2, dec_n_layers=2,
                 enc_d_head=32, dec_d_head=32, enc_filter_size=64,
                 dec_filter_size=64, dur_filter_size=32,
                 pitch_filter_size=32, energy_filter_size=32)
    rng = np.random.default_rng(0)
    B, T_txt, T_mel = 2, 12, 40
    args = (
        jnp.asarray(rng.integers(1, 40, (B, T_txt)), jnp.int32),
        jnp.full((B,), T_txt, jnp.int32),
        jnp.asarray(rng.standard_normal((B, T_mel, 80)), jnp.float32),
        jnp.full((B,), T_mel, jnp.int32),
        jnp.asarray(rng.standard_normal((B, 1, T_mel)), jnp.float32),
        jnp.asarray(np.abs(rng.standard_normal((B, T_mel))), jnp.float32),
        jnp.full((B, T_mel, T_txt), 1.0 / T_txt, jnp.float32),
        jnp.full((B, T_txt), T_mel / T_txt, jnp.float32),
    )
    m_loop = FastPitch(FastPitchConfig(**small))
    m_scan = FastPitch(FastPitchConfig(**small, scan_layers=True))
    v = m_loop.init(jax.random.PRNGKey(0), *args, deterministic=True,
                    method=FastPitch.forward_train)
    p = dict(v["params"])
    p["encoder"] = stack_fft_params(p["encoder"])
    p["decoder"] = stack_fft_params(p["decoder"])
    out_loop = m_loop.apply(v, *args, deterministic=True,
                            method=FastPitch.forward_train)
    out_scan = m_scan.apply({"params": p}, *args, deterministic=True,
                            method=FastPitch.forward_train)
    la, lb = jax.tree_util.tree_leaves(out_loop), \
        jax.tree_util.tree_leaves(out_scan)
    assert len(la) == len(lb)
    # scan-body compilation reassociates fusions: ~1e-6 accumulation noise
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
