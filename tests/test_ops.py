"""Pallas kernel tests (interpret mode on CPU; the COMPILED path is
exercised on the real chip by tools/chip_check.py — interpret mode cannot
catch Mosaic compiler regressions, see docs/PERF.md)."""
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


# ---- HiFi-GAN pallas resblock / generator ------------------------------

from tts_arabic_tpu.ops.hifigan_pallas import (generator_apply_pallas,
                                               resblock_pallas,
                                               resblock_pallas_packed)
from tts_arabic_tpu.vocoder.hifigan import Generator, HiFiGANConfig, ResBlock1


@pytest.mark.parametrize("C,k,dil,t_tile", [
    (32, 11, (1, 3, 5), 128),    # worst halo; multi-tile
    (64, 7, (1, 3, 5), 128),
    (128, 3, (1, 3, 5), 64),
    (32, 11, (1, 3, 5), 512),    # single tile, T < t_tile
])
def test_resblock_pallas_matches_flax(C, k, dil, t_tile):
    rng = jax.random.PRNGKey(0)
    rb = ResBlock1(C, k, dil)
    x = jax.random.normal(rng, (2, 300, C), jnp.float32)
    v = rb.init(rng, x)
    ref = np.asarray(rb.apply(v, x))
    got = np.asarray(resblock_pallas(x, v["params"], k, dil,
                                     t_tile=t_tile, interpret=True))
    # tolerance: f32 reassociation noise amplified by the 6-conv residual
    # chain + leaky-relu kinks (single conv agrees to ~4e-7)
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=0)
    assert float(np.abs(got - ref).mean()) < 1e-4


@pytest.mark.parametrize("C,k,dil,T", [
    (32, 11, (1, 3, 5), 300),    # P=4, worst halo, T not tile-aligned
    (32, 3, (1, 3, 5), 4096),    # exactly one tile
    (64, 7, (1, 3, 5), 2500),    # P=2, multi-tile
    (64, 11, (1, 3, 5), 130),    # tiny T << t_tile
])
def test_resblock_pallas_packed_matches_flax(C, k, dil, T):
    rng = jax.random.PRNGKey(2)
    rb = ResBlock1(C, k, dil)
    x = jax.random.normal(rng, (2, T, C), jnp.float32)
    v = rb.init(rng, x)
    ref = np.asarray(rb.apply(v, x))
    got = np.asarray(resblock_pallas_packed(x, v["params"], k, dil,
                                            interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=0)
    assert float(np.abs(got - ref).mean()) < 1e-4


@pytest.mark.parametrize("C,k,dil,T", [
    (32, 3, (1, 3, 5), 320),     # P=4
    (32, 7, (1, 3, 5), 320),
    (32, 11, (1, 3, 5), 4096),
    (64, 11, (1, 3, 5), 2500),   # P=2
    (16, 7, (1, 3, 5), 128),     # P=8
])
def test_resblock_packed_xla_matches_flax(C, k, dil, T):
    """The plain-XLA packed-lane rewrite is numerically EXACT data movement
    + the same multiplies; only f32 reassociation noise is allowed."""
    from tts_arabic_tpu.ops.hifigan_pallas import resblock_packed_xla

    rng = jax.random.PRNGKey(3)
    rb = ResBlock1(C, k, dil)
    x = jax.random.normal(rng, (2, T, C), jnp.float32)
    v = rb.init(rng, x)
    ref = np.asarray(rb.apply(v, x))
    got = np.asarray(jax.jit(
        lambda x: resblock_packed_xla(x, v["params"], k, dil))(x))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=0)


def test_generator_apply_pallas_packed_xla_strategy():
    cfg = HiFiGANConfig()
    gen = Generator(cfg)
    rng = jax.random.PRNGKey(4)
    mel = jax.random.normal(rng, (2, 24, 80), jnp.float32) - 5.0
    v = gen.init(rng, mel)
    ref = np.asarray(gen.apply(v, mel))
    got = np.asarray(generator_apply_pallas(v, mel, cfg,
                                            strategy="packed_xla"))
    assert got.shape == ref.shape
    snr = 10 * np.log10(np.mean(ref ** 2) /
                        (np.mean((ref - got) ** 2) + 1e-20))
    assert snr > 60.0, snr


def test_generator_apply_pallas_matches_flax():
    cfg = HiFiGANConfig()
    gen = Generator(cfg)
    rng = jax.random.PRNGKey(1)
    mel = jax.random.normal(rng, (2, 23, 80), jnp.float32) - 5.0
    v = gen.init(rng, mel)
    ref = np.asarray(gen.apply(v, mel))
    got = np.asarray(generator_apply_pallas(v, mel, cfg, interpret=True))
    assert got.shape == ref.shape
    snr = 10 * np.log10(np.mean(ref ** 2) /
                        (np.mean((ref - got) ** 2) + 1e-20))
    assert snr > 60.0, snr


# ---- chunked_vocode path equivalence ------------------------------------

from tts_arabic_tpu.vocoder.hifigan import chunked_vocode


def test_chunked_vocode_paths_agree():
    """Direct, batch-split, and time-chunk paths of chunked_vocode must
    produce the same waveform (tiny direct_limit forces each path)."""
    cfg = HiFiGANConfig()
    gen = Generator(cfg)
    rng = jax.random.PRNGKey(3)
    B, F = 3, 40
    mel = jax.random.normal(rng, (B, F, cfg.num_mels), jnp.float32) - 5.0
    v = gen.init(rng, mel)

    direct = np.asarray(chunked_vocode(gen.apply, v, mel))
    # B*F=120 > 50, F=40 <= 50: batch-split path, group=1 (uneven pad)
    bsplit = np.asarray(chunked_vocode(gen.apply, v, mel, direct_limit=50))
    # F=40 > direct_limit=8 and > window: time-chunk overlap-discard path
    tchunk = np.asarray(chunked_vocode(gen.apply, v, mel, core=16,
                                       overlap=16, slab=4, direct_limit=8))
    assert direct.shape == bsplit.shape == tchunk.shape == (B, F * 256)
    np.testing.assert_allclose(bsplit, direct, atol=2e-6, rtol=0)
    np.testing.assert_allclose(tchunk, direct, atol=2e-6, rtol=0)


@pytest.mark.parametrize("C_in,C_out,u,k,T", [
    (64, 32, 2, 4, 96),     # up_3: P=4
    (128, 64, 2, 4, 50),    # up_2: P=2
])
def test_conv_transpose_packed_out_matches_dense(C_in, C_out, u, k, T):
    from tts_arabic_tpu.ops.hifigan_pallas import conv_transpose_packed_out
    from tts_arabic_tpu.vocoder.hifigan import conv_transpose_1d

    rng = jax.random.PRNGKey(5)
    x = jax.random.normal(rng, (2, T, C_in), jnp.float32)
    kernel = jax.random.normal(jax.random.PRNGKey(6), (k, C_in, C_out),
                               jnp.float32)
    bias = jax.random.normal(jax.random.PRNGKey(7), (C_out,), jnp.float32)
    P = 128 // C_out
    ref = np.asarray(conv_transpose_1d(x, kernel, bias, u, (k - u) // 2))
    got = np.asarray(conv_transpose_packed_out(x, kernel, bias, u,
                                               (k - u) // 2, P))
    assert got.shape == (2, ref.shape[1] // P, P * C_out)
    np.testing.assert_allclose(
        got.reshape(2, -1, C_out), ref, atol=2e-5, rtol=0)


@pytest.mark.parametrize("seed", [0, 1])
def test_ctc_loss_matches_optax_and_torch(seed):
    """ops/ctc.py (unrolled scan, final-carry-only) == optax.ctc_loss in
    value AND gradient, and == torch.nn.CTCLoss (the reference's backend,
    attn_loss_function.py:20-61) in value, for ragged batches."""
    import optax
    import torch
    from tts_arabic_tpu.ops.ctc import ctc_loss

    rng = np.random.default_rng(seed)
    B, T, K, N = 4, 41, 19, 14
    logits = jnp.asarray(rng.normal(size=(B, T, K)), jnp.float32)
    llens = rng.integers(1, N + 1, B)
    tlens = np.maximum(rng.integers(1, T + 1, B), 2 * llens + 1)
    labels = jnp.asarray(rng.integers(1, K, (B, N)), jnp.int32)
    lp = jnp.asarray(np.arange(N)[None] >= llens[:, None], jnp.float32)
    tp = jnp.asarray(np.arange(T)[None] >= tlens[:, None], jnp.float32)

    ref = optax.ctc_loss(logits, tp, labels, lp, blank_id=0)
    for unroll in (1, 8):
        got = ctc_loss(logits, tp, labels, lp, unroll=unroll)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
    g_ref = jax.grad(lambda x: optax.ctc_loss(x, tp, labels, lp).sum())(
        logits)
    g_got = jax.grad(lambda x: ctc_loss(x, tp, labels, lp).sum())(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)

    # torch reference (sum over batch of per-seq NLL, no normalization)
    lsm = torch.log_softmax(
        torch.tensor(np.asarray(logits)), dim=-1).transpose(0, 1)
    t_loss = torch.nn.CTCLoss(blank=0, reduction="none")(
        lsm, torch.tensor(np.asarray(labels)),
        torch.tensor(tlens, dtype=torch.long),
        torch.tensor(llens, dtype=torch.long))
    got = ctc_loss(logits, tp, labels, lp)
    np.testing.assert_allclose(np.asarray(got), t_loss.numpy(),
                               rtol=1e-4, atol=1e-4)
