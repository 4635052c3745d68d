"""Adversarial training components.

JAX equivalents of the reference GAN recipe (`models/common/loss.py`):
- `PatchDiscriminator`: 5 spectral-normalized 2D convs (k5, s2, LeakyReLU
  0.2) over mel chunks, returning (flattened score, 4 feature maps)
- spectral normalization with 1-step power iteration; the iteration vector
  `u` lives in a mutable 'spectral' variable collection threaded through the
  train step. (The reference divides the stored weight in place each forward,
  `loss.py:62-71`; we use the standard w/sigma-at-use formulation — same
  normalization, explicit state.)
- `extract_chunks`: random fixed-length mel chunks (`loss.py:9-28`)
- feature-matching loss (`loss.py:31-41`)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class SNConv2D(nn.Module):
    features: int
    kernel_size: int = 5
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.normal(0.02),
            (k, k, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        u = self.variable(
            "spectral", "u",
            lambda: jax.random.truncated_normal(
                self.make_rng("params"), -2.0, 2.0, (self.features, 1)))

        w_mat = kernel.reshape(-1, self.features).T  # [out, k*k*in]
        w_stop = jax.lax.stop_gradient(w_mat)
        v = _l2(w_stop.T @ u.value)
        u_new = _l2(w_stop @ v)
        if not self.is_initializing():
            u.value = u_new
        sigma = (u_new.T @ w_stop @ v)[0, 0]
        w_sn = kernel / sigma

        pad = (k - 1) // 2
        y = jax.lax.conv_general_dilated(
            x, w_sn, window_strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias


def _l2(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x), eps)


class PatchDiscriminator(nn.Module):
    """Mel-chunk critic (`loss.py:94-111`). Input [B, T, F, 1] feature-last
    2D; returns (score [B, N], fmaps list of 4)."""
    cnum: int = 32

    @nn.compact
    def __call__(self, x):
        fmaps = []
        chans = [self.cnum, 2 * self.cnum, 4 * self.cnum, 4 * self.cnum,
                 4 * self.cnum]
        for i, ch in enumerate(chans):
            x = SNConv2D(ch, name=f"conv{i + 1}")(x)
            x = nn.leaky_relu(x, 0.2)
            if i < 4:
                fmaps.append(x)
        return x.reshape(x.shape[0], -1), fmaps


def extract_chunks(mel, offsets, mel_ids, chunk_len: int):
    """mel [B, T, F] feature-last; offsets/mel_ids [N] -> [N, chunk_len, F]
    (`loss.py:9-28`, transposed layout)."""
    pos = offsets[:, None] + jnp.arange(chunk_len)[None, :]
    return mel[mel_ids[:, None], pos, :]


def sample_chunk_params(rng, batch_size: int, mel_lens, chunk_len: int):
    """Random (mel_ids, offsets) with the reference's clamped sampling
    (`scripts/train_fp_adv.py:129-136`). chunk_len must already be
    min(chunk, min_len) — static."""
    k1, k2 = jax.random.split(rng)
    mel_ids = jax.random.randint(k1, (batch_size,), 0, batch_size)
    perc = jax.random.uniform(k2, (batch_size,))
    out_lens = mel_lens[mel_ids].astype(jnp.float32)
    ofx = perc * (out_lens + chunk_len) - chunk_len / 2.0
    ofx = jnp.clip(ofx, 0.0, out_lens - chunk_len)
    return mel_ids, ofx.astype(jnp.int32)


def feature_match_loss(fmaps_gen, fmaps_org):
    """Mean L1 between feature maps, real side detached (`loss.py:31-41`)."""
    loss = 0.0
    for g, o in zip(fmaps_gen, fmaps_org):
        loss += jnp.mean(jnp.abs(g - jax.lax.stop_gradient(o)))
    return loss / len(fmaps_gen)


def normalize_mel_chunk(x):
    """Critic input scaling (train_fp_adv.py:152-153)."""
    return (x + 4.5) / 2.5
