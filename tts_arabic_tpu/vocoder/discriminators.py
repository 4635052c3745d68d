"""HiFi-GAN discriminators and GAN losses (vocoder training surface).

Equivalents of the reference `vocoder/hifigan/models.py:139-293`: the
multi-period discriminator (periods 2/3/5/7/11, 2D convs over period-folded
waveforms) and multi-scale discriminator (3 scales with average-pooled
inputs), plus feature-matching / LSGAN discriminator / generator losses.
The reference ships its vocoder pretrained and never trains these
(SURVEY.md §2.6), but they complete the vocoder-training capability surface.

Weight/spectral norm is omitted (we fold weight norm at import for
inference; for training, plain convs with the same shapes are used — the
reparametrizations change optimization dynamics, not capability, and the
adversarial recipe is exercised end-to-end by `train.vocoder`). A `width`
knob (default 1.0 = reference channel counts) exists so tests can train
the full recipe at toy size.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

LRELU_SLOPE = 0.1


class PeriodDiscriminator(nn.Module):
    """2D conv stack over a period-folded waveform (`DiscriminatorP`,
    models.py:139-172). Input [B, T] -> (score [B, N], fmaps)."""
    period: int
    kernel_size: int = 5
    stride: int = 3
    width: float = 1.0

    @nn.compact
    def __call__(self, x):
        B, T = x.shape
        p = self.period
        if T % p:
            pad = p - T % p
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
            T += pad
        x = x.reshape(B, T // p, p, 1)  # [B, T/p, period, 1] feature-last

        fmaps = []
        for i, ch in enumerate([max(int(c * self.width), 1)
                                for c in (32, 128, 512, 1024)]):
            x = nn.Conv(ch, (self.kernel_size, 1), strides=(self.stride, 1),
                        padding=((2, 2), (0, 0)), name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmaps.append(x)
        x = nn.Conv(max(int(1024 * self.width), 1), (self.kernel_size, 1),
                    padding=((2, 2), (0, 0)), name="conv_4")(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmaps.append(x)
        x = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)),
                    name="conv_post")(x)
        fmaps.append(x)
        return x.reshape(B, -1), fmaps


class ScaleDiscriminator(nn.Module):
    """1D grouped-conv stack (`DiscriminatorS`, models.py:202-227).
    `width` scales channel counts (keep power-of-2 fractions so the
    grouped convs stay divisible)."""
    width: float = 1.0

    @nn.compact
    def __call__(self, x):
        x = x[..., None]  # [B, T, 1]
        fmaps = []
        w = self.width
        spec = [  # (channels, kernel, stride, groups)
            (128, 15, 1, 1), (128, 41, 2, 4), (256, 41, 2, 16),
            (512, 41, 4, 16), (1024, 41, 4, 16), (1024, 41, 1, 16),
            (1024, 5, 1, 1),
        ]
        spec = [(max(int(c * w), g), k, s, g) for c, k, s, g in spec]
        for i, (ch, k, s, g) in enumerate(spec):
            x = nn.Conv(ch, (k,), strides=(s,), padding=[(k // 2, k // 2)],
                        feature_group_count=g, name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmaps.append(x)
        x = nn.Conv(1, (3,), padding="SAME", name="conv_post")(x)
        fmaps.append(x)
        return x.reshape(x.shape[0], -1), fmaps


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    width: float = 1.0

    @nn.compact
    def __call__(self, y, y_hat):
        outs = ([], [], [], [])
        for p in self.periods:
            d = PeriodDiscriminator(p, width=self.width, name=f"period_{p}")
            s_r, f_r = d(y)
            s_g, f_g = d(y_hat)
            outs[0].append(s_r)
            outs[1].append(s_g)
            outs[2].append(f_r)
            outs[3].append(f_g)
        return outs


class MultiScaleDiscriminator(nn.Module):
    n_scales: int = 3
    width: float = 1.0

    @nn.compact
    def __call__(self, y, y_hat):
        outs = ([], [], [], [])
        for i in range(self.n_scales):
            if i > 0:
                y = nn.avg_pool(y[..., None], (4,), strides=(2,),
                                padding=((2, 2),))[..., 0]
                y_hat = nn.avg_pool(y_hat[..., None], (4,), strides=(2,),
                                    padding=((2, 2),))[..., 0]
            d = ScaleDiscriminator(width=self.width, name=f"scale_{i}")
            s_r, f_r = d(y)
            s_g, f_g = d(y_hat)
            outs[0].append(s_r)
            outs[1].append(s_g)
            outs[2].append(f_r)
            outs[3].append(f_g)
        return outs


def feature_loss(fmaps_r: List, fmaps_g: List):
    """Sum of L1 feature distances x2 (models.py:262-268)."""
    loss = 0.0
    for fr, fg in zip(fmaps_r, fmaps_g):
        for r, g in zip(fr, fg):
            loss += jnp.mean(jnp.abs(jax.lax.stop_gradient(r) - g))
    return loss * 2.0


def discriminator_loss(real_scores: List, gen_scores: List):
    """LSGAN D loss (models.py:271-282)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(real_scores, gen_scores):
        r = jnp.mean((1.0 - dr) ** 2)
        g = jnp.mean(dg ** 2)
        loss += r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(gen_scores: List):
    """LSGAN G loss (models.py:285-293)."""
    loss = 0.0
    per = []
    for dg in gen_scores:
        l = jnp.mean((1.0 - dg) ** 2)
        per.append(l)
        loss += l
    return loss, per
