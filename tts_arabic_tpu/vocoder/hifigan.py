"""HiFi-GAN vocoder (flax): mel [B, T, 80] -> waveform [B, T*256].

Re-implementation of the reference generator (`vocoder/hifigan/models.py:
86-136`): conv_pre k7 -> 4 stages of [leaky-relu -> transposed-conv upsample
(rates 8,8,2,2) -> multi-receptive-field fusion of 3 ResBlocks (k 3/7/11,
dilations 1/3/5) averaged] -> leaky-relu -> conv_post k7 -> tanh.

TPU notes: layout is feature-last so every conv is an [T, C_in] x [k, C_in,
C_out] contraction on the MXU; transposed convs are expressed as
lhs-dilated convolutions (XLA's native form); weight norm is folded into
plain weights at import (the reference also removes it at load,
`vocoder/__init__.py:19`). The whole generator jits as one fused program and
is batched — unlike the reference's per-sample vocoder loop
(`models/fastpitch/networks.py:340-345`).
"""
from __future__ import annotations

import dataclasses
import json
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LRELU_SLOPE = 0.1


@dataclasses.dataclass(frozen=True)
class HiFiGANConfig:
    resblock: str = "1"
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    num_mels: int = 80
    sampling_rate: int = 22050

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out

    @classmethod
    def from_json(cls, path) -> "HiFiGANConfig":
        with open(path) as f:
            h = json.load(f)
        return cls(
            resblock=str(h.get("resblock", "1")),
            upsample_rates=tuple(h["upsample_rates"]),
            upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
            upsample_initial_channel=h["upsample_initial_channel"],
            resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in h["resblock_dilation_sizes"]),
            num_mels=h.get("num_mels", 80),
            sampling_rate=h.get("sampling_rate", 22050),
        )


def conv_transpose_1d(x, kernel, bias, stride: int, padding: int):
    """torch-semantics ConvTranspose1d on feature-last input.

    x: [B, T, C_in]; kernel: [k, C_in, C_out] (pre-flipped along k by the
    importer); output [B, (T-1)*stride - 2*padding + k, C_out].
    Expressed as an lhs-dilated convolution, XLA's native transposed-conv
    form (tiles directly onto the MXU).
    """
    k = kernel.shape[0]
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return y + bias


class TransposedConv1d(nn.Module):
    features: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.normal(0.01),
            (k, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return conv_transpose_1d(x, kernel, bias, self.stride,
                                 (k - self.stride) // 2)


class ResBlock1(nn.Module):
    """Dilated residual block (reference `ResBlock1`, models.py:22-59)."""
    channels: int
    kernel_size: int
    dilations: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for d in range(len(self.dilations)):
            y = nn.leaky_relu(x, LRELU_SLOPE)
            y = nn.Conv(self.channels, (self.kernel_size,),
                        kernel_dilation=(self.dilations[d],), padding="SAME",
                        name=f"conv1_{d}")(y)
            y = nn.leaky_relu(y, LRELU_SLOPE)
            y = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                        name=f"conv2_{d}")(y)
            x = x + y
        return x


class ResBlock2(nn.Module):
    """2-conv variant (reference `ResBlock2`, models.py:62-79)."""
    channels: int
    kernel_size: int
    dilations: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for d in range(len(self.dilations)):
            y = nn.leaky_relu(x, LRELU_SLOPE)
            y = nn.Conv(self.channels, (self.kernel_size,),
                        kernel_dilation=(self.dilations[d],), padding="SAME",
                        name=f"conv1_{d}")(y)
            x = x + y
        return x


class Generator(nn.Module):
    config: HiFiGANConfig = HiFiGANConfig()

    @nn.compact
    def __call__(self, mel):
        """mel: [B, T, num_mels] -> waveform [B, T*hop]."""
        c = self.config
        res_cls = ResBlock1 if c.resblock == "1" else ResBlock2
        x = nn.Conv(c.upsample_initial_channel, (7,), padding="SAME",
                    name="conv_pre")(mel)
        for i, (u, k) in enumerate(zip(c.upsample_rates,
                                       c.upsample_kernel_sizes)):
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = TransposedConv1d(ch, k, u, name=f"up_{i}")(x)
            acc = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilation_sizes)):
                y = res_cls(ch, rk, rd, name=f"res_{i}_{j}")(x)
                acc = y if acc is None else acc + y
            x = acc / len(c.resblock_kernel_sizes)
        # final activation uses torch's default 0.01 slope in the reference
        # (models.py:123) — kept for checkpoint parity
        x = nn.leaky_relu(x, 0.01)
        x = nn.Conv(1, (7,), padding="SAME", name="conv_post")(x)
        return jnp.tanh(x).squeeze(-1)


def chunked_vocode(apply_fn, variables, mel, *, core: int = 480,
                   overlap: int = 16, slab: int = 64,
                   pad_value: float = -11.512925,
                   direct_limit: int = 32768):
    """Memory-bounded vocoding of long/batched mels via overlap-discard.

    mel: [B, F, n_mels] -> wave [B, F*hop], BIT-IDENTICAL to vocoding the
    full mel in one call: the generator's total receptive field is ~±13 mel
    frames (conv_pre k7, transposed-conv kernels, dilated MRF stacks), so
    with `overlap` >= 16 every chunk core reproduces the full call exactly,
    and the first/last windows are clamped to the true sequence boundaries
    so even the edges see the generator's own zero-padding. This is pure
    memory tiling, not an approximation.

    Chunks from the whole batch are flattened and processed in fixed
    `slab`-sized groups via lax.map, so peak HBM is
    O(slab * window * channels) regardless of B or F (the naive fused call
    needs O(B * F * 256 * 64) floats and OOMs a 16G chip around B=16,
    F=3072).
    """
    B, F, C = mel.shape
    window = core + 2 * overlap
    # one fused call is ~25% faster than tiling (no overlap recompute,
    # better MXU utilization) and fits HBM below ~32k batch*frames
    # (B=16 x F=2048 measured fine in bf16; 16 x 3072 OOMs the 16G chip).
    # The budget is calibrated for bf16 activations — halve it for f32
    # ([16, 768, 80] f32 through the full wave program measured OOM)
    if jnp.dtype(mel.dtype).itemsize >= 4:
        direct_limit //= 2
    if F <= window or B * F <= direct_limit:
        return apply_fn(variables, mel)

    # batch-axis split: when single samples fit the HBM budget, vocode the
    # batch in statically-unrolled groups — identical work to the fused
    # call (zero overlap recompute, zero chunk padding), unlike time
    # chunking (measured 506 ms vs 1778 ms wall for [16, 3072, 80]; see
    # docs/PERF.md). Two hard-won constraints: groups must be a multiple
    # of 8 (a [10, T, 32] group gets the (8,128)-tiled layout padded 6.4x
    # -> 3 GB per buffer, compile-time HBM OOM) and the loop must be a
    # static Python unroll, not lax.map (the while-loop body forces
    # remat_uncompressed layout copies of every stage activation). Time
    # chunking below remains only for single samples longer than
    # `direct_limit` frames (~6 min of audio).
    group = direct_limit // F
    if group >= 1:
        if group >= 8:
            group -= group % 8  # sublane-aligned batch groups
        waves = [apply_fn(variables, mel[g: g + group])
                 for g in range(0, B, group)]
        return jnp.concatenate(waves, axis=0) if len(waves) > 1 else waves[0]

    n_chunks = -(-F // core)
    # clamp windows into [0, F - window]; cores stay aligned to i*core
    starts = np.clip(np.arange(n_chunks) * core - overlap, 0, F - window)
    core_off = np.arange(n_chunks) * core - starts  # core offset in window
    idx = starts[:, None] + np.arange(window)[None, :]
    chunks = mel[:, idx, :].reshape(B * n_chunks, window, C)

    total = B * n_chunks
    n_slabs = -(-total // slab)
    pad_chunks = n_slabs * slab - total
    chunks = jnp.pad(chunks, ((0, pad_chunks), (0, 0), (0, 0)),
                     constant_values=pad_value)
    slabs = chunks.reshape(n_slabs, slab, window, C)

    waves = jax.lax.map(lambda mslab: apply_fn(variables, mslab), slabs)
    waves = waves.reshape(n_slabs * slab, -1)[:total]
    hop = waves.shape[-1] // window
    waves = waves.reshape(B, n_chunks, window * hop)

    # stitch with static slices (no gather): chunk 0 is clamped to start 0
    # (core offset 0), interior chunks share core offset `overlap`, the last
    # chunk is clamped to end at F (per-sample-constant offset c_last)
    first = waves[:, 0, : core * hop]
    parts = [first]
    if n_chunks > 2:
        interior = waves[:, 1:-1, overlap * hop: (overlap + core) * hop]
        parts.append(interior.reshape(B, (n_chunks - 2) * core * hop))
    c_last = int(core_off[-1])
    last_core = F - (n_chunks - 1) * core
    parts.append(waves[:, -1, c_last * hop: (c_last + last_core) * hop])
    return jnp.concatenate(parts, axis=-1)


def generator_flops_per_frame(config: HiFiGANConfig = HiFiGANConfig()) -> int:
    """Rough MAC count per mel frame (for bench roofline estimates)."""
    c = config
    total = 7 * c.num_mels * c.upsample_initial_channel
    t_mult = 1
    ch_in = c.upsample_initial_channel
    for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
        ch = c.upsample_initial_channel // (2 ** (i + 1))
        t_mult *= u
        total += t_mult * k * ch_in * ch // u
        for rk, rd in zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes):
            total += t_mult * 2 * len(rd) * rk * ch * ch
        ch_in = ch
    total += t_mult * 7 * ch_in
    return 2 * total
