"""Sequence-parallel vocoding: shard ONE utterance's time axis over the mesh.

Data parallelism (mesh.py) scales batched synthesis, but the latency of a
single long utterance is bounded by one chip's vocoder throughput — the
HiFi-GAN stack is >95% of e2e FLOPs (docs/PERF.md). The reference has no
analogue (single-GPU, per-sample vocoder loop,
`models/fastpitch/networks.py:340-345`); the TPU-native answer is sequence
parallelism: split the mel's TIME axis across devices, exchange small halos
over ICI, vocode locally, and keep the output sharded.

Why this is exact: the generator is a pure feed-forward conv stack with a
total receptive field of ~±13 mel frames (`vocoder/hifigan.py::
chunked_vocode` — overlap 16 is proven bit-stable there and reused here),
so a device can reproduce its core's waveform exactly from core ± overlap
context. Edge devices slide their window inward (clamped starts — the same
trick as `chunked_vocode`) so the global utterance boundary sees the
generator's own zero padding, NOT synthetic halo frames: the result matches
the unsharded full call everywhere.

Mechanics (`shard_map` over the mesh axis):
  1. each device holds `core = F/n` contiguous mel frames;
  2. `lax.ppermute` sends the local shard's outer 2*overlap frames to each
     ring neighbour (a ~10 KB ICI transfer — edge devices receive zeros,
     which their clamped window never reads);
  3. a per-device static offset (`lax.axis_index` into a constant table)
     selects the `core + 2*overlap` window, the generator runs locally,
     and the mirrored offset crops the core's waveform;
  4. the output stays time-sharded (`P(None, axis)`) — downstream SP ops
     (denoiser, D2H of this device's chunk) can consume it in place;
     `jax.device_get` assembles the full waveform only if the host asks.

`sp_vocode` is generic over any locally-computed mel->wave function:
HiFi-GAN needs `overlap=16` (RF ±13 frames); the Vocos backbone + ISTFT
head needs `overlap=32` (ConvNeXt RF ±27 + the n_fft overlap-add edge) —
both verified exact on the 8-device mesh (tests/test_runtime.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .mesh import DATA_AXIS

LOG_MEL_SILENCE = -11.512925  # log(1e-5), the mel floor (audio/mel.py)


def sp_vocode(apply_fn, variables, mel, mesh: Mesh, *,
              axis: str = DATA_AXIS, overlap: int = 16,
              pad_value: float = LOG_MEL_SILENCE,
              batch_axis: str | None = None):
    """Vocode `mel` [B, F, C] -> wave [B, F*hop] with the time axis sharded
    over `mesh[axis]`. On a 2-D mesh (`make_mesh_2d`), pass
    `axis=SEQ_AXIS, batch_axis=DATA_AXIS` to shard the batch axis too
    (DP × SP: each row-group of chips vocodes its batch rows, splitting
    each row's time axis among themselves).

    Matches the single-device `apply_fn(variables, mel)` exactly for every
    F: when the mesh size does not divide F, the mel is padded up with
    `pad_value` (log-mel silence) for the sharded pass and the final
    `overlap` frames — the only region whose context the padding could
    perturb — are re-vocoded by one small static-shape pass over the true
    sequence tail (so the real boundary sees the generator's own zero
    padding) and spliced in. Falls back to the plain call when each device
    would hold < 2*overlap frames (too short to be worth splitting).
    """
    n = int(mesh.shape[axis])
    B, F, C = mel.shape
    if batch_axis is not None:
        if batch_axis == axis:
            raise ValueError("batch_axis must differ from the time axis "
                             f"(both {axis!r}); use make_mesh_2d")
        if B % int(mesh.shape[batch_axis]):
            raise ValueError(f"batch {B} not divisible by "
                             f"mesh[{batch_axis!r}]={mesh.shape[batch_axis]}")
    core = -(-F // n)
    if n == 1 or core < 2 * overlap:
        wave = apply_fn(variables, mel)
        return wave[:, : F * (wave.shape[-1] // F)]
    F_pad = core * n
    mel_orig = mel
    if F_pad != F:
        mel = jnp.pad(mel, ((0, 0), (0, F_pad - F), (0, 0)),
                      constant_values=jnp.asarray(pad_value, mel.dtype))

    window = core + 2 * overlap
    # static per-device geometry: window starts clamped into the sequence
    # (edge devices slide inward), selection offset inside the
    # [2ov | core | 2ov] halo buffer, and the mirrored crop offset
    starts = np.clip(np.arange(n) * core - overlap, 0, F_pad - window)
    sel_off = jnp.asarray(starts - (np.arange(n) * core - 2 * overlap),
                          jnp.int32)                 # [2ov, ov, ..., ov, 0]
    crop_off = jnp.asarray(np.arange(n) * core - starts,
                           jnp.int32)                # [0, ov, ..., ov, 2ov]

    h = 2 * overlap

    def local(v, mel_shard):
        # mel_shard: [B, core, C] — this device's contiguous frames
        from_left = jax.lax.ppermute(
            mel_shard[:, -h:, :], axis,
            [(i, i + 1) for i in range(n - 1)])      # device 0 gets zeros
        from_right = jax.lax.ppermute(
            mel_shard[:, :h, :], axis,
            [(i + 1, i) for i in range(n - 1)])      # device n-1 gets zeros
        buf = jnp.concatenate([from_left, mel_shard, from_right], axis=1)
        d = jax.lax.axis_index(axis)
        win = jax.lax.dynamic_slice_in_dim(buf, sel_off[d], window, axis=1)
        wave = apply_fn(v, win)                      # [B, window*hop]
        hop = wave.shape[-1] // window
        return jax.lax.dynamic_slice_in_dim(
            wave, crop_off[d] * hop, core * hop, axis=1)

    out = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(batch_axis, axis, None)),
        out_specs=P(batch_axis, axis),
        check_vma=False,  # ppermute + axis_index are manually collective
    )(variables, mel)
    hop = out.shape[-1] // F_pad
    if F_pad == F:
        return out
    # exact ragged tail: the padded pass gave the last `overlap` real
    # frames silence context instead of the generator's zero padding;
    # re-vocode a fixed-size true-boundary tail window (static shape —
    # one extra compile total; TAIL - overlap > the receptive field, so
    # the spliced region is bit-identical to the full call's)
    TAIL = min(8 * overlap, F)  # static; >= 2*overlap+1 > overlap + RF
    tail = apply_fn(variables, mel_orig[:, F - TAIL:, :])
    return jnp.concatenate(
        [out[:, : (F - overlap) * hop], tail[:, (TAIL - overlap) * hop:]],
        axis=-1)
