"""STFT/ISTFT spectral ops used by the vocoder heads and denoiser.

JAX equivalents of the reference's torch spectral ops:
- centered complex STFT / inverse STFT (denoiser, `vocoder/hifigan/denoiser.py:43-48`)
- "same"-padded ISTFT via windowed overlap-add with envelope normalization
  (Vocos head, `vocoder/vocos/spectral_ops.py:33-75`)
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .mel import frame_signal


def hann(win_length: int) -> jnp.ndarray:
    """Periodic Hann window (torch.hann_window semantics)."""
    return jnp.asarray(np.hanning(win_length + 1)[:-1].astype(np.float32))


def stft(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    center: bool = True,
) -> jnp.ndarray:
    """Complex STFT [..., F, T]. With center=True, reflect-pads n_fft//2."""
    win_length = win_length or n_fft
    window = hann(win_length)
    if center:
        p = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(p, p)], mode="reflect")
    frames = frame_signal(x, n_fft, hop_length) * window
    return jnp.swapaxes(jnp.fft.rfft(frames, n=n_fft, axis=-1), -1, -2)


def _overlap_add(frames: jnp.ndarray, hop: int, out_len: int) -> jnp.ndarray:
    """Overlap-add [..., n_frames, frame_len] -> [..., out_len].

    When hop divides frame_len (the 1024/256 analysis used everywhere here),
    this is r = flen/hop shifted vector adds — no scatter, which is orders
    of magnitude faster on TPU than an .at[].add() with millions of indices.
    """
    n_frames, flen = frames.shape[-2], frames.shape[-1]
    lead = frames.shape[:-2]
    if flen % hop == 0:
        r = flen // hop
        total = (n_frames - 1) * hop + flen
        out = jnp.zeros(lead + (total,), frames.dtype)
        # segment j of every frame lands at offset j*hop of that frame
        segs = frames.reshape(lead + (n_frames, r, hop))
        for j in range(r):
            strip = segs[..., :, j, :].reshape(lead + (n_frames * hop,))
            out = out.at[..., j * hop: j * hop + n_frames * hop].add(strip)
        if total < out_len:
            out = jnp.pad(out, [(0, 0)] * len(lead) + [(0, out_len - total)])
        return out[..., :out_len]
    idx = (
        np.arange(n_frames)[:, None] * hop + np.arange(flen)[None, :]
    ).reshape(-1)
    flat = frames.reshape(lead + (n_frames * flen,))
    out = jnp.zeros(lead + (out_len,), dtype=frames.dtype)
    return out.at[..., idx].add(flat)


def istft(
    spec: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    center: bool = True,
    length: int | None = None,
    eps: float = 1e-11,
) -> jnp.ndarray:
    """Inverse STFT of a complex spectrogram [..., F, T].

    center=True matches torch.istft; center=False matches the Vocos "same"
    padding variant (`spectral_ops.py:33-75`) which crops (n_fft-hop)/2.
    """
    win_length = win_length or n_fft
    window = hann(win_length)
    frames = jnp.fft.irfft(
        jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1
    ) * window
    n_frames = spec.shape[-1]
    full_len = n_fft + hop_length * (n_frames - 1)
    audio = _overlap_add(frames, hop_length, full_len)
    env = _overlap_add(
        jnp.broadcast_to(window**2, (n_frames, win_length)), hop_length,
        full_len,
    )
    audio = audio / jnp.maximum(env, eps)
    pad = n_fft // 2 if center else (n_fft - hop_length) // 2
    audio = audio[..., pad: full_len - pad]
    if length is not None:
        audio = audio[..., :length]
    return audio
