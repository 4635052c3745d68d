"""Host-side audio IO: wav read/write, resampling, peak normalization.

Replaces the reference's torchaudio/librosa IO (`scripts/preprocess_audio.py`,
`utils/data.py:146-149`) with scipy-based equivalents; everything here is
host preprocessing, never on the TPU compute path.
"""
from __future__ import annotations

import math

import numpy as np
from scipy.io import wavfile as _wavfile
from scipy.signal import resample_poly


def load_wav(path, target_sr: int | None = None):
    """Read a wav as float32 in [-1, 1]; optionally resample."""
    sr, data = _wavfile.read(path)
    if data.dtype == np.int16:
        x = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        x = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        x = (data.astype(np.float32) - 128.0) / 128.0
    else:
        x = data.astype(np.float32)
    if x.ndim == 2:  # downmix channels-last multichannel
        x = x.mean(axis=1)
    if target_sr is not None and sr != target_sr:
        x = resample(x, sr, target_sr)
        sr = target_sr
    return x, sr


def save_wav(path, x, sample_rate: int = 22050):
    x = np.asarray(x, dtype=np.float32)
    x = np.clip(x, -1.0, 1.0)
    _wavfile.write(path, sample_rate, (x * 32767.0).astype(np.int16))


def resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    g = math.gcd(orig_sr, target_sr)
    return resample_poly(x, target_sr // g, orig_sr // g).astype(np.float32)


def peak_normalize(x: np.ndarray, headroom: float = 0.999) -> np.ndarray:
    peak = np.abs(x).max() if x.size else 0.0
    if peak == 0:
        return x
    return (x / peak * headroom).astype(np.float32)


def trim_silence_db(
    x: np.ndarray, top_db: float = 23.0, frame_length: int = 2048,
    hop_length: int = 512,
) -> np.ndarray:
    """Trim leading/trailing audio quieter than `top_db` below peak RMS
    (librosa.effects.trim semantics used by `scripts/preprocess_audio.py:38`).
    """
    if len(x) < frame_length:
        return x
    n_frames = 1 + (len(x) - frame_length) // hop_length
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)
    rms = np.sqrt(np.mean(x[idx] ** 2, axis=1) + 1e-12)
    db = 20.0 * np.log10(np.maximum(rms, 1e-10) / max(rms.max(), 1e-10))
    keep = np.flatnonzero(db > -top_db)
    if keep.size == 0:
        return x[:0]
    start = keep[0] * hop_length
    end = min(len(x), (keep[-1] + 1) * hop_length + frame_length)
    return x[start:end]


def mulaw_encode(x, mu: int = 255):
    """f32 waveform in [-1, 1] -> uint8 mu-law codes (G.711-style
    companding). Runs under jit (jnp in, jnp out), so pipelines can
    compand ON DEVICE before D2H — 8-bit transfer, half of int16, at
    telephony-grade quality (~38 dB SNR on speech). Decode with
    `mulaw_decode`. Beyond the reference surface (serving: the tunnel's
    D2H bandwidth is the e2e bottleneck, docs/PERF.md)."""
    import jax.numpy as jnp
    x = jnp.clip(x, -1.0, 1.0)
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / np.log1p(mu)
    return jnp.round((y + 1.0) * (mu / 2.0)).astype(jnp.uint8)


def mulaw_decode(codes, mu: int = 255) -> np.ndarray:
    """uint8 mu-law codes -> f32 waveform in [-1, 1] (host-side inverse
    of `mulaw_encode`)."""
    y = np.asarray(codes, np.float32) * (2.0 / mu) - 1.0
    out = np.sign(y) * (np.expm1(np.abs(y) * np.log1p(mu))) / mu
    return out.astype(np.float32)
