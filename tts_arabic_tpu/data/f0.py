"""Fundamental-frequency (f0) estimation for pitch conditioning.

Replaces the reference's librosa `pyin` call (`scripts/extract_f0.py:19`,
C2..C7 range, frame 1024 / hop 256) with a self-contained vectorized YIN
estimator (difference function + cumulative-mean normalization + absolute
threshold + parabolic interpolation). Unvoiced frames yield 0.0, matching
the zero-preserving normalization downstream (`utils/data.py:50-57`).

This runs offline on the host (as in the reference) — f0 extraction is a
one-time preprocessing step, not on the TPU path.
"""
from __future__ import annotations

import numpy as np

C2 = 65.40639
C7 = 2093.0045


def _difference_function(frames: np.ndarray, max_tau: int) -> np.ndarray:
    """YIN difference d[t, tau] for tau in [0, max_tau), via FFT
    autocorrelation. frames: [N, W2] where the summation window is W2//2."""
    N, W2 = frames.shape
    W = W2 // 2
    # energy terms
    sq = frames**2
    csum = np.concatenate([np.zeros((N, 1)), np.cumsum(sq, axis=1)], axis=1)
    e0 = csum[:, W] - csum[:, 0]                        # [N]
    e_tau = csum[:, np.arange(max_tau) + W] - csum[:, :max_tau]  # [N, taus]
    # cross term via FFT correlation: r[tau] = sum_j x[j] x[j+tau]
    n_fft = 1 << int(np.ceil(np.log2(2 * W2)))
    F = np.fft.rfft(frames, n_fft, axis=1)
    Fw = np.fft.rfft(frames[:, :W], n_fft, axis=1)
    r = np.fft.irfft(F * np.conj(Fw), n_fft, axis=1)[:, :max_tau]
    return e0[:, None] + e_tau - 2.0 * r


def estimate_f0(x: np.ndarray, sample_rate: int = 22050,
                frame_length: int = 1024, hop_length: int = 256,
                fmin: float = C2, fmax: float = C7,
                threshold: float = 0.15) -> np.ndarray:
    """Per-frame f0 in Hz (0 = unvoiced), aligned with the mel frames."""
    pad = frame_length // 2
    xp = np.pad(np.asarray(x, np.float64), pad, mode="reflect")
    n_frames = 1 + (len(xp) - frame_length) // hop_length
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(frame_length)[None, :])
    frames = xp[idx]

    tau_min = max(2, int(sample_rate / fmax))
    tau_max = min(int(sample_rate / fmin) + 1, frame_length // 2)
    d = _difference_function(frames, tau_max)

    # cumulative mean normalized difference
    tau = np.arange(1, tau_max)
    cmndf = np.ones_like(d)
    cum = np.cumsum(d[:, 1:], axis=1)
    cmndf[:, 1:] = d[:, 1:] * tau[None, :] / np.maximum(cum, 1e-12)

    # absolute threshold: first tau >= tau_min below threshold
    region = cmndf[:, tau_min:tau_max]
    below = region < threshold
    first = np.argmax(below, axis=1)
    voiced = below.any(axis=1)
    # descend to the local minimum following the first crossing
    best = first.copy()
    for _ in range(tau_max):  # bounded walk; vectorized step
        nxt = np.minimum(best + 1, region.shape[1] - 1)
        go = (region[np.arange(len(best)), nxt]
              < region[np.arange(len(best)), best]) & voiced
        if not go.any():
            break
        best = np.where(go, nxt, best)
    best_tau = best + tau_min

    # parabolic interpolation around the minimum
    b = np.clip(best_tau, 1, tau_max - 2)
    y0 = cmndf[np.arange(len(b)), b - 1]
    y1 = cmndf[np.arange(len(b)), b]
    y2 = cmndf[np.arange(len(b)), b + 1]
    denom = y0 - 2 * y1 + y2
    safe = np.where(np.abs(denom) > 1e-12, denom, 1.0)
    shift = np.where(np.abs(denom) > 1e-12, 0.5 * (y0 - y2) / safe, 0.0)
    shift = np.clip(shift, -0.5, 0.5)
    tau_refined = b + shift

    f0 = np.where(voiced, sample_rate / np.maximum(tau_refined, 1e-6), 0.0)
    f0 = np.where((f0 >= fmin) & (f0 <= fmax), f0, 0.0)
    return f0.astype(np.float32)


def extract_f0_dict(wav_paths, sample_rate: int = 22050,
                    hop_length: int = 256):
    """Batch-extract f0 for a corpus -> ({name: f0}, mean, std over voiced
    frames) (`scripts/extract_f0.py:25-78` equivalent)."""
    import os
    from ..audio.io import load_wav

    out = {}
    total, total_sq, count = 0.0, 0.0, 0
    for p in wav_paths:
        wave, _ = load_wav(p, target_sr=sample_rate)
        f0 = estimate_f0(wave, sample_rate, hop_length=hop_length)
        out[os.path.basename(str(p))] = f0
        voiced = f0[f0 > 0]
        total += voiced.sum()
        total_sq += (voiced**2).sum()
        count += len(voiced)
    mean = total / max(count, 1)
    std = np.sqrt(max(total_sq / max(count, 1) - mean**2, 0.0))
    return out, float(mean), float(std)
