"""Spectral denoiser for vocoder bias removal.

Equivalent of the reference `Denoiser` (`vocoder/hifigan/denoiser.py:40-72`):
the vocoder's bias spectrum is estimated by running the generator on a zero
mel (1 x 88 x 80) and taking the magnitude spectrum of the first STFT frame;
at inference the scaled bias is subtracted from the waveform's magnitude
spectrum (clamped at 0) and the signal is resynthesized with the original
phase. Everything is real-in/real-out so it fuses into the same jitted TPU
program as the vocoder (complex values never leave the graph).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..audio.stft import istft, stft

_N_FFT = 1024
_HOP = 256


def compute_bias_spec(generator_apply, variables, n_mels: int = 80,
                      n_frames: int = 88) -> jnp.ndarray:
    """Bias magnitude spectrum [n_fft//2+1] from a zero-mel generator pass."""
    zero_mel = jnp.zeros((1, n_frames, n_mels), jnp.float32)
    bias_audio = generator_apply(variables, zero_mel)  # [1, T]
    spec = stft(bias_audio, _N_FFT, _HOP, center=True)
    return jnp.abs(spec)[0, :, 0]


def denoise(audio: jnp.ndarray, bias_spec: jnp.ndarray,
            strength: float) -> jnp.ndarray:
    """audio [B, T] -> denoised [B, T]."""
    spec = stft(audio, _N_FFT, _HOP, center=True)
    mag = jnp.maximum(jnp.abs(spec) - strength * bias_spec[None, :, None],
                      0.0)
    phase = jnp.angle(spec)
    clean = mag * jnp.exp(1j * phase)
    return istft(clean, _N_FFT, _HOP, center=True, length=audio.shape[-1])
