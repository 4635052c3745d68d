"""Mel-spectrogram frontend (pure JAX compute path).

Matches the reference analysis parameters (`utils/audio.py:6-46`): 22050 Hz,
n_fft = win_length = 1024, hop 256, 80 mel bands, fmin 0 / fmax 8000, slaney
mel scale with slaney area normalization, reflect padding of (n_fft-hop)/2 on
both ends, center=False STFT, magnitude = sqrt(|S|^2 + 1e-9).

The filterbank is computed natively (no librosa dependency) with the Slaney
auditory-toolbox mel scale; the STFT runs as framed rFFT inside XLA so the
whole wav->mel path jits onto the TPU.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

# --- Slaney mel scale -------------------------------------------------------

_F_SP = 200.0 / 3.0          # Hz per mel below the break point
_MIN_LOG_HZ = 1000.0         # break point between linear and log regions
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0  # step size in the log region


def hz_to_mel(freq):
    freq = np.asanyarray(freq, dtype=np.float64)
    mel = freq / _F_SP
    log_region = freq >= _MIN_LOG_HZ
    mel = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(freq, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP,
        mel,
    )
    return mel


def mel_to_hz(mel):
    mel = np.asanyarray(mel, dtype=np.float64)
    freq = mel * _F_SP
    log_region = mel >= _MIN_LOG_MEL
    freq = np.where(
        log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (mel - _MIN_LOG_MEL)), freq
    )
    return freq


def hz_to_mel_htk(freq):
    return 2595.0 * np.log10(1.0 + np.asanyarray(freq, np.float64) / 700.0)


def mel_to_hz_htk(mel):
    return 700.0 * (10.0 ** (np.asanyarray(mel, np.float64) / 2595.0) - 1.0)


def slaney_mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    norm: str | None = "slaney",
    htk: bool = False,
) -> np.ndarray:
    """Triangular mel filterbank, shape [n_mels, n_fft//2 + 1].

    Equivalent to librosa.filters.mel(htk=False) which the reference loads at
    `utils/audio.py:27-30`; htk=True gives the torchaudio-default HTK scale
    (used by Vocos `MelSpectrogramFeatures`, feature_extractors.py:28-64).
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    to_mel, to_hz = ((hz_to_mel_htk, mel_to_hz_htk) if htk
                     else (hz_to_mel, mel_to_hz))
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)
    hz_pts = to_hz(mel_pts)

    # Differences and ramps vectorized over all bands at once.
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(np.float32)


# --- STFT / mel compute -----------------------------------------------------

def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Slice [..., T] into overlapping frames [..., n_frames, frame_length].

    When hop divides frame_length (1024/256 everywhere here), frames are
    assembled from r = frame_length/hop shifted views of a hop-blocked
    reshape — slicing only, no gather (gathers of millions of indices are
    very slow on TPU).
    """
    n_frames = 1 + (x.shape[-1] - frame_length) // hop
    if frame_length % hop == 0:
        r = frame_length // hop
        nb = x.shape[-1] // hop
        blocks = x[..., : nb * hop].reshape(x.shape[:-1] + (nb, hop))
        parts = [blocks[..., s: s + n_frames, :] for s in range(r)]
        return jnp.concatenate(parts, axis=-1)
    idx = (
        np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    )
    return x[..., idx]


@dataclasses.dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 22050
    n_fft: int = 1024
    win_length: int = 1024
    hop_length: int = 256
    n_mels: int = 80
    f_min: float = 0.0
    f_max: float = 8000.0
    norm: str = "slaney"

    @property
    def pad_length(self) -> int:
        return (self.n_fft - self.hop_length) // 2


@functools.lru_cache(maxsize=8)
def _constants(cfg: MelConfig):
    basis = jnp.asarray(
        slaney_mel_filterbank(
            cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.f_min, cfg.f_max,
            cfg.norm,
        )
    )
    window = jnp.asarray(np.hanning(cfg.win_length + 1)[:-1].astype(np.float32))
    return basis, window


def stft_magnitude(x: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Linear magnitude spectrogram [..., n_fft//2+1, frames], center=False,
    after reflect-padding (n_fft-hop)/2 on each side."""
    _, window = _constants(cfg)
    pad = cfg.pad_length
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(x, cfg.n_fft, cfg.hop_length) * window
    spec = jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    mag = jnp.sqrt(jnp.abs(spec) ** 2 + 1e-9)
    return jnp.swapaxes(mag, -1, -2)  # [..., F, T]


def mel_spectrogram(x: jnp.ndarray, cfg: MelConfig = MelConfig()) -> jnp.ndarray:
    """Waveform [..., T] -> mel magnitude [..., n_mels, frames]."""
    basis, _ = _constants(cfg)
    return basis @ stft_magnitude(x, cfg)


def log_mel_spectrogram(
    x: jnp.ndarray, cfg: MelConfig = MelConfig(), clip: float = 1e-5
) -> jnp.ndarray:
    """Log-mel as the datasets consume it (`utils/data.py:150-151`)."""
    return jnp.log(jnp.clip(mel_spectrogram(x, cfg), min=clip))


class MelSpectrogram:
    """Callable wrapper mirroring the reference `MelSpectrogram` module."""

    def __init__(self, **kwargs):
        self.config = MelConfig(**kwargs)
        self._fn = jax.jit(functools.partial(mel_spectrogram, cfg=self.config))

    def __call__(self, x) -> jnp.ndarray:
        return self._fn(jnp.asarray(x))


# --- numpy host path (data loading) ----------------------------------------

def log_mel_numpy(x: np.ndarray, cfg: MelConfig = MelConfig(),
                  clip: float = 1e-5) -> np.ndarray:
    """Pure-numpy log-mel for host-side dataset loading (no device round
    trip per sample). Matches `log_mel_spectrogram` bit-for-bit modulo fft
    library rounding."""
    basis = slaney_mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels,
                                  cfg.f_min, cfg.f_max, cfg.norm)
    window = np.hanning(cfg.win_length + 1)[:-1].astype(np.float32)
    pad = cfg.pad_length
    xp = np.pad(x, pad, mode="reflect")
    n_frames = 1 + (len(xp) - cfg.n_fft) // cfg.hop_length
    idx = (np.arange(n_frames)[:, None] * cfg.hop_length
           + np.arange(cfg.n_fft)[None, :])
    frames = xp[idx] * window
    spec = np.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    mag = np.sqrt(np.abs(spec) ** 2 + 1e-9).T  # [F, T]
    mel = basis @ mag
    return np.log(np.clip(mel, clip, None)).astype(np.float32)
