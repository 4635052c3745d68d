"""Audio layer tests: STFT parity vs torch.stft, mel filterbank properties,
ISTFT round-trips."""
import numpy as np
import pytest

import jax.numpy as jnp

from tts_arabic_tpu.audio import (MelConfig, istft, mel_spectrogram,
                                  peak_normalize, resample,
                                  slaney_mel_filterbank, stft,
                                  stft_magnitude, trim_silence_db)


def _rand_wav(n=22050, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def test_stft_magnitude_matches_torch():
    torch = pytest.importorskip("torch")
    x = _rand_wav()
    cfg = MelConfig()
    got = np.asarray(stft_magnitude(jnp.asarray(x)[None], cfg))[0]

    xt = torch.from_numpy(x)[None]
    pad = (cfg.n_fft - cfg.hop_length) // 2
    xt = torch.nn.functional.pad(xt, (pad, pad), mode="reflect")
    ref = torch.stft(
        xt, cfg.n_fft, cfg.hop_length, cfg.win_length,
        torch.hann_window(cfg.win_length), center=False, return_complex=True,
    )
    ref_mag = ref.abs().pow(2).add(1e-9).sqrt()[0].numpy()
    assert got.shape == ref_mag.shape
    np.testing.assert_allclose(got, ref_mag, rtol=1e-4, atol=1e-5)


def test_centered_stft_matches_torch():
    torch = pytest.importorskip("torch")
    x = _rand_wav(8192, seed=1)
    got = np.asarray(stft(jnp.asarray(x)[None], 1024, 256))[0]
    ref = torch.stft(
        torch.from_numpy(x)[None], 1024, 256, 1024,
        torch.hann_window(1024), center=True, return_complex=True,
    )[0].numpy()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got.real, ref.real, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(got.imag, ref.imag, rtol=1e-3, atol=1e-4)


def test_mel_filterbank_properties():
    fb = slaney_mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every band has support; bands cover increasing frequency ranges
    assert (fb.sum(axis=1) > 0).all()
    centers = fb.argmax(axis=1)
    assert (np.diff(centers) >= 0).all()
    # nothing above fmax bin has weight
    fmax_bin = int(np.ceil(8000.0 / (22050 / 2) * 512))
    assert fb[:, fmax_bin + 2:].sum() == 0


def test_mel_filterbank_matches_scalar_reference():
    """Vectorized bank equals an independent straight-from-the-formula
    scalar implementation of the Slaney auditory-toolbox filterbank."""
    sr, n_fft, n_mels, fmin, fmax = 22050, 1024, 80, 0.0, 8000.0

    def hz2mel(f):
        if f < 1000.0:
            return f * 3.0 / 200.0
        return 15.0 + np.log(f / 1000.0) / (np.log(6.4) / 27.0)

    def mel2hz(m):
        if m < 15.0:
            return m * 200.0 / 3.0
        return 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0))

    mels = np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2)
    hz = np.array([mel2hz(m) for m in mels])
    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    ref = np.zeros((n_mels, len(freqs)))
    for m in range(n_mels):
        lo, c, hi = hz[m], hz[m + 1], hz[m + 2]
        for k, f in enumerate(freqs):
            if lo < f < c or (f == c):
                ref[m, k] = (f - lo) / (c - lo)
            elif c < f < hi:
                ref[m, k] = (hi - f) / (hi - c)
        ref[m] *= 2.0 / (hi - lo)
    fb = slaney_mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    np.testing.assert_allclose(fb, ref, rtol=1e-5, atol=1e-7)


def test_mel_spectrogram_shape_and_finiteness():
    x = _rand_wav(22050)
    mel = np.asarray(mel_spectrogram(jnp.asarray(x)[None]))
    # hop 256, pad (1024-256)/2 per side -> T//hop - something; just sanity
    assert mel.shape[0] == 1 and mel.shape[1] == 80
    assert mel.shape[2] == 1 + (22050 + 2 * 384 - 1024) // 256
    assert np.isfinite(mel).all() and (mel > 0).all()


def test_istft_roundtrip_centered():
    x = _rand_wav(4096, seed=2)
    spec = stft(jnp.asarray(x)[None], 1024, 256, center=True)
    rec = np.asarray(istft(spec, 1024, 256, center=True, length=4096))[0]
    np.testing.assert_allclose(rec, x, atol=1e-4)


def test_istft_roundtrip_same_padding():
    cfg = MelConfig()
    x = _rand_wav(4096, seed=3)
    pad = cfg.pad_length
    xp = jnp.pad(jnp.asarray(x)[None], ((0, 0), (pad, pad)), mode="reflect")
    from tts_arabic_tpu.audio.mel import frame_signal
    from tts_arabic_tpu.audio.stft import hann
    frames = frame_signal(xp, 1024, 256) * hann(1024)
    spec = jnp.swapaxes(jnp.fft.rfft(frames, axis=-1), -1, -2)
    rec = np.asarray(istft(spec, 1024, 256, center=False))[0]
    # same-padding ISTFT reconstructs the interior exactly
    assert rec.shape[0] == 4096
    np.testing.assert_allclose(rec[512:-512], x[512:-512], atol=1e-4)


def test_resample_and_peak_normalize():
    x = _rand_wav(48000, seed=4)
    y = resample(x, 48000, 22050)
    assert abs(len(y) - 22050) <= 1
    z = peak_normalize(y)
    assert np.isclose(np.abs(z).max(), 0.999, atol=1e-3)


def test_trim_silence():
    x = np.concatenate([
        np.zeros(5000, np.float32), _rand_wav(8000, 5),
        np.zeros(5000, np.float32),
    ])
    y = trim_silence_db(x, top_db=23)
    assert len(y) < len(x)
    assert len(y) >= 8000
