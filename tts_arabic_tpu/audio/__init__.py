"""Audio/DSP layer: mel frontend, STFT/ISTFT ops, host IO."""
from .mel import (MelConfig, MelSpectrogram, log_mel_spectrogram,
                  mel_spectrogram, slaney_mel_filterbank, stft_magnitude)
from .stft import hann, istft, stft
from .io import (load_wav, mulaw_decode, mulaw_encode,
                 peak_normalize, resample, save_wav, trim_silence_db)

__all__ = [
    "MelConfig", "MelSpectrogram", "log_mel_spectrogram", "mel_spectrogram",
    "slaney_mel_filterbank", "stft_magnitude", "hann", "istft", "stft",
    "load_wav", "mulaw_decode", "mulaw_encode", "peak_normalize", "resample", "save_wav", "trim_silence_db",
]
