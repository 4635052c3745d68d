"""Inference API: TTS pipelines."""
from .pipeline import FastPitch2Wave, FastPitchTTS
from .tacotron_pipeline import Tacotron2TTS, Tacotron2Wave
from .longform import split_sentences, stream_long, tts_long

__all__ = ["FastPitch2Wave", "FastPitchTTS", "Tacotron2TTS",
           "Tacotron2Wave", "split_sentences", "stream_long", "tts_long"]
