"""Acoustic models: FastPitch (parallel), Tacotron2 (autoregressive)."""
from .fastpitch import FastPitch, FastPitchConfig
from .tacotron2 import Tacotron2, Tacotron2Config

__all__ = ["FastPitch", "FastPitchConfig", "Tacotron2", "Tacotron2Config"]
