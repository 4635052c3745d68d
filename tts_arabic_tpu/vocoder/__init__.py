"""Vocoders: HiFi-GAN generator, spectral denoiser (Vocos in .vocos)."""
from .hifigan import Generator, HiFiGANConfig
from .denoiser import compute_bias_spec, denoise

__all__ = ["Generator", "HiFiGANConfig", "compute_bias_spec", "denoise"]
