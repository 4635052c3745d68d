"""Pallas/XLA TPU kernels for hot ops (HiFi-GAN strategies live in
`hifigan_pallas` / `hifigan_int8`, imported lazily by the pipelines)."""
from .mas_pallas import mas_fused, mas_pallas

__all__ = ["mas_fused", "mas_pallas"]
