"""Pallas TPU kernels for hot ops."""
from .mas_pallas import mas_fused, mas_pallas

__all__ = ["mas_fused", "mas_pallas"]
