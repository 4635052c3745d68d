"""Evaluation: DTW alignment (native C++), oversmoothing metrics, MCD,
plotting."""
from .dtw import dtw_align_mels, dtw_path, using_native_kernel
from .oversmoothing import (aligned_mae_distance,
                            compute_mel_oversmoothing_metrics,
                            framewise_rfft_power, mcd,
                            oversmoothing_metrics_aligned)

__all__ = [
    "dtw_align_mels", "dtw_path", "using_native_kernel",
    "aligned_mae_distance", "compute_mel_oversmoothing_metrics",
    "framewise_rfft_power", "mcd", "oversmoothing_metrics_aligned",
]
