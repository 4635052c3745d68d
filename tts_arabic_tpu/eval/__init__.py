"""Evaluation: DTW alignment (native C++), oversmoothing metrics, MCD,
attention-alignment diagnostics, plotting."""
from .alignment import (alignment_diagnostics, diagonal_band_mass,
                        peak_drift, token_coverage)
from .dtw import dtw_align_mels, dtw_path, using_native_kernel
from .oversmoothing import (aligned_mae_distance,
                            compute_mel_oversmoothing_metrics,
                            framewise_rfft_power, mcd,
                            oversmoothing_metrics_aligned)

__all__ = [
    "dtw_align_mels", "dtw_path", "using_native_kernel",
    "aligned_mae_distance", "compute_mel_oversmoothing_metrics",
    "framewise_rfft_power", "mcd", "oversmoothing_metrics_aligned",
    "alignment_diagnostics", "diagonal_band_mass", "peak_drift",
    "token_coverage",
]
