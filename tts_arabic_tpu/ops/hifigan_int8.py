"""Static-calibrated int8 serving path for the HiFi-GAN MRF stages.

The v5e MXU runs int8 x int8 -> int32 at double the bf16 rate (measured
343-402 TOP/s raw vs 182-193 TF/s bf16, `tools/bench_int8.py`), and with a
*static* pre-calibrated activation scale the quantize is pure elementwise
work that XLA fuses into the producing op's epilogue — no per-call max-abs
HBM sweep. Measured at the three dense MRF conv shapes, static int8 beats
the adopted bf16 mix at every width: 1.85x at C=256, 1.28x at C=128,
1.44x at C=64 (docs/PERF.md r5).

This module ships that as an OPT-IN post-training-quantized generator:

- weights are quantized per-output-channel symmetric int8 at trace time
  from the unchanged master variables pytree (no new checkpoint format —
  the quantize is O(k*C^2), noise next to the convs it feeds);
- activations are quantized with per-conv-site static scales calibrated
  once from representative mels (`collect_mrf_scales`);
- only the MRF ResBlock convs of stages >= `min_ch` channels run int8;
  residual adds, leaky-relus, upsamples, conv_pre/post and every stage
  below `min_ch` keep the measured-fastest bf16 mix of
  `generator_apply_pallas` (whole-stage packed lanes at C=32).

The reference has no quantized path (it serves fp32,
`/root/reference/vocoder/hifigan/models.py:86-136`); this is a
beyond-reference TPU serving feature. Accuracy is post-training-quantization
grade: ~40 dB waveform SNR vs the bf16 path on calibrated inputs (see
tests/test_int8_vocoder.py), i.e. well under the spectral denoiser's own
default floor.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..vocoder.hifigan import HiFiGANConfig, LRELU_SLOPE
from .hifigan_pallas import _conv1d_same, generator_apply_pallas
from .int8 import int8_conv_static  # noqa: F401  (re-export; shared impl)


def _site(stage: int, block: int, conv: int, di: int) -> str:
    return f"s{stage}b{block}c{conv}d{di}"


class _HookedMRF:
    """ResBlock1 forward with every conv routed through `self.conv(site, y,
    kernel, bias, dilation)`; claims stages of width >= min_ch. Base class
    for both the calibration pass and the int8 pass, so the set of
    calibrated sites and the set of quantized sites coincide by
    construction."""

    def __init__(self, min_ch: int):
        assert min_ch > 32, (
            "min_ch <= 32 would claim the whole-stage packed-lane path "
            "(58 vs 25 TF/s at C=32, docs/PERF.md); int8 is only measured "
            "to win at C >= 64")
        self.min_ch = min_ch

    def claims(self, ch: int) -> bool:
        return ch >= self.min_ch

    def __call__(self, x, params, kernel_size: int,
                 dilations: Sequence[int], *, stage: int, block: int):
        for di, d in enumerate(dilations):
            p1, p2 = params[f"conv1_{di}"], params[f"conv2_{di}"]
            y = jax.nn.leaky_relu(x, LRELU_SLOPE)
            y = self.conv(_site(stage, block, 1, di), y,
                          p1["kernel"], p1["bias"], d)
            y = jax.nn.leaky_relu(y, LRELU_SLOPE)
            y = self.conv(_site(stage, block, 2, di), y,
                          p2["kernel"], p2["bias"], 1)
            x = x + y
        return x


class _StatsMRF(_HookedMRF):
    """Calibration pass: records the max-abs of every claimed conv's input
    (float math, identical activations to the production bf16 path)."""

    def __init__(self, min_ch: int):
        super().__init__(min_ch)
        self.stats: Dict[str, jnp.ndarray] = {}

    def conv(self, site, y, kernel, bias, dilation):
        amax = jnp.max(jnp.abs(y.astype(jnp.float32)))
        self.stats[site] = (jnp.maximum(self.stats[site], amax)
                            if site in self.stats else amax)
        return _conv1d_same(y, kernel.astype(y.dtype),
                            bias.astype(y.dtype), dilation)


class _Int8MRF(_HookedMRF):
    def __init__(self, scales: Dict[str, float], min_ch: int):
        super().__init__(min_ch)
        self.scales = scales

    def conv(self, site, y, kernel, bias, dilation):
        return int8_conv_static(y, kernel, bias, dilation, self.scales[site])


def collect_mrf_scales(variables, mels, config: HiFiGANConfig,
                       min_ch: int = 64, margin: float = 1.0
                       ) -> Dict[str, float]:
    """Calibrate static activation scales for `generator_apply_int8`.

    mels: one [B, T, 80] array or an iterable of them (calibrate in the
    same dtype the serving path will run — pass bf16 mels for a bf16
    pipeline). Returns {site: ascale} python floats (trace-time constants
    for the int8 program). margin > 1 leaves headroom above the calibrated
    max-abs; saturation beyond it is symmetric clipping."""
    if hasattr(mels, "ndim"):
        mels = [mels]
    hook = _StatsMRF(min_ch)

    @jax.jit
    def run(v, m):
        hook.stats = {}
        generator_apply_pallas(v, m, config, strategy="xla",
                               resblock_override=hook)
        return dict(hook.stats)

    amax: Dict[str, float] = {}
    for m in mels:
        got = jax.device_get(run(variables, jnp.asarray(m)))
        for k, v in got.items():
            amax[k] = max(amax.get(k, 0.0), float(v))
    assert amax, "no MRF stage reaches min_ch channels"
    return {k: max(v, 1e-12) * margin / 127.0 for k, v in amax.items()}


def generator_apply_int8(variables, mel, config: HiFiGANConfig,
                         scales: Dict[str, float], *, min_ch: int = 64,
                         strategy: str = "auto"):
    """Drop-in for `Generator.apply` with the claimed MRF stages in static
    int8 (same variables pytree; `scales` from `collect_mrf_scales`)."""
    hook = _Int8MRF(scales, min_ch)
    return generator_apply_pallas(variables, mel, config, strategy=strategy,
                                  resblock_override=hook)
