"""Static-scale int8 1-D convolution for the MXU's double-rate path.

Shared by the HiFi-GAN MRF serving path (`ops/hifigan_int8.py`) and the
FastPitch decoder-FFN serving path (`models/layers.py::ConvFFN`): the v5e
runs int8 x int8 -> int32 at 2x the bf16 rate (343-402 TOP/s measured,
`tools/bench_int8.py`), and with a static pre-calibrated activation scale
the quantize is pure elementwise work XLA fuses into the producer's
epilogue. Measured wins: 1.28-1.85x at the MRF conv shapes, 1.75x at the
FastPitch ConvFFN shapes (`tools/bench_int8_ffn.py`, docs/PERF.md r5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def weight_qparams(kernel):
    """Per-output-channel symmetric scale + int8 grid for a [k, Cin, Cout]
    kernel, computed at trace time from the float master weights so the
    variables pytree (and every checkpoint import/export path) is
    untouched."""
    wf = kernel.astype(jnp.float32)
    wmax = jnp.max(jnp.abs(wf), axis=(0, 1))
    wscale = jnp.maximum(wmax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(wf / wscale), -127, 127).astype(jnp.int8)
    return wq, wscale


def int8_conv_static(y, kernel, bias, dilation: int, ascale):
    """SAME conv with static-scale int8 activations and per-channel int8
    weights: y [B, T, C] (any float dtype) -> [B, T, Cout] in y.dtype.

    `ascale` may be a python float (compile-time constant) or a traced f32
    scalar. int32 accumulation is exact (|acc| <= k*C*127^2 < 2^31 for
    every shape in this codebase); the only approximation is the
    round-to-grid of inputs and weights, so the result equals the f32
    fake-quant conv to f32 accumulation tolerance (tested)."""
    wq, wscale = weight_qparams(kernel)
    xq = jnp.clip(jnp.round(y.astype(jnp.float32) * (1.0 / ascale)),
                  -127, 127).astype(jnp.int8)
    k = kernel.shape[0]
    pad = (k - 1) * dilation // 2
    acc = jax.lax.conv_general_dilated(
        xq, wq, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (ascale * wscale) + bias.astype(
        jnp.float32)
    return out.astype(y.dtype)
