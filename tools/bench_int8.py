"""int8 MXU probe: is double-rate int8 reachable on this part, and does it
survive the quantize/dequantize overhead at the HiFi-GAN MRF stage shapes?

v5e datasheet peak: 197 bf16 TF/s, 394 int8 TOPS. The MRF0 stage
(B=16, T=24576, C=256) already measures AT the bf16 peak (191.8 TF/s,
docs/PERF.md r4), so if XLA lowers int8 convs to the double-rate MXU
path, the conv-bound share of the generator could nearly halve.

Two questions, measured separately (two-point RTT-separated timing,
tools/chipbench.py):
  1. raw dot_general: bf16 vs int8xint8->int32 at 4096^3 / 8192^3.
  2. the real MRF conv shapes, *including* dynamic per-tensor activation
     quantization + per-channel weight dequant of the int32 accumulator
     inside the timed region (what a production int8 path must pay).

Usage: python tools/bench_int8.py [--iters 5] [--chain 8]
"""
import argparse
import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from chipbench import bench_exec


def bench_matmul(n, dtype, iters):
    rng = np.random.default_rng(0)
    if dtype == "int8":
        a = jnp.asarray(rng.integers(-127, 127, (n, n), np.int8))
        b = jnp.asarray(rng.integers(-127, 127, (n, n), np.int8))

        @jax.jit
        def f(a, b):
            # chain in int8: requantize the int32 accumulator with a
            # power-of-two shift so the loop stays on the int8 MXU path
            for _ in range(4):
                acc = jax.lax.dot(a, b, preferred_element_type=jnp.int32)
                a = (acc >> 8).astype(jnp.int8)
            return a
    else:
        a = jnp.asarray(rng.standard_normal((n, n)), jnp.dtype(dtype))
        b = jnp.asarray(rng.standard_normal((n, n)), jnp.dtype(dtype))

        @jax.jit
        def f(a, b):
            for _ in range(4):
                a = jax.lax.dot(a, b, preferred_element_type=a.dtype)
            return a

    exec_s, rtt, t1 = bench_exec(f, (a, b), n=iters, k=None)
    ops = 4 * 2 * n**3
    return ops / exec_s / 1e12


def conv_bf16(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.bfloat16)


def conv_int8_dynamic(x, wq, wscale):
    """bf16 in -> dynamic per-tensor activation quant -> int8 conv ->
    per-output-channel dequant -> bf16 out. Everything a serving path
    would pay, inside the timed region."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    ascale = amax / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ascale), -127, 127
                  ).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (ascale * wscale)).astype(jnp.bfloat16)


def conv_int8_static(x, wq, wscale, ascale):
    """Static calibrated activation scale: the quantize is pure elementwise
    (fusable into the previous op's epilogue), no max-abs HBM sweep."""
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / ascale)),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (ascale * wscale)).astype(jnp.bfloat16)


def bench_conv(B, T, C, k, iters, chain):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, C, C)) / np.sqrt(k * C),
                    jnp.bfloat16)
    # per-output-channel symmetric weight quant
    wf = np.asarray(w, np.float32)
    wmax = np.abs(wf).max(axis=(0, 1), keepdims=True)
    wscale = jnp.asarray((wmax / 127.0).reshape(1, 1, -1), jnp.float32)
    wq = jnp.asarray(np.clip(np.round(wf / (wmax / 127.0)), -127, 127),
                     jnp.int8)

    fl = chain * 2 * B * T * k * C * C  # MACs*2 per conv application

    @jax.jit
    def f_bf16(x):
        for _ in range(chain):
            x = conv_bf16(x, w)
        return x

    @jax.jit
    def f_int8(x):
        for _ in range(chain):
            x = conv_int8_dynamic(x, wq, wscale)
        return x

    ascale = 4.0 / 127.0  # placeholder calibrated scale (timing only)

    @jax.jit
    def f_int8_static(x):
        for _ in range(chain):
            x = conv_int8_static(x, wq, wscale, ascale)
        return x

    out = {}
    for name, f in (("bf16", f_bf16), ("int8dyn", f_int8),
                    ("int8sta", f_int8_static)):
        exec_s, _, _ = bench_exec(f, (x,), n=iters, k=None)
        out[name] = fl / exec_s / 1e12
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")

    print("== raw matmul (4-chain, requantized between steps) ==")
    for n in (4096, 8192):
        for dt in ("bfloat16", "int8"):
            try:
                tf = bench_matmul(n, dt, args.iters)
                print(f"  {n}^3 {dt:9s} {tf:7.1f} T{'OP' if dt=='int8' else 'F'}/s")
            except Exception as e:
                print(f"  {n}^3 {dt:9s} FAILED: {type(e).__name__}: {e}")

    print("== MRF conv shapes (quant/dequant INSIDE timed region) ==")
    for B, T, C, k in ((16, 24576, 256, 7), (16, 98304, 128, 7),
                       (16, 196608, 64, 7)):
        try:
            r = bench_conv(B, T, C, k, args.iters, args.chain)
            print(f"  B={B} T={T} C={C} k={k}: bf16 {r['bf16']:6.1f} TF/s"
                  f"  int8dyn {r['int8dyn']:6.1f} ({r['int8dyn']/r['bf16']:.2f}x)"
                  f"  int8sta {r['int8sta']:6.1f} ({r['int8sta']/r['bf16']:.2f}x)")
        except Exception as e:
            print(f"  B={B} T={T} C={C}: FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
