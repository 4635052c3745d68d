"""Chained ResBlock micro-benchmark: XLA vs Pallas unfold vs Pallas packed.

Methodology (docs/PERF.md): chain N applications inside one jit so per-
dispatch tunnel overhead (~100 ms on axon) amortizes; block + fetch a
scalar from the result; report sustained TFLOP/s per strategy.

Usage: python tools/bench_resblock.py [--chain 8] [--iters 5]
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from chipbench import bench_exec

from tts_arabic_tpu.ops.hifigan_pallas import (_resblock_xla, resblock_pallas,
                                               resblock_pallas_packed,
                                               resblock_packed_xla)
from tts_arabic_tpu.vocoder.hifigan import ResBlock1


def flops(B, T, C, k, n_dil):
    # 2 convs per dilation stage, each B*T*k*C*C MACs, 2 FLOPs/MAC.
    # (r4 correction: an extra x2 inflated every TF/s this tool printed
    # before 2026-08-19 — e.g. "93.4" at C=64 was really 46.7. Ratios
    # between strategies were unaffected. eval/flops.py was always right.)
    return 2 * n_dil * B * T * k * C * C * 2


def bench(fn, x, chain, iters):
    @jax.jit
    def chained(x):
        for _ in range(chain):
            x = fn(x)
        return x

    # two-point RTT-separated exec time (tools/chipbench.py). The old
    # single-call loop here reported exec + one blocking round trip
    # (~40-70 ms), deflating every TF/s this tool printed before
    # 2026-08-19 by RTT/(exec+RTT) — up to ~2x for the faster stages.
    exec_s, _, _ = bench_exec(chained, (x,), n=iters, k=None)
    return exec_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)

    # stage shapes from the profiled HiFi-GAN run (batch 16, ~1536 mel
    # frames -> T*128 at C=64 (stage 2), T*256 at C=32 (stage 3))
    # stage MRF shapes for the headline config (batch 16, 1536-frame mel
    # bucket): C=256 after the first 8x upsample, then 128/64/32. r4 adds
    # the C=128/C=256 rows to locate the post-packing MFU ceiling (the
    # C=128 stage alone is 43% of generator FLOPs).
    cases = [
        (16, 24576, 256, 7, (1, 3, 5)),
        (16, 98304, 128, 7, (1, 3, 5)),
        (16, 196608, 64, 7, (1, 3, 5)),
        (16, 393216, 32, 7, (1, 3, 5)),
    ]
    rng = jax.random.PRNGKey(0)
    for B, T, C, k, dil in cases:
        rb = ResBlock1(C, k, dil)
        xs = jax.random.normal(rng, (1, 64, C), jnp.float32)
        params = rb.init(rng, xs)["params"]
        x = jax.random.normal(rng, (B, T, C), jnp.float32).astype(dt)
        fl = flops(B, T, C, k, len(dil)) * args.chain
        strategies = {
            "xla": lambda y: _resblock_xla(y, params, k, dil),
            "unfold": lambda y: resblock_pallas(y, params, k, dil),
            "packed": lambda y: resblock_pallas_packed(y, params, k, dil),
            "packed_xla": lambda y: resblock_packed_xla(y, params, k, dil),
        }
        print(f"B={B} T={T} C={C} k={k} chain={args.chain} dtype={dt}")
        for name, fn in strategies.items():
            try:
                t = bench(fn, x, args.chain, args.iters)
                print(f"  {name:8s} {t*1e3:8.1f} ms  {fl/t/1e12:6.2f} TF/s")
            except Exception as e:  # compile failure etc.
                print(f"  {name:8s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
