"""Attainable-rate probe for the train step's own GEMM shapes (VERDICT r3 #2).

The adversarial FastPitch train step measures 0.22 MFU against the bf16
spec peak. Before chasing a higher number, measure what THIS chip
sustains on bare XLA ops shaped exactly like the step's FLOP carriers —
the 12 FFT-layer ConvFFN convs (85% of step FLOPs) in forward, input-grad
and weight-grad form, at the production bucket [batch 10 x 1000 frames].
If the bare-op aggregate is below the target, the step cannot reach it.

Usage: python tools/bench_train_gemms.py [--dtype float32|bfloat16]
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

M = 10 * 1000            # production bucket: batch 10 x 1000 mel frames
D, F, KS = 384, 1536, 3  # d_model, d_inner, conv kernel


def bench(f, args, fl, n=5):
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for i in range(n):
        # perturb the first arg so axon cannot early-return a replayed
        # dispatch (docs/PERF.md timing caveat)
        args = (jax.tree.map(
            lambda a: a + jnp.asarray(i * 1e-6, a.dtype), args[0]),
        ) + args[1:]
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        # force a REAL fetch of one element — slice on device first; a
        # whole-array np.asarray would time the ~40 MB/s tunnel transfer,
        # not the chip (first r4 run of this tool made that mistake:
        # "0.2 TF/s" on a 10000x1152x1536 GEMM was a 61 MB D2H)
        float(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return fl / best / 1e12, best


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--chain", type=int, default=12)
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)
    rng = jax.random.PRNGKey(0)
    B, T = 10, 1000
    x = jax.random.normal(rng, (B, T, D), dt)
    w1 = jax.random.normal(rng, (KS, D, F), dt) * 0.02
    w2 = jax.random.normal(rng, (KS, F, D), dt) * 0.02
    fl_fwd = 2 * B * T * KS * D * F * 2  # conv1 + conv2 per FFN

    def ffn_chain(x, w1, w2):
        for _ in range(args.chain):
            x = conv(jax.nn.relu(conv(x, w1)), w2)
        return x

    tf, t = bench(jax.jit(ffn_chain), (x, w1, w2), fl_fwd * args.chain)
    print(f"FFN fwd chain x{args.chain} [{B}x{T}x{D}] {dt}: "
          f"{tf:.1f} TF/s ({t*1e3:.1f} ms)")

    # full fwd+bwd of the chained FFNs (dgrad + wgrad GEMMs included):
    # 3x the fwd FLOPs per conv
    def loss(params, x):
        w1, w2 = params
        return jnp.sum(ffn_chain(x, w1, w2) ** 2)

    g = jax.jit(jax.grad(loss))
    tf, t = bench(g, ((w1, w2), x), 3 * fl_fwd * args.chain)
    print(f"FFN fwd+bwd chain x{args.chain}: {tf:.1f} TF/s ({t*1e3:.1f} ms)")

    # plain GEMMs at the unfolded shapes, for reference
    for (m, k, n) in [(M, KS * D, F), (M, KS * F, D), (KS * F, M, D)]:
        a = jax.random.normal(rng, (m, k), dt)
        b = jax.random.normal(rng, (k, n), dt)

        def mm(a, b):
            acc = 0.0
            for i in range(8):
                acc = acc + jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())))
            return acc
        tf, t = bench(jax.jit(mm), (a, b), 8 * 2 * m * k * n)
        print(f"GEMM [{m}x{k}]@[{k}x{n}] x8 {dt}: {tf:.1f} TF/s "
              f"({t*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
