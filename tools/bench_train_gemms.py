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

from chipbench import bench_exec

M = 10 * 1000            # production bucket: batch 10 x 1000 mel frames
D, F, KS = 384, 1536, 3  # d_model, d_inner, conv kernel


def bench(f, args, fl):
    # two-point RTT-separated exec time (tools/chipbench.py): single-call
    # wall over the tunnel is RTT-dominated (the first r4 runs of this
    # tool measured ~the same "time" for 0.85 and 2.55 TFLOP programs)
    exec_s, rtt_s, _ = bench_exec(f, args)
    return fl / exec_s / 1e12, exec_s, rtt_s


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
    # DISTINCT weights per chained layer, like the real 12-layer stack
    # (shared weights would chain every layer's wgrad into one serial
    # accumulation the real step doesn't have)
    w1 = jax.random.normal(rng, (args.chain, KS, D, F), dt) * 0.02
    w2 = jax.random.normal(rng, (args.chain, KS, F, D), dt) * 0.02
    fl_fwd = 2 * B * T * KS * D * F * 2  # conv1 + conv2 per FFN

    def ffn_chain(x, w1, w2):
        for i in range(args.chain):
            x = conv(jax.nn.relu(conv(x, w1[i])), w2[i])
        return x

    tf, t, rtt = bench(jax.jit(ffn_chain), (x, w1, w2),
                       fl_fwd * args.chain)
    print(f"FFN fwd chain x{args.chain} [{B}x{T}x{D}] {dt}: "
          f"{tf:.1f} TF/s ({t*1e3:.1f} ms exec, rtt {rtt*1e3:.0f} ms)")

    # full fwd+bwd of the chained FFNs (dgrad + wgrad GEMMs included):
    # 3x the fwd FLOPs per conv
    def loss(params, x):
        w1, w2 = params
        return jnp.sum(ffn_chain(x, w1, w2) ** 2)

    g = jax.jit(jax.grad(loss))
    tf, t, rtt = bench(g, ((w1, w2), x), 3 * fl_fwd * args.chain)
    print(f"FFN fwd+bwd chain x{args.chain}: {tf:.1f} TF/s "
          f"({t*1e3:.1f} ms exec)")

    # per-tap-matmul ConvFFN: y[t] = sum_d x[t+d] @ W[d] — the same conv
    # expressed as 3 dense [B*T, D] @ [D, F] GEMMs per conv. If this beats
    # conv_general_dilated at the step's shapes, the FFN lowering (85% of
    # step FLOPs) is the lever.
    def conv_taps(x, w):
        y = jnp.einsum("bti,io->bto", x, w[1])
        y = y.at[:, 1:].add(jnp.einsum("bti,io->bto", x[:, :-1], w[0]))
        return y.at[:, :-1].add(jnp.einsum("bti,io->bto", x[:, 1:], w[2]))

    def ffn_chain_taps(x, w1, w2):
        for i in range(args.chain):
            x = conv_taps(jax.nn.relu(conv_taps(x, w1[i])), w2[i])
        return x

    tf, t, _ = bench(jax.jit(ffn_chain_taps), (x, w1, w2),
                     fl_fwd * args.chain)
    print(f"FFN(tap-GEMM) fwd chain x{args.chain}: {tf:.1f} TF/s "
          f"({t*1e3:.1f} ms exec)")

    def loss_taps(params, x):
        w1, w2 = params
        return jnp.sum(ffn_chain_taps(x, w1, w2) ** 2)

    tf, t, _ = bench(jax.jit(jax.grad(loss_taps)), ((w1, w2), x),
                     3 * fl_fwd * args.chain)
    print(f"FFN(tap-GEMM) fwd+bwd chain x{args.chain}: {tf:.1f} TF/s "
          f"({t*1e3:.1f} ms exec)")

    # plain GEMMs at the unfolded shapes: a DEPENDENCY chain of
    # alternating [M,K]@[K,N] / [M,N]@[N,K] dots (identical accumulated
    # dots get CSE'd — the first r4 run measured one dot as eight).
    for (m, k, n) in [(M, KS * D, F), (M, F, D)]:
        a = jax.random.normal(rng, (m, k), dt)
        b1 = jax.random.normal(rng, (k, n), dt) / np.sqrt(k)
        b2 = jax.random.normal(rng, (n, k), dt) / np.sqrt(n)

        def mm(a, b1, b2):
            for _ in range(8):
                a = jax.lax.dot_general(a, b1, (((1,), (0,)), ((), ())))
                a = jax.lax.dot_general(a, b2, (((1,), (0,)), ((), ())))
            return a
        tf, t, _ = bench(jax.jit(mm), (a, b1, b2), 8 * 2 * 2 * m * k * n)
        print(f"GEMM chain [{m}x{k}]@[{k}x{n}] alt x16 {dt}: {tf:.1f} TF/s "
              f"({t*1e3:.1f} ms exec)")

    # calibrate XLA cost_analysis flops vs the analytic count used above
    comp = jax.jit(ffn_chain).lower(x, w1, w2).compile()
    ca = (comp.cost_analysis() or [{}])
    ca = ca[0] if isinstance(ca, list) else ca
    print(f"cost_analysis flops for fwd chain: "
          f"{float(ca.get('flops', 0))/1e12:.3f} TFLOP "
          f"vs analytic {fl_fwd*args.chain/1e12:.3f} TFLOP")


if __name__ == "__main__":
    main()
