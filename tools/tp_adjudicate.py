"""TP benefit adjudication with measured single-chip anchors (VERDICT r3 #6).

`parallel/tp.py` shards each ConvFFN's d_inner contraction over a 'model'
mesh axis (exactness proven by tests + the driver dryrun; all-reduce count
pinned by `tests/test_tp.py`). Real multi-chip hardware is unavailable in
this environment, so the expected latency benefit is bounded ANALYTICALLY,
anchored by two single-chip measurements this tool makes:

  1. t_total  — full FastPitch mel-infer latency, batch 1 (the latency-bound
     serving regime TP targets; DP cannot split one utterance);
  2. t_ffn    — time of the 12 ConvFFN blocks alone at the same activation
     shapes (6 encoder blocks at [1, T_text, 384], 6 decoder blocks at
     [1, T_mel, 384]), chained inside one jit to amortize dispatch.

Projection (Megatron column/row split, ONE all-reduce per FFN):

  t_tp(p) = (t_total - t_ffn) + t_ffn / p + 12 * t_ar(p, bytes)
  t_ar(p, S) = 2 (p-1)/p * S / BW_ici + p * t_hop

with S the [1, T, d_model] activation an FFN's output all-reduce moves,
BW_ici one v5e ICI link's unidirectional bandwidth (~45 GB/s; ring
all-reduce over the minor mesh axis uses adjacent links both directions)
and t_hop ~ 1 us per-hop launch latency. Numbers land in docs/PERF.md.

Usage: python tools/tp_adjudicate.py [--t-text 128] [--t-mel 1024]
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

from tts_arabic_tpu.models.fastpitch import FastPitch, FastPitchConfig
from tts_arabic_tpu.models.layers import ConvFFN

BW_ICI = 45e9      # v5e per-link unidirectional, bytes/s (scaling-book class)
T_HOP = 1e-6       # per-hop collective launch latency, s


def timed(fn, iters=5):
    """Two-point RTT-separated exec time (tools/chipbench.py): one tunnel
    round trip dwarfs a B=1 latency, and even dividing a chained batch by
    its length leaves RTT/chain inside — the fit removes it."""
    exec_s, _, _ = bench_exec(lambda: fn(), (), n=iters)
    return exec_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-text", type=int, default=128)
    ap.add_argument("--t-mel", type=int, default=1024)
    ap.add_argument("--chain", type=int, default=16)
    args = ap.parse_args()

    cfg = FastPitchConfig()
    model = FastPitch(cfg)
    rng = jax.random.PRNGKey(0)
    tokens = jax.random.randint(rng, (1, args.t_text), 1, cfg.n_symbols)
    variables = model.init(rng, tokens, max_frames=args.t_mel)

    # 1. full single-utterance mel infer (f32, the parity dtype TP serves)
    fwd = jax.jit(lambda v, t: model.apply(
        v, t, max_frames=args.t_mel, method=FastPitch.infer)["mel"])
    t_total = timed(lambda: fwd(variables, tokens))

    # 2. FFN-only anchors: chain the per-layer block so dispatch amortizes
    ffn = ConvFFN(cfg.d_model, cfg.enc_filter_size, cfg.enc_kernel_size)
    x_enc = jax.random.normal(rng, (1, args.t_text, cfg.d_model))
    x_dec = jax.random.normal(rng, (1, args.t_mel, cfg.d_model))
    fv = ffn.init(rng, x_enc)

    def chained(x, n):
        def f(v, x):
            for _ in range(n):
                x = ffn.apply(v, x)
            return x
        return jax.jit(f)

    n_chain = args.chain
    f_enc, f_dec = chained(x_enc, n_chain), chained(x_dec, n_chain)
    t_enc = timed(lambda: f_enc(fv, x_enc)) / n_chain
    t_dec = timed(lambda: f_dec(fv, x_dec)) / n_chain
    t_ffn = 6 * (t_enc + t_dec)

    print(f"t_total (B=1, {args.t_text} tok -> {args.t_mel} frames): "
          f"{t_total*1e3:.3f} ms")
    print(f"t_ffn_layer enc {t_enc*1e6:.1f} us  dec {t_dec*1e6:.1f} us  "
          f"-> t_ffn(12 blocks) {t_ffn*1e3:.3f} ms "
          f"({100*t_ffn/t_total:.1f}% of total)")

    s_enc = args.t_text * cfg.d_model * 4
    s_dec = args.t_mel * cfg.d_model * 4
    for p in (2, 4, 8):
        t_ar = sum(2 * (p - 1) / p * s / BW_ICI + p * T_HOP
                   for s in [s_enc] * 6 + [s_dec] * 6)
        t_tp = (t_total - t_ffn) + t_ffn / p + t_ar
        print(f"TP-{p}: projected {t_tp*1e3:.3f} ms "
              f"(speedup {t_total/t_tp:.2f}x; collectives {t_ar*1e3:.3f} ms"
              f", ffn {t_ffn/p*1e3:.3f} ms, amdahl {t_total-t_ffn:.4f} s)")


if __name__ == "__main__":
    main()
