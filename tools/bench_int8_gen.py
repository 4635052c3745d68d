"""A/B the FULL HiFi-GAN generator: adopted bf16 auto mix vs the
static-calibrated int8 MRF path (ops/hifigan_int8.py), at the serving
shapes the e2e bench actually executes. This is the whole-program check
behind the per-conv probe (tools/bench_int8.py): quantize/dequant live in
the real producer/consumer graph here, so the number includes whatever
XLA does (or fails to do) about fusing them.

Usage: python tools/bench_int8_gen.py [--batch 16] [--frames 768]
       [--min-ch 64] [--iters 5]
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from chipbench import bench_exec
from tts_arabic_tpu.ops.hifigan_int8 import (collect_mrf_scales,
                                             generator_apply_int8)
from tts_arabic_tpu.ops.hifigan_pallas import generator_apply_pallas
from tts_arabic_tpu.vocoder.hifigan import (Generator, HiFiGANConfig,
                                            generator_flops_per_frame)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=768)
    ap.add_argument("--min-ch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")

    cfg = HiFiGANConfig()
    rng = np.random.default_rng(0)
    mel_f32 = jnp.asarray(
        rng.standard_normal((args.batch, args.frames, 80)) * 1.5 - 5.0,
        jnp.float32)
    mel = mel_f32.astype(jnp.bfloat16)
    variables = Generator(cfg).init(jax.random.PRNGKey(0), mel_f32[:1, :16])
    scales = collect_mrf_scales(variables, mel, cfg, min_ch=args.min_ch)
    print(f"calibrated {len(scales)} sites (min_ch={args.min_ch})")

    fl = args.batch * args.frames * generator_flops_per_frame(cfg)
    runs = {
        "bf16_auto": jax.jit(
            lambda v, m: generator_apply_pallas(v, m, cfg, strategy="auto")),
        "int8_mixed": jax.jit(
            lambda v, m: generator_apply_int8(v, m, cfg, scales,
                                              min_ch=args.min_ch)),
    }
    out = {}
    for name, f in runs.items():
        exec_s, rtt, t1 = bench_exec(f, (variables, mel), n=args.iters,
                                     k=None)
        out[name] = exec_s
        print(f"  {name:10s} exec {exec_s * 1e3:7.2f} ms  "
              f"{fl / exec_s / 1e12:6.1f} TF/s(bf16-equiv)  rtt {rtt * 1e3:.0f} ms")
    print(f"  speedup int8/bf16: {out['bf16_auto'] / out['int8_mixed']:.3f}x")

    # quality on the same inputs
    ref = np.asarray(runs["bf16_auto"](variables, mel), np.float64)
    q = np.asarray(runs["int8_mixed"](variables, mel), np.float64)
    snr = 10 * np.log10((ref ** 2).sum() / max(((q - ref) ** 2).sum(), 1e-30))
    print(f"  snr vs bf16: {snr:.1f} dB")


if __name__ == "__main__":
    main()
