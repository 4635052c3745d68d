"""int8 probe at the FastPitch ConvFFN shapes: is the decoder's FFN worth
quantizing? The decoder is ~1/6 of e2e compute (ttmel anchor ~5.4-6.3kx vs
e2e ~1kx), and 2/3 of its FLOPs are the 12 ConvFFN pairs
[B, T, 384] x [3, 384, 1536] -> gelu/relu -> [3, 1536, 384]. Unlike the
vocoder MRF (T ~ 200k wave-rate frames), these run at mel rate (T <= 1000)
— small tensors where the MXU may be occupancy-bound rather than
rate-bound, so double-rate int8 may not pay. Measured before shipping
anything (same method as tools/bench_int8.py: static activation scale,
per-output-channel weight quant, all overhead inside the timed region).

Usage: python tools/bench_int8_ffn.py [--batch 16] [--frames 768]
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from chipbench import bench_exec


def make_ffn(B, T, d_model, d_inner, k, dtype, quant):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, d_model)), dtype)
    w1 = jnp.asarray(rng.standard_normal((k, d_model, d_inner))
                     / np.sqrt(k * d_model), dtype)
    w2 = jnp.asarray(rng.standard_normal((k, d_inner, d_model))
                     / np.sqrt(k * d_inner), dtype)

    def conv(y, w):
        return jax.lax.conv_general_dilated(
            y, w, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=dtype)

    def qconv(y, w, ascale):
        wf = w.astype(jnp.float32)
        ws = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1)), 1e-12) / 127.0
        wq = jnp.clip(jnp.round(wf / ws), -127, 127).astype(jnp.int8)
        yq = jnp.clip(jnp.round(y.astype(jnp.float32) / ascale),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            yq, wq, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (ascale * ws)).astype(y.dtype)

    n_layers = 12  # chain like the 6+6 FFT stacks

    @jax.jit
    def f(x):
        for _ in range(n_layers):
            if quant:
                h = jax.nn.relu(qconv(x, w1, 4.0 / 127.0))
                x = x + qconv(h, w2, 4.0 / 127.0)
            else:
                h = jax.nn.relu(conv(x, w1))
                x = x + conv(h, w2)
        return x

    flops = n_layers * 2 * 2 * B * T * k * d_model * d_inner
    return f, (x,), flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=768)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")
    for B, T in ((args.batch, args.frames), (args.batch, 160)):
        row = f"  B={B} T={T}:"
        base = None
        for quant in (False, True):
            f, fargs, fl = make_ffn(B, T, 384, 1536, 3, jnp.bfloat16, quant)
            exec_s, rtt, _ = bench_exec(f, fargs, n=args.iters, k=None)
            tf = fl / exec_s / 1e12
            row += (f"  {'int8' if quant else 'bf16'} {exec_s * 1e3:7.3f} ms"
                    f" {tf:6.1f} TF/s")
            if quant and base:
                row += f"  ({base / exec_s:.2f}x)"
            if not quant:
                base = exec_s
        print(row)


if __name__ == "__main__":
    main()
