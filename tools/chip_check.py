"""Compile-and-run smoke check of every Pallas kernel on the real chip.

The pytest suite runs the kernels in interpret mode on CPU, which cannot
catch Mosaic compiler regressions (e.g. the `.at[0]` ref-view crash fixed
2026-08-17, or the bf16 `pltpu.roll` crash — both compiled fine in
interpret mode). Run this on TPU after a jax/libtpu bump or kernel edit:

    python tools/chip_check.py

Exits non-zero on the first kernel that fails to compile, run, or match
its XLA reference.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def check(name, fn):
    try:
        fn()
        print(f"  ok   {name}")
    except Exception as e:
        print(f"  FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
        sys.exit(1)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    if dev.platform != "tpu":
        print("not a TPU — nothing to check (kernels dispatch to XLA "
              "fallbacks off-TPU)")
        return

    def mas_check():
        from tts_arabic_tpu.align.mas import mas
        from tts_arabic_tpu.ops.mas_pallas import mas_pallas
        rng = np.random.default_rng(0)
        B, T_mel, T_txt = 10, 1000, 160  # production train-step shape
        attn = np.log(rng.random((B, T_mel, T_txt)).astype(np.float32)
                      + 1e-3)
        il = rng.integers(2, T_txt + 1, B).astype(np.int32)
        ol = rng.integers(il, T_mel + 1).astype(np.int32)
        got = np.asarray(mas_pallas(jnp.asarray(attn), jnp.asarray(il),
                                    jnp.asarray(ol)))
        ref = np.asarray(mas(jnp.asarray(attn), jnp.asarray(il),
                             jnp.asarray(ol)))
        assert np.array_equal(got, ref), "pallas MAS != scan MAS"

    check("mas_pallas [10,1000,160] == lax.scan", mas_check)

    def resblock_check(variant):
        from tts_arabic_tpu.ops.hifigan_pallas import (resblock_pallas,
                                                       resblock_pallas_packed)
        from tts_arabic_tpu.vocoder.hifigan import ResBlock1
        kfn = (resblock_pallas if variant == "unfold"
               else resblock_pallas_packed)

        def run():
            rng = jax.random.PRNGKey(0)
            C, k, dil = 32, 7, (1, 3, 5)
            rb = ResBlock1(C, k, dil)
            x32 = jax.random.normal(rng, (2, 4096, C), jnp.float32)
            v = rb.init(rng, x32)
            for dt in (jnp.float32, jnp.bfloat16):
                x = x32.astype(dt)
                got = np.asarray(kfn(x, v["params"], k, dil),
                                 np.float32)
                ref = np.asarray(rb.apply(
                    jax.tree.map(lambda p: p.astype(dt), v), x), np.float32)
                snr = 10 * np.log10(np.mean(ref ** 2) /
                                    (np.mean((ref - got) ** 2) + 1e-20))
                assert snr > (60 if dt == jnp.float32 else 25), \
                    f"{variant} {dt} SNR {snr:.1f} dB"
        return run

    check("resblock_pallas (unfold) f32+bf16", resblock_check("unfold"))
    check("resblock_pallas_packed f32+bf16", resblock_check("packed"))

    def generator_check():
        from tts_arabic_tpu.ops.hifigan_pallas import generator_apply_pallas
        from tts_arabic_tpu.vocoder.hifigan import Generator, HiFiGANConfig
        cfg = HiFiGANConfig()
        gen = Generator(cfg)
        rng = jax.random.PRNGKey(1)
        mel = jax.random.normal(rng, (2, 64, 80), jnp.bfloat16) - 5.0
        v = gen.init(rng, jnp.zeros((1, 16, 80)))
        got = np.asarray(jax.jit(
            lambda v, m: generator_apply_pallas(v, m, cfg))(v, mel),
            np.float32)
        ref = np.asarray(gen.apply(v, mel), np.float32)
        snr = 10 * np.log10(np.mean(ref ** 2) /
                            (np.mean((ref - got) ** 2) + 1e-20))
        assert snr > 25, f"generator SNR {snr:.1f} dB"

    check("generator_apply_pallas (auto strategy) bf16", generator_check)
    print("all pallas kernels compile and match on-chip")


if __name__ == "__main__":
    main()
