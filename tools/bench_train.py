"""Training-step throughput benchmark on the real TPU chip.

Runs the FULL production FastPitch adversarial training step (ConvAttention
soft alignment -> in-graph MAS -> teacher-forced forward -> composite +
CTC + KL losses -> LSGAN critic D/G updates, one jitted program; reference
recipe scripts/train_fp_adv.py) at the real bucket shape from
configs/nawar_fp_adv.yaml (batch 10 x mel<=1000) and reports steps/s,
mel-frames/s, and train MFU from XLA's compiled cost model.

Usage: python tools/bench_train.py [--steps 20] [--batch 10] [--frames 1000]

`--vocoder` instead benchmarks the HiFi-GAN adversarial vocoder step
(train/vocoder.py: full-size generator + MPD/MSD at the published recipe
shapes, segment 8192 x batch 16).
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tts_arabic_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp


def make_batch(rng, B, T_txt, T_mel):
    tokens = rng.integers(1, 40, (B, T_txt)).astype(np.int32)
    return {
        "tokens": tokens,
        "token_lens": np.full((B,), T_txt, np.int32),
        "mel_tgt": rng.standard_normal((B, T_mel, 80)).astype(np.float32),
        "mel_lens": np.full((B,), T_mel, np.int32),
        "pitch_dense": rng.standard_normal((B, 1, T_mel)).astype(np.float32),
        "energy_dense": np.abs(
            rng.standard_normal((B, T_mel))).astype(np.float32),
        "attn_prior": np.full((B, T_mel, T_txt), 1.0 / T_txt, np.float32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--tokens", type=int, default=160)
    ap.add_argument("--no-adv", action="store_true")
    ap.add_argument("--rng-impl", default=None,
                    help="PRNG impl for the step rng (e.g. 'rbg'): the "
                         "dropout masks are ~125M random words/step at the "
                         "production shape, and threefry2x32 generates them "
                         "in software on the VPU")
    ap.add_argument("--flat-opt", action="store_true",
                    help="optax.flatten the optimizers (one "
                         "fused update over a concatenated "
                         "vector instead of per-leaf ops)")
    ap.add_argument("--scan-layers", action="store_true",
                    help="compile the 6+6 FFT blocks as one lax.scan over "
                         "a stacked layer axis (op-count lever, VERDICT r4 "
                         "#5) instead of 12 unrolled copies")
    ap.add_argument("--vocoder", action="store_true",
                    help="benchmark the HiFi-GAN vocoder GAN step instead")
    ap.add_argument("--segment", type=int, default=8192)
    ap.add_argument("--gen-channels", type=int, default=512,
                    help="generator upsample_initial_channel (shrink for "
                         "off-chip smoke runs)")
    ap.add_argument("--disc-width", type=float, default=1.0)
    args = ap.parse_args()

    if args.vocoder:
        return bench_vocoder(args)

    from tts_arabic_tpu.models.fastpitch import FastPitch, FastPitchConfig
    from tts_arabic_tpu.train.gan import PatchDiscriminator
    from tts_arabic_tpu.train.steps import (TrainState, make_optimizer,
                                            make_fastpitch_train_step)
    from tts_arabic_tpu.eval.flops import chip_peak_flops

    config = FastPitchConfig(scan_layers=args.scan_layers)
    # production shape: 384-dim, 6+6 FFT layers
    model = FastPitch(config)
    B, T_txt, T_mel = args.batch, args.tokens, args.frames
    rng = np.random.default_rng(0)
    batch = make_batch(rng, B, T_txt, T_mel)
    durs0 = np.full((B, T_txt), T_mel / T_txt, np.float32)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["tokens"][:1]),
        jnp.asarray(batch["token_lens"][:1]),
        jnp.asarray(batch["mel_tgt"][:1]),
        jnp.asarray(batch["mel_lens"][:1]),
        jnp.asarray(batch["pitch_dense"][:1]),
        jnp.asarray(batch["energy_dense"][:1]),
        jnp.asarray(batch["attn_prior"][:1]), jnp.asarray(durs0[:1]),
        deterministic=True, method=FastPitch.forward_train)

    tx = make_optimizer(1e-4, flatten=args.flat_opt)
    if args.no_adv:
        critic, tx_d, d_vars = None, None, None
        state = TrainState(params=variables["params"],
                           opt_state=tx.init(variables["params"]),
                           step=jnp.asarray(0))
    else:
        critic = PatchDiscriminator(32)
        d_vars = critic.init({"params": jax.random.PRNGKey(1)},
                             jnp.zeros((1, 128, 80, 1)))
        tx_d = make_optimizer(1e-4, flatten=args.flat_opt)
        state = TrainState(
            params=variables["params"],
            opt_state=tx.init(variables["params"]), step=jnp.asarray(0),
            d_params=d_vars["params"],
            d_opt_state=tx_d.init(d_vars["params"]),
            d_spectral=d_vars["spectral"])
    step_fn = make_fastpitch_train_step(model, tx, critic=critic, tx_d=tx_d)
    jit_step = jax.jit(lambda s, b, r: step_fn(s, b, r), donate_argnums=0)

    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    key = (jax.random.key(0, impl=args.rng_impl) if args.rng_impl
           else jax.random.PRNGKey(0))

    t0 = time.perf_counter()
    lowered = jax.jit(lambda s, b, r: step_fn(s, b, r)).lower(
        state, dev_batch, key)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    step_flops = float(cost.get("flops", 0.0))
    print(f"compile {time.perf_counter()-t0:.0f}s; XLA cost model: "
          f"{step_flops/1e12:.2f} TFLOP/step", file=sys.stderr)

    state, meta = jit_step(state, dev_batch, key)
    float(meta["loss"])  # block + force fetch
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, meta = jit_step(state, dev_batch,
                               jax.random.fold_in(key, i))
    loss = float(meta["loss"])  # chain-blocks the whole run
    dt = time.perf_counter() - t0
    sps = args.steps / dt
    # params/data are f32, but JAX's default matmul precision executes f32
    # matmuls on the MXU as bf16 passes — the honest roofline is bf16 peak
    peak = chip_peak_flops(dtype="bf16")
    tf = step_flops * sps / 1e12
    print(f"adv={not args.no_adv} B={B} T_mel={T_mel} T_txt={T_txt}: "
          f"{sps:.2f} steps/s  {sps*B:.1f} ex/s  {sps*B*T_mel/1e3:.1f}k "
          f"mel-frames/s  {tf:.2f} TFLOP/s"
          + (f"  train_mfu={tf*1e12/peak:.3f} (bf16-peak roofline)"
             if peak else "")
          + f"  loss={loss:.3f}")


def bench_vocoder(args):
    from tts_arabic_tpu.eval.flops import chip_peak_flops
    from tts_arabic_tpu.train.vocoder import (init_vocoder_state,
                                              make_hifigan_train_step)
    from tts_arabic_tpu.vocoder.discriminators import (
        MultiPeriodDiscriminator, MultiScaleDiscriminator)
    from tts_arabic_tpu.vocoder.hifigan import Generator, HiFiGANConfig

    B = 16 if args.batch == 10 else args.batch  # recipe default, overridable
    S = args.segment
    gen = Generator(HiFiGANConfig(
        upsample_initial_channel=args.gen_channels))
    mpd = MultiPeriodDiscriminator(width=args.disc_width)
    msd = MultiScaleDiscriminator(width=args.disc_width)
    import optax
    tx_g = optax.adamw(2e-4, b1=0.8, b2=0.99)
    tx_d = optax.adamw(2e-4, b1=0.8, b2=0.99)
    state = init_vocoder_state(gen, mpd, msd, tx_g, tx_d, S)
    step_fn = make_hifigan_train_step(gen, mpd, msd, tx_g, tx_d)
    jit_step = jax.jit(step_fn, donate_argnums=0)

    rng = np.random.default_rng(0)
    t = np.arange(S) / 22050.0
    wave = (0.4 * np.sin(2 * np.pi * 120.0 * t)[None]
            + 0.05 * rng.standard_normal((B, S))).astype(np.float32)
    batch = {"wave": jnp.asarray(wave)}
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    compiled = jax.jit(step_fn).lower(state, batch, key).compile()
    cost = compiled.cost_analysis() or {}
    step_flops = float(cost.get("flops", 0.0))
    print(f"compile {time.perf_counter()-t0:.0f}s; XLA cost model: "
          f"{step_flops/1e12:.2f} TFLOP/step", file=sys.stderr)

    state, meta = jit_step(state, batch, key)
    float(meta["loss"])
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, meta = jit_step(state, batch, key)
    loss = float(meta["loss"])  # chain-blocks the whole run
    dt = time.perf_counter() - t0
    sps = args.steps / dt
    peak = chip_peak_flops(dtype="bf16")
    tf = step_flops * sps / 1e12
    audio_sps = sps * B * S / 22050.0
    print(f"vocoder B={B} S={S}: {sps:.2f} steps/s  "
          f"{audio_sps:.1f} audio-sec/s trained  {tf:.2f} TFLOP/s"
          + (f"  train_mfu={tf*1e12/peak:.3f}" if peak else "")
          + f"  loss={loss:.3f}")


if __name__ == "__main__":
    main()
