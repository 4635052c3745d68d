"""Profile the FastPitch adversarial train step on TPU.

Captures a ``jax.profiler`` trace of steady-state training steps at the
production bucket shape and prints the per-op device-time table (same
aggregation as tools/profile_wave.py). Inputs are perturbed every step so
the axon early-return caveat (docs/PERF.md) cannot skew the trace.

Usage:  python tools/profile_train.py [--out /tmp/train_trace] [--steps 10]
"""
import argparse
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

from profile_wave import aggregate_trace  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/train_trace")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--frames", type=int, default=1000)
    args = ap.parse_args()

    from tts_arabic_tpu.runtime.cache import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from bench_train import make_batch
    from tts_arabic_tpu.models.fastpitch import FastPitch, FastPitchConfig
    from tts_arabic_tpu.train.gan import PatchDiscriminator
    from tts_arabic_tpu.train.steps import (TrainState, make_optimizer,
                                            make_fastpitch_train_step)

    config = FastPitchConfig()
    model = FastPitch(config)
    B, T_txt, T_mel = args.batch, 160, args.frames
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

    tx = make_optimizer(1e-4)
    critic = PatchDiscriminator(32)
    d_vars = critic.init({"params": jax.random.PRNGKey(1)},
                         jnp.zeros((1, 128, 80, 1)))
    tx_d = make_optimizer(1e-4)
    state = TrainState(
        params=variables["params"],
        opt_state=tx.init(variables["params"]), step=jnp.asarray(0),
        d_params=d_vars["params"], d_opt_state=tx_d.init(d_vars["params"]),
        d_spectral=d_vars["spectral"])
    step_fn = make_fastpitch_train_step(model, tx, critic=critic, tx_d=tx_d)
    jit_step = jax.jit(lambda s, b, r: step_fn(s, b, r), donate_argnums=0)

    db = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(0)

    def run(state, n):
        for i in range(n):
            state, meta = jit_step(state, db, jax.random.fold_in(key, i))
        float(meta["loss"])
        return state

    state = run(state, 2)  # warmup
    t0 = time.perf_counter()
    state = run(state, args.steps)
    steady = time.perf_counter() - t0

    out = pathlib.Path(args.out)
    with jax.profiler.trace(str(out)):
        state = run(state, args.steps)

    per_op, long_names, total = aggregate_trace(out)
    print(f"steady: {steady/args.steps*1e3:.1f} ms/step "
          f"({args.steps/steady:.1f} steps/s) at B={B} T_mel={T_mel}")
    print(f"device op time total: {total/1e3:.2f} ms over {args.steps} "
          f"traced steps ({total/1e3/args.steps:.2f} ms/step)\n")
    print(f"{'%':>6} {'ms':>9}  op")
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    for name, dur in rows[: args.top]:
        ln = long_names.get(name, "")
        if ln and ln != name:
            ln = "  | " + ln[:140]
        print(f"{100*dur/total:6.2f} {dur/1e3:9.3f}  {name}{ln}")
    rest = sum(d for _, d in rows[args.top:])
    print(f"{100*rest/total:6.2f} {rest/1e3:9.3f}  (other "
          f"{max(0, len(rows)-args.top)} ops)")


if __name__ == "__main__":
    main()
