"""Multi-process DP worker: one process of a 2-process x 4-CPU-device mesh.

Run as `python mp_worker.py <process_id> <num_processes> <port>`; prints
`loss=<float>` after one data-parallel FastPitch train step over the GLOBAL
mesh. The parent test (`test_parallel_multiprocess.py`) runs the identical
step single-process on 8 devices and asserts the losses match — proving the
DCN-shaped path (`jax.distributed` + make_multiprocess_mesh +
`jax.make_array_from_process_local_data`) computes the same global step.
"""
import sys


def build_step_inputs(n_devices_total: int):
    """Deterministic (model, state, step_fn, global batch) shared by the
    multi-process workers and the single-process reference."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tts_arabic_tpu.models.fastpitch import FastPitch, FastPitchConfig
    from tts_arabic_tpu.train.steps import (TrainState,
                                            make_fastpitch_train_step,
                                            make_optimizer)

    config = FastPitchConfig(
        d_model=64, enc_n_layers=1, dec_n_layers=1, enc_d_head=16,
        dec_d_head=16, enc_filter_size=128, dec_filter_size=128,
        dur_filter_size=32, pitch_filter_size=32, energy_filter_size=32,
        attn_channels=16)
    model = FastPitch(config)

    B, T_txt, T_mel = n_devices_total, 12, 96
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, config.n_symbols, (B, T_txt)).astype(np.int32)
    batch = {
        "tokens": tokens,
        "token_lens": np.full((B,), T_txt, np.int32),
        "mel_tgt": rng.standard_normal((B, T_mel, 80)).astype(np.float32),
        "mel_lens": np.full((B,), T_mel, np.int32),
        "pitch_dense": rng.standard_normal((B, 1, T_mel)).astype(np.float32),
        "energy_dense": np.abs(rng.standard_normal((B, T_mel))
                               ).astype(np.float32),
        "attn_prior": np.full((B, T_mel, T_txt), 1.0 / T_txt, np.float32),
    }
    durs0 = np.full((B, T_txt), T_mel / T_txt, np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(tokens[:1]),
        jnp.asarray(batch["token_lens"][:1]),
        jnp.asarray(batch["mel_tgt"][:1]), jnp.asarray(batch["mel_lens"][:1]),
        jnp.asarray(batch["pitch_dense"][:1]),
        jnp.asarray(batch["energy_dense"][:1]),
        jnp.asarray(batch["attn_prior"][:1]), jnp.asarray(durs0[:1]),
        deterministic=True, method=FastPitch.forward_train)
    tx = make_optimizer(1e-4)
    state = TrainState(params=variables["params"],
                       opt_state=tx.init(variables["params"]),
                       step=jnp.asarray(0))
    step_fn = make_fastpitch_train_step(model, tx, None, None)
    return state, step_fn, batch


def main():
    process_id, num_processes, port = (int(sys.argv[1]), int(sys.argv[2]),
                                       sys.argv[3])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from tts_arabic_tpu.parallel import (data_parallel_jit,
                                         init_multiprocess,
                                         make_multiprocess_mesh,
                                         process_local_rows, replicate,
                                         shard_batch_from_process_local)

    init_multiprocess(f"127.0.0.1:{port}", num_processes, process_id)
    mesh = make_multiprocess_mesh()
    n_global = mesh.devices.size
    assert jax.process_count() == num_processes

    state, step_fn, batch = build_step_inputs(n_global)
    rows = process_local_rows(n_global, mesh)
    local = {k: v[rows] for k, v in batch.items()}

    dp_step = data_parallel_jit(
        lambda s, b: step_fn(s, b, jax.random.PRNGKey(0)), mesh)
    state = replicate(state, mesh)
    gbatch = shard_batch_from_process_local(local, mesh)
    state, meta = dp_step(state, gbatch)
    print(f"loss={float(meta['loss']):.6f} devices={n_global} "
          f"procs={jax.process_count()}", flush=True)


if __name__ == "__main__":
    main()
