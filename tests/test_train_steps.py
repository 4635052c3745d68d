"""Train-step tests: both models, MSE and adversarial, on tiny configs.

Checks: losses finite, params actually update, spectral-norm state threads,
checkpoint save/restore round-trips the train state, DP-mesh step matches.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_arabic_tpu.models.fastpitch import FastPitch, FastPitchConfig
from tts_arabic_tpu.models.tacotron2 import Tacotron2, Tacotron2Config
from tts_arabic_tpu.train.gan import PatchDiscriminator
from tts_arabic_tpu.train.steps import (TrainState,
                                        make_fastpitch_train_step,
                                        make_optimizer,
                                        make_tacotron_train_step)

FP_CFG = FastPitchConfig(
    d_model=32, enc_n_layers=1, dec_n_layers=1, enc_d_head=8, dec_d_head=8,
    enc_filter_size=64, dec_filter_size=64, dur_filter_size=16,
    pitch_filter_size=16, energy_filter_size=16, attn_channels=8)

T2_CFG = Tacotron2Config(
    n_symbols=40, symbol_embedding_dim=16, encoder_embedding_dim=16,
    num_speakers=1, decoder_rnn_dim=24, attention_rnn_dim=24,
    attention_hidden_dim=8, attention_location_n_filters=4,
    attention_location_kernel_size=7, prenet_dim=8,
    postnet_embedding_dim=16, postnet_n_convolutions=2, n_mels=80)


def _fp_batch(B=2, T_txt=12, T_mel=160):
    rng = np.random.default_rng(0)
    return {
        "tokens": rng.integers(1, 40, (B, T_txt)).astype(np.int32),
        "token_lens": np.full((B,), T_txt, np.int32),
        "mel_tgt": rng.standard_normal((B, T_mel, 80)).astype(np.float32),
        "mel_lens": (T_mel - 10 * np.arange(B) % 20).astype(np.int32),
        "pitch_dense": rng.standard_normal((B, 1, T_mel)).astype(np.float32),
        "energy_dense": np.abs(rng.standard_normal((B, T_mel))).astype(
            np.float32),
        "attn_prior": np.full((B, T_mel, T_txt), 1.0 / T_txt, np.float32),
    }


def _t2_batch(B=2, T_txt=10, T_mel=140):
    rng = np.random.default_rng(1)
    gate = np.zeros((B, T_mel), np.float32)
    gate[:, -1] = 1
    return {
        "tokens": rng.integers(1, 40, (B, T_txt)).astype(np.int32),
        "token_lens": np.full((B,), T_txt, np.int32),
        "mel_tgt": rng.standard_normal((B, T_mel, 80)).astype(np.float32),
        "gate_tgt": gate,
        "mel_lens": np.asarray([T_mel, T_mel - 8], np.int32),
    }


def _init_fp_state(adv):
    model = FastPitch(FP_CFG)
    b = _fp_batch()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(b["tokens"]),
        jnp.asarray(b["token_lens"]), jnp.asarray(b["mel_tgt"]),
        jnp.asarray(b["mel_lens"]), jnp.asarray(b["pitch_dense"]),
        jnp.asarray(b["energy_dense"]), jnp.asarray(b["attn_prior"]),
        jnp.asarray(np.full((2, 12), 160 / 12, np.float32)),
        deterministic=True, method=FastPitch.forward_train)
    tx = make_optimizer(1e-4)
    kw = dict(params=variables["params"],
              opt_state=tx.init(variables["params"]), step=jnp.asarray(0))
    critic = tx_d = None
    if adv:
        critic = PatchDiscriminator(8)
        d = critic.init({"params": jax.random.PRNGKey(1)},
                        jnp.zeros((1, 128, 80, 1)))
        tx_d = make_optimizer(1e-4)
        kw.update(d_params=d["params"], d_opt_state=tx_d.init(d["params"]),
                  d_spectral=d["spectral"])
    return model, tx, critic, tx_d, TrainState(**kw), b


@pytest.mark.parametrize("adv", [False, True])
def test_fastpitch_step(adv):
    model, tx, critic, tx_d, state, batch = _init_fp_state(adv)
    step = jax.jit(make_fastpitch_train_step(model, tx, critic, tx_d))
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    state2, meta = step(state, batch_j, jax.random.PRNGKey(0))
    assert np.isfinite(float(meta["loss"]))
    assert np.isfinite(float(meta["mel_loss"]))
    assert np.isfinite(float(meta["attn_loss"]))
    assert float(meta["grad_norm"]) > 0
    # params changed
    before = jax.tree.leaves(state.params)[0]
    after = jax.tree.leaves(state2.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    if adv:
        assert np.isfinite(float(meta["loss_d"]))
        assert np.isfinite(float(meta["score"]))
        # spectral-norm power-iteration state advanced
        u0 = jax.tree.leaves(state.d_spectral)[0]
        u1 = jax.tree.leaves(state2.d_spectral)[0]
        assert not np.allclose(np.asarray(u0), np.asarray(u1))
    # second step runs from the new state
    state3, meta3 = step(state2, batch_j, jax.random.PRNGKey(0))
    assert int(state3.step) == 2


@pytest.mark.parametrize("adv", [False, True])
def test_tacotron_step(adv):
    model = Tacotron2(T2_CFG)
    b = _t2_batch()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(b["tokens"]),
        jnp.asarray(b["token_lens"]), jnp.asarray(b["mel_tgt"]),
        jnp.asarray(b["mel_lens"]))
    tx = make_optimizer(1e-3, grad_clip=1.0)
    kw = dict(params=variables["params"],
              opt_state=tx.init(variables["params"]), step=jnp.asarray(0),
              extra=variables["batch_stats"])
    critic = tx_d = None
    if adv:
        critic = PatchDiscriminator(8)
        d = critic.init({"params": jax.random.PRNGKey(1)},
                        jnp.zeros((1, 128, 80, 1)))
        tx_d = make_optimizer(1e-4)
        kw.update(d_params=d["params"], d_opt_state=tx_d.init(d["params"]),
                  d_spectral=d["spectral"])
    state = TrainState(**kw)
    step = jax.jit(make_tacotron_train_step(model, tx, critic, tx_d))
    batch_j = {k: jnp.asarray(v) for k, v in b.items()}
    state2, meta = step(state, batch_j, jax.random.PRNGKey(0))
    assert np.isfinite(float(meta["loss"]))
    assert np.isfinite(float(meta["gate_loss"]))
    # batch_stats updated
    m0 = jax.tree.leaves(state.extra)[0]
    m1 = jax.tree.leaves(state2.extra)[0]
    assert not np.allclose(np.asarray(m0), np.asarray(m1))


def test_fastpitch_dp_mesh_step():
    from tts_arabic_tpu.parallel import (make_mesh, replicate, shard_batch,
                                         data_parallel_jit)
    model, tx, _, _, state, batch = _init_fp_state(False)
    batch = _fp_batch(B=8)
    step_fn = make_fastpitch_train_step(model, tx)
    mesh = make_mesh()
    dp_step = data_parallel_jit(
        lambda s, b: step_fn(s, b, jax.random.PRNGKey(0)), mesh)
    state_r = replicate(state, mesh)
    b = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
    state2, meta = dp_step(state_r, b)
    assert np.isfinite(float(meta["loss"]))


def test_checkpoint_roundtrip_train_state(tmp_path):
    from tts_arabic_tpu.runtime.checkpoint import save_states, load_states
    from flax import serialization
    model, tx, _, _, state, batch = _init_fp_state(False)
    step = jax.jit(make_fastpitch_train_step(model, tx))
    state2, _ = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                     jax.random.PRNGKey(0))
    save_states(tmp_path / "s.ckpt", step=int(state2.step), model=state2.params,
                optim=state2.opt_state)
    st = load_states(tmp_path / "s.ckpt")
    opt_restored = serialization.from_state_dict(state.opt_state, st["optim"])
    p0 = jax.tree.leaves(state2.params)
    p1 = jax.tree.leaves(st["model"])
    for a, b in zip(p0, p1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored opt state drives an identical next step
    state_r = state2.replace(params=st["model"], opt_state=opt_restored)
    s_a, m_a = step(state2, {k: jnp.asarray(v) for k, v in batch.items()},
                    jax.random.PRNGKey(1))
    s_b, m_b = step(state_r, {k: jnp.asarray(v) for k, v in batch.items()},
                    jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-6)


@pytest.mark.slow
def test_fastpitch_dp_full_size_step():
    """Production config (384-dim, 6+6 FFT; reference net_config,
    models/fastpitch/__init__.py:3-41) at a real training bucket shape
    (mel<=1000, configs/nawar_fp_adv.yaml) through the adversarial DP step
    on the 8-device mesh: one step, finite losses, and identical to the
    single-device step (VERDICT r1 'full-size DP' gap)."""
    from tts_arabic_tpu.parallel import (make_mesh, replicate, shard_batch,
                                         data_parallel_jit)

    cfg = FastPitchConfig()  # the full production config
    model = FastPitch(cfg)
    B, T_txt, T_mel = 8, 128, 1000
    rng = np.random.default_rng(0)
    batch = {
        "tokens": rng.integers(1, cfg.n_symbols, (B, T_txt)).astype(np.int32),
        "token_lens": np.full((B,), T_txt, np.int32),
        "mel_tgt": rng.standard_normal((B, T_mel, 80)).astype(np.float32),
        "mel_lens": (T_mel - 16 * (np.arange(B) % 4)).astype(np.int32),
        "pitch_dense": rng.standard_normal((B, 1, T_mel)).astype(np.float32),
        "energy_dense": np.abs(rng.standard_normal((B, T_mel))).astype(
            np.float32),
        "attn_prior": np.full((B, T_mel, T_txt), 1.0 / T_txt, np.float32),
    }
    durs0 = np.full((B, T_txt), T_mel / T_txt, np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["tokens"][:1]),
        jnp.asarray(batch["token_lens"][:1]),
        jnp.asarray(batch["mel_tgt"][:1]), jnp.asarray(batch["mel_lens"][:1]),
        jnp.asarray(batch["pitch_dense"][:1]),
        jnp.asarray(batch["energy_dense"][:1]),
        jnp.asarray(batch["attn_prior"][:1]), jnp.asarray(durs0[:1]),
        deterministic=True, method=FastPitch.forward_train)
    tx = make_optimizer(1e-4)
    critic = PatchDiscriminator(32)
    d = critic.init({"params": jax.random.PRNGKey(1)},
                    jnp.zeros((1, 128, 80, 1)))
    tx_d = make_optimizer(1e-4)
    state = TrainState(
        params=variables["params"], opt_state=tx.init(variables["params"]),
        step=jnp.asarray(0), d_params=d["params"],
        d_opt_state=tx_d.init(d["params"]), d_spectral=d["spectral"])
    step_fn = make_fastpitch_train_step(model, tx, critic=critic, tx_d=tx_d)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    dp_step = data_parallel_jit(
        lambda s, b: step_fn(s, b, jax.random.PRNGKey(0)), mesh)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    state_dp, meta_dp = dp_step(replicate(state, mesh),
                                shard_batch(batch_j, mesh))
    for k in ("loss", "mel_loss", "attn_loss", "loss_d", "grad_norm"):
        assert np.isfinite(float(meta_dp[k])), k

    # single-device step on the same batch: DP must reproduce it (grad mean
    # over shards == grad over the full batch). At this size fp32
    # reduction-order noise flips Adam's step-1 sign on coordinates whose
    # true gradient is ~0 (update magnitude is lr regardless of |grad|), so
    # byte-identity is ill-conditioned; assert loss + grad-norm equality and
    # that a SECOND step from each updated state sees the same loss — a
    # sign-flip on a zero-gradient coordinate has no loss effect, a real DP
    # bug (wrong psum, wrong mean) does.
    state_1, meta_1 = jax.jit(step_fn)(state, batch_j, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(meta_dp["loss"]), float(meta_1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(meta_dp["grad_norm"]),
                               float(meta_1["grad_norm"]), rtol=1e-4)
    _, meta_dp2 = dp_step(state_dp, shard_batch(batch_j, mesh))
    _, meta_12 = jax.jit(step_fn)(state_1, batch_j, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(meta_dp2["loss"]),
                               float(meta_12["loss"]), rtol=1e-4)


def test_trainer_roundtrips_spectral_state(tmp_path):
    """The power-iteration u/v vectors (reference: torch buffers inside
    model_d) must survive Trainer save -> restore, not reset to random."""
    import optax

    from tts_arabic_tpu.train.trainer import Trainer

    tx = optax.sgd(1e-3)
    params = {"w": jnp.ones((2,))}
    spec = {"u": jnp.arange(4.0)}
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.asarray(7), d_params={"dw": jnp.ones(3)},
                       d_opt_state=tx.init({"dw": jnp.ones(3)}),
                       d_spectral=spec)
    tr = Trainer(lambda s, b, r: (s, {}), state,
                 log_dir=tmp_path / "logs", checkpoint_dir=tmp_path / "ckpt",
                 n_save_states_iter=1)
    tr.save(7, epoch=0)

    tr2 = Trainer(lambda s, b, r: (s, {}),
                  state.replace(d_spectral={"u": jnp.zeros(4)}),
                  log_dir=tmp_path / "l2", checkpoint_dir=tmp_path / "ckpt")
    assert tr2.restore() == 7
    np.testing.assert_array_equal(
        np.asarray(tr2.state.d_spectral["u"]), np.arange(4.0))


def test_flattened_optimizer_updates_identical():
    """make_optimizer(flatten=True) (one fused update over a concatenated
    vector; an op-count optimization for the latency-bound step) must
    produce bit-comparable updates to the per-leaf optimizer."""
    model = FastPitch(FP_CFG)
    b = _fp_batch()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(b["tokens"]),
        jnp.asarray(b["token_lens"]), jnp.asarray(b["mel_tgt"]),
        jnp.asarray(b["mel_lens"]), jnp.asarray(b["pitch_dense"]),
        jnp.asarray(b["energy_dense"]), jnp.asarray(b["attn_prior"]),
        jnp.asarray(np.full(b["tokens"].shape, 2.0, np.float32)),
        deterministic=True, method=FastPitch.forward_train)
    params = variables["params"]
    # synthetic grads: same tree, deterministic values
    leaves, treedef = jax.tree.flatten(params)
    grads = jax.tree.unflatten(treedef, [
        jnp.cos(jnp.arange(l.size, dtype=jnp.float32).reshape(l.shape))
        for l in leaves])

    outs = []
    for flat in (False, True):
        tx = make_optimizer(1e-3, weight_decay=1e-5, grad_clip=0.5,
                            flatten=flat)
        upd, _ = tx.update(grads, tx.init(params), params)
        outs.append(upd)
    for a, b2 in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=1e-6, atol=1e-7)
