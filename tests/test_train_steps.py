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
