"""Overfit-one-batch convergence tests: the training steps must actually
drive their losses down, not just produce finite numbers (complements the
smoke checks in test_train_steps.py). The reference has no equivalent —
its only training validation is a human watching TensorBoard (SURVEY.md §4).
"""
import numpy as np

import jax

from test_train_steps import (_fp_batch, _init_fp_state, _t2_batch, FP_CFG,
                              T2_CFG)
from tts_arabic_tpu.models.fastpitch import FastPitch
from tts_arabic_tpu.models.tacotron2 import Tacotron2
from tts_arabic_tpu.train.steps import (TrainState,
                                        make_fastpitch_train_step,
                                        make_optimizer,
                                        make_tacotron_train_step)
import jax.numpy as jnp


def _structured_mel(B, T, n_mels=80):
    """Smooth, learnable mel target (pure noise has 'predict the mean' as
    its optimum, which says nothing about the gradient path)."""
    t = np.arange(T)[None, :, None]
    f = np.arange(n_mels)[None, None, :]
    b = np.arange(B)[:, None, None]
    return (np.sin(0.13 * t + 0.5 * b) * np.cos(0.21 * f)
            + 0.3 * np.sin(0.031 * t * (1 + 0.1 * b))).astype(np.float32)


def test_fastpitch_overfits_one_batch():
    model, _, _, _, state0, batch = _init_fp_state(adv=False)
    tx = make_optimizer(2e-3)  # overfit-friendly lr
    state = TrainState(params=state0.params,
                       opt_state=tx.init(state0.params),
                       step=jnp.asarray(0))
    step = jax.jit(make_fastpitch_train_step(model, tx, None, None))
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    first = last = None
    for i in range(40):
        state, meta = step(state, batch_j, jax.random.PRNGKey(i))
        if first is None:
            first = float(meta["mel_loss"])
        last = float(meta["mel_loss"])
    assert np.isfinite(last)
    assert last < 0.6 * first, (first, last)


def test_tacotron_overfits_one_batch():
    model = Tacotron2(T2_CFG)
    b = _t2_batch()
    b["mel_tgt"] = _structured_mel(*b["mel_tgt"].shape[:2],
                                   b["mel_tgt"].shape[2])
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(b["tokens"]),
        jnp.asarray(b["token_lens"]), jnp.asarray(b["mel_tgt"]),
        jnp.asarray(b["mel_lens"]), train=False)
    tx = make_optimizer(2e-3)
    state = TrainState(params=variables["params"],
                       opt_state=tx.init(variables["params"]),
                       step=jnp.asarray(0),
                       extra=variables.get("batch_stats"))
    step = jax.jit(make_tacotron_train_step(model, tx, None, None))
    batch_j = {k: jnp.asarray(v) for k, v in b.items()}
    first = last = None
    # total loss: the gate converges first, mel follows after ~60 steps —
    # 40 steps halve the total (mel+postnet+gate) reliably
    for i in range(40):
        state, meta = step(state, batch_j, jax.random.PRNGKey(i))
        if first is None:
            first = float(meta["loss"])
        last = float(meta["loss"])
    assert np.isfinite(last)
    assert last < 0.6 * first, (first, last)
