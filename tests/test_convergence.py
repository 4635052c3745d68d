"""Overfit-one-batch convergence tests: the training steps must actually
drive their losses down, not just produce finite numbers (complements the
smoke checks in test_train_steps.py). The reference has no equivalent —
its only training validation is a human watching TensorBoard (SURVEY.md §4).
"""
import numpy as np
import pytest

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


# --- multi-epoch convergence on a synthetic corpus (not one batch) ----------
# Catches what overfit-one-batch can't: a mis-scaled loss term or schedule
# bug that still memorizes a single batch but doesn't fit a (tiny) corpus.

def _build_corpus(root, n=6):
    import wave as wave_mod
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    phons = ["b a m a k a", "t u k a m a n i", "s a l a m u n",
             "k a t a b a", "m i n h u m", "d a r a s a t i"][:n]
    rng = np.random.default_rng(0)
    lines = []
    for i, phon in enumerate(phons):
        ns = 11025 + 2048 * i
        t = np.arange(ns) / 22050.0
        sig = (0.3 * np.sin(2 * np.pi * (120 + 15 * i) * t)
               + 0.04 * np.sin(2 * np.pi * (400 + 40 * i) * t)
               + 0.02 * rng.standard_normal(ns)).astype(np.float32)
        pcm = (np.clip(sig, -1, 1) * 32767).astype("<i2")
        with wave_mod.open(str(wav_dir / f"s{i}.wav"), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(22050)
            f.writeframes(pcm.tobytes())
        lines.append(f'"s{i}.wav" "{phon}"')
    (root / "train.txt").write_text("\n".join(lines) + "\n")
    return root / "train.txt", wav_dir


def _epoch_curve(step, state, batches, n_epochs, key_loss):
    """Run n_epochs over fixed batches, return per-epoch mean losses."""
    curve = []
    i = 0
    for _ in range(n_epochs):
        vals = []
        for b in batches:
            state, meta = step(state, b, jax.random.PRNGKey(i))
            vals.append(float(meta[key_loss]))
            i += 1
        curve.append(float(np.mean(vals)))
    return state, np.asarray(curve)


def _assert_converging(curve, ratio):
    assert np.isfinite(curve).all()
    head = curve[:3].mean()
    tail = curve[-3:].mean()
    assert tail < ratio * head, (head, tail, curve)
    # monotone-ish: few epoch-over-epoch increases, none of them large
    diffs = np.diff(curve)
    assert (diffs > 0).mean() < 0.35, curve
    assert diffs.max() < 0.25 * head, curve


def _mean_alignment_diag(eval_step, state, batches):
    """Mean alignment-health scalars over `batches` via a jitted eval step
    (the same `attn_*` keys the trainers log per validation epoch)."""
    ev = jax.jit(eval_step)
    keys = ("attn_diag_mass", "attn_peak_drift", "attn_coverage")
    vals = {k: [] for k in keys}
    for b in batches:
        meta, _ = ev(state, b, jax.random.PRNGKey(0))
        for k in keys:
            vals[k].append(float(meta[k]))
    return {k: float(np.mean(v)) for k, v in vals.items()}


# healthy-alignment gate for the FastPitch ConvAttention+prior stack
# (measured healthy: diag 0.95, drift 0.11, coverage 0.69-1.0; deliberately
# broken attention scores diag 0.57 / coverage 0.21 — see the negative test)
def _assert_fp_alignment_healthy(diag):
    assert diag["attn_diag_mass"] >= 0.75, diag
    assert diag["attn_peak_drift"] <= 0.5, diag
    assert diag["attn_coverage"] >= 0.5, diag


def _fp_corpus_batches(tmp_path):
    from tts_arabic_tpu.data import ArabDatasetFastPitch, collate_fastpitch

    txt, wavs = _build_corpus(tmp_path)
    ds = ArabDatasetFastPitch(txt, wavs, cache=True)
    items = [ds[i] for i in range(len(ds))]
    return [
        {k: jnp.asarray(v)
         for k, v in collate_fastpitch(items[k: k + 2]).items()}
        for k in range(0, len(items), 2)
    ]


def test_fastpitch_multi_epoch_corpus_convergence(tmp_path):
    from tts_arabic_tpu.train.steps import make_fastpitch_eval_step

    batches = _fp_corpus_batches(tmp_path)
    model, _, _, _, state0, _ = _init_fp_state(adv=False)
    tx = make_optimizer(2e-3)
    state = TrainState(params=state0.params, opt_state=tx.init(state0.params),
                       step=jnp.asarray(0))
    step = jax.jit(make_fastpitch_train_step(model, tx, None, None))
    state, curve = _epoch_curve(step, state, batches, 25, "mel_loss")
    _assert_converging(curve, ratio=0.6)
    # alignment never degenerates while the loss converges (loss curves
    # alone cannot see attention collapse)
    diag = _mean_alignment_diag(make_fastpitch_eval_step(model), state,
                                batches)
    _assert_fp_alignment_healthy(diag)


def test_fastpitch_alignment_gate_detects_broken_attention(tmp_path):
    """Negative control: deliberately wreck ConvAttention (projection
    weights scaled so the L2 scores drown the beta-binomial prior) and the
    alignment gate must trip — proving the convergence tests would fail on
    real attention collapse, which their loss assertions cannot see."""
    import copy

    from tts_arabic_tpu.train.steps import make_fastpitch_eval_step

    batches = _fp_corpus_batches(tmp_path)
    model, _, _, _, state0, _ = _init_fp_state(adv=False)
    diag = _mean_alignment_diag(make_fastpitch_eval_step(model), state0,
                                batches)
    _assert_fp_alignment_healthy(diag)  # healthy init passes

    params = copy.deepcopy(jax.device_get(state0.params))
    for name in ("key_conv2", "query_conv3"):
        params["attention"][name]["kernel"] = (
            params["attention"][name]["kernel"] * 300.0)
    broken = state0.replace(params=jax.tree.map(jnp.asarray, params))
    diag_b = _mean_alignment_diag(make_fastpitch_eval_step(model), broken,
                                  batches)
    with pytest.raises(AssertionError):
        _assert_fp_alignment_healthy(diag_b)
    # and specifically: collapse is visible in both mass and coverage
    assert diag_b["attn_diag_mass"] < 0.7
    assert diag_b["attn_coverage"] < 0.35


def _t2_corpus_state(tmp_path):
    from tts_arabic_tpu.data import ArabDataset, collate_tacotron

    txt, wavs = _build_corpus(tmp_path)
    ds = ArabDataset(txt, wavs, cache=True)
    items = [ds[i] for i in range(len(ds))]
    batches = [
        {k: jnp.asarray(v)
         for k, v in collate_tacotron(items[k: k + 2]).items()}
        for k in range(0, len(items), 2)
    ]
    model = Tacotron2(T2_CFG)
    b0 = batches[0]
    variables = model.init(jax.random.PRNGKey(0), b0["tokens"],
                           b0["token_lens"], b0["mel_tgt"], b0["mel_lens"],
                           train=False)
    tx = make_optimizer(2e-3)
    state = TrainState(params=variables["params"],
                       opt_state=tx.init(variables["params"]),
                       step=jnp.asarray(0),
                       extra=variables.get("batch_stats"))
    return model, tx, state, batches


def test_tacotron_multi_epoch_corpus_convergence(tmp_path):
    from tts_arabic_tpu.train.steps import make_tacotron_eval_step

    model, tx, state, batches = _t2_corpus_state(tmp_path)
    step = jax.jit(make_tacotron_train_step(model, tx, None, None))
    state, curve = _epoch_curve(step, state, batches, 25, "loss")
    _assert_converging(curve, ratio=0.7)
    # location-sensitive attention must keep moving across tokens while the
    # loss converges: collapsed attention (one token absorbs every frame)
    # scores coverage ~0.11 on this corpus — see the negative control
    diag = _mean_alignment_diag(make_tacotron_eval_step(model), state,
                                batches)
    assert diag["attn_coverage"] >= 0.2, diag


def test_tacotron_alignment_gate_detects_collapse(tmp_path):
    """Negative control: zero the location-sensitive attention score head
    (`v`) — attention goes uniform, its argmax freezes on one token — and
    the coverage gate must trip."""
    import copy

    from tts_arabic_tpu.train.steps import make_tacotron_eval_step

    model, _, state, batches = _t2_corpus_state(tmp_path)
    params = copy.deepcopy(jax.device_get(state.params))
    params["v"]["kernel"] = params["v"]["kernel"] * 0.0
    broken = state.replace(params=jax.tree.map(jnp.asarray, params))
    diag = _mean_alignment_diag(make_tacotron_eval_step(model), broken,
                                batches)
    assert diag["attn_coverage"] < 0.2, diag
