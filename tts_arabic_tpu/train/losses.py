"""Training losses for the acoustic models.

JAX equivalents of the reference losses:
- FastPitch composite loss (`models/fastpitch/fastpitch/loss_function.py:
  45-123`): masked mel MSE, log-duration MSE, pitch MSE, energy MSE x0.1,
  attention CTC loss
- Attention CTC loss / binarization KL (`attn_loss_function.py:20-71`)
- Tacotron2 loss (`models/tacotron2/loss.py:5-33`)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..models.layers import sequence_mask
from ..ops.ctc import ctc_loss

_NEG_INF = -1e9


def attention_ctc_loss(attn_logprob, token_lens, mel_lens,
                       blank_logprob: float = -1.0):
    """Forces the soft alignment to monotonically cover all text positions
    (reference `AttentionCTCLoss`): rows of the (prior-augmented) attention
    log-probs are treated as emissions over text positions plus a blank at
    index 0, with the target sequence 1..key_len.

    attn_logprob: [B, T_mel, T_txt]; returns scalar (mean over batch of
    per-sequence loss / target length, matching torch CTCLoss 'mean').
    """
    B, T_mel, T_txt = attn_logprob.shape
    logits = jnp.pad(attn_logprob, ((0, 0), (0, 0), (1, 0)),
                     constant_values=blank_logprob)
    key_ids = jnp.arange(T_txt + 1)
    valid_keys = key_ids[None, None, :] <= token_lens[:, None, None]
    logits = jnp.where(valid_keys, logits, _NEG_INF)
    logits = jax.nn.log_softmax(logits, axis=-1)

    labels = jnp.broadcast_to(key_ids[1:][None, :], (B, T_txt))
    label_paddings = (key_ids[1:][None, :] > token_lens[:, None]).astype(
        jnp.float32)
    logit_paddings = (jnp.arange(T_mel)[None, :] >=
                      mel_lens[:, None]).astype(jnp.float32)

    # ops/ctc.py: optax-equivalent recursion (differential-tested) with
    # scan unroll + no stacked per-step alphas — the T_mel-step sequential
    # scan is loop-latency-bound in the train step (docs/PERF.md)
    per_seq = ctc_loss(logits, logit_paddings, labels, label_paddings,
                       blank_id=0)
    per_seq = jnp.where(jnp.isfinite(per_seq), per_seq, 0.0)  # zero_infinity
    return jnp.mean(per_seq / jnp.maximum(token_lens, 1))


def attention_binarization_loss(attn_hard, attn_soft, eps: float = 1e-12):
    """-log soft-attention mass under the hard alignment (reference
    `AttentionBinarizationLoss`, attn_loss_function.py:64-71)."""
    log_sum = jnp.sum(
        jnp.where(attn_hard == 1.0,
                  jnp.log(jnp.clip(attn_soft, min=eps)), 0.0))
    return -log_sum / jnp.maximum(jnp.sum(attn_hard), 1.0)


def fastpitch_loss(out: dict, batch: dict, *, mel_scale=1.0, dur_scale=1.0,
                   pitch_scale=1.0, attn_scale=1.0, energy_scale=0.1):
    """Composite FastPitch loss. `out` is FastPitch.forward_train's dict;
    `batch` provides mel_tgt [B, T_mel, n_mel], token_lens, mel_lens.
    Returns (loss, meta)."""
    token_lens = batch["token_lens"]
    mel_tgt = batch["mel_tgt"]

    dur_mask = sequence_mask(token_lens, out["dur_tgt"].shape[1]).astype(
        jnp.float32)
    n_tok = jnp.sum(dur_mask)

    log_dur_tgt = jnp.log(out["dur_tgt"] + 1.0)
    dur_loss = jnp.sum(
        (out["log_dur_pred"] - log_dur_tgt) ** 2 * dur_mask) / n_tok

    # elementwise nonzero mask, matching reference loss_function.py:80-83
    mel_mask = (mel_tgt != 0.0).astype(jnp.float32)
    mel_loss = jnp.sum(
        (out["mel_out"] - mel_tgt) ** 2 * mel_mask
    ) / jnp.maximum(jnp.sum(mel_mask), 1.0)

    pitch_loss = jnp.sum(
        (out["pitch_tgt"] - out["pitch_pred"]) ** 2 * dur_mask[:, None, :]
    ) / n_tok

    if out.get("energy_pred") is not None:
        energy_loss = jnp.sum(
            (out["energy_tgt"] - out["energy_pred"]) ** 2 * dur_mask) / n_tok
    else:
        energy_loss = 0.0

    attn_loss = attention_ctc_loss(out["attn_logprob"], token_lens,
                                   batch["mel_lens"])

    loss = (mel_scale * mel_loss + dur_scale * dur_loss
            + pitch_scale * pitch_loss + energy_scale * energy_loss
            + attn_scale * attn_loss)
    meta = {
        "loss": loss,
        "mel_loss": mel_loss,
        "duration_predictor_loss": dur_loss,
        "pitch_loss": pitch_loss,
        "attn_loss": attn_loss,
        "dur_error": jnp.sum(jnp.abs(out["dur_pred"] - out["dur_tgt"])
                             * dur_mask) / n_tok,
    }
    if out.get("energy_pred") is not None:
        meta["energy_loss"] = energy_loss
    return loss, meta


def tacotron2_loss(mel_out, mel_out_postnet, gate_out, mel_tgt, gate_tgt,
                   mel_lens):
    """MSE(mel) + MSE(postnet mel) + BCE(gate) (reference
    `models/tacotron2/loss.py:5-33`). Shapes: mel [B, T, n_mel] feature-last,
    gate [B, T]."""
    frame_mask = sequence_mask(mel_lens, mel_out.shape[1]).astype(jnp.float32)
    m = frame_mask[..., None]
    denom = jnp.maximum(jnp.sum(m) * mel_out.shape[-1], 1.0)
    mel_loss = jnp.sum((mel_out - mel_tgt) ** 2 * m) / denom
    post_loss = jnp.sum((mel_out_postnet - mel_tgt) ** 2 * m) / denom
    gate_bce = optax.sigmoid_binary_cross_entropy(gate_out, gate_tgt)
    gate_loss = jnp.sum(gate_bce * frame_mask) / jnp.maximum(
        jnp.sum(frame_mask), 1.0)
    loss = mel_loss + post_loss + gate_loss
    meta = {"loss": loss, "mel_loss": mel_loss, "post_mel_loss": post_loss,
            "gate_loss": gate_loss}
    return loss, meta
