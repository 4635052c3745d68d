"""CTC loss tuned for the TPU train step.

Same recursion as `optax.ctc_loss` (Graves 2006, phi/emit split form;
numerics match optax to float tolerance — differential-tested), with two
changes motivated by the train-step profile (docs/PERF.md):

1. `unroll`: the per-step state is tiny ([B, N+1] + [B, N] carries), so
   the T_mel-length sequential scan is loop-latency-bound, not
   compute-bound; unrolling packs several steps into each compiled loop
   iteration (same trick as `align/mas.py`'s MAS scan, +8% there).
2. no stacked per-step alpha outputs: the loss needs only the FINAL
   carry, so the scan emits nothing — optax stacks two [T, B, N+1]
   arrays it only reads the last row of (they exist for its
   forward-probability API, which we don't use).

Used by `train/losses.py::attention_ctc_loss` (reference
`AttentionCTCLoss`, models/fastpitch/fastpitch/attn_loss_function.py:
20-61, which delegates to `torch.nn.CTCLoss`/cuDNN).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ctc_loss"]


def ctc_loss(logits, logit_paddings, labels, label_paddings,
             blank_id: int = 0, log_epsilon: float = -1e5,
             unroll: int = 8):
    """Per-sequence CTC negative log-likelihood.

    logits: [B, T, K] (normalized internally — log_softmax is idempotent,
    so pre-normalized log-probs are also accepted); logit_paddings [B, T]
    (1.0 = padded frame); labels [B, N] right-padded via label_paddings.
    Returns [B] loss values (same convention as `optax.ctc_loss`).
    """
    B, T, K = logits.shape
    _, N = labels.shape
    logprobs = jax.nn.log_softmax(logits)
    labellens = N - jnp.sum(label_paddings, axis=1).astype(jnp.int32)

    # repeat[b, n] == 1.0 when label[b, n] == label[b, n+1]
    repeat = (labels[:, :-1] == labels[:, 1:]).astype(logprobs.dtype)
    repeat = jnp.pad(repeat, ((0, 0), (0, 1)))

    logprobs_phi = jnp.transpose(
        logprobs[:, :, blank_id: blank_id + 1], (1, 0, 2))  # [T, B, 1]
    one_hot = jax.nn.one_hot(labels, num_classes=K)          # [B, N, K]
    logprobs_emit = jnp.transpose(
        jnp.einsum("btk,bnk->btn", logprobs, one_hot), (1, 0, 2))

    logalpha_phi = jnp.full((B, N + 1), log_epsilon,
                            logprobs.dtype).at[:, 0].set(0.0)
    logalpha_emit = jnp.full((B, N), log_epsilon, logprobs.dtype)

    def update_phi_score(phi, added_score):
        return jnp.concatenate(
            [phi[:, :1], jnp.logaddexp(phi[:, 1:], added_score)], axis=-1)

    def loop_body(prev, x):
        prev_phi, prev_emit = prev
        prev_phi_orig = prev_phi
        prev_phi = update_phi_score(prev_phi,
                                    prev_emit + log_epsilon * repeat)
        logprob_emit, logprob_phi, pad = x
        next_emit = jnp.logaddexp(prev_phi[:, :-1] + logprob_emit,
                                  prev_emit + logprob_emit)
        next_phi = prev_phi + logprob_phi
        next_phi = update_phi_score(
            next_phi, prev_emit + logprob_phi + log_epsilon * (1.0 - repeat))
        pad = pad.reshape((B, 1))
        next_emit = pad * prev_emit + (1.0 - pad) * next_emit
        next_phi = pad * prev_phi_orig + (1.0 - pad) * next_phi
        return (next_phi, next_emit), None

    (logalpha_phi, logalpha_emit), _ = jax.lax.scan(
        loop_body, (logalpha_phi, logalpha_emit),
        (logprobs_emit, logprobs_phi,
         logit_paddings.transpose((1, 0)).astype(logprobs.dtype)),
        unroll=unroll)

    # final epsilon transition into the terminal blank
    logalpha_phi_last = update_phi_score(logalpha_phi, logalpha_emit)
    one_hot_len = jax.nn.one_hot(labellens, num_classes=N + 1)
    return -jnp.einsum("bn,bn->b", logalpha_phi_last, one_hot_len)
