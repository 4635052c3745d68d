"""Monotonic alignment search (MAS), in-graph.

The reference binarizes its soft attention with a numba CPU kernel in the
middle of the training forward (GPU->CPU->GPU round trip,
`models/fastpitch/fastpitch/model.py:238-258`, `alignment.py:46-83`). Here
the same width-1 Viterbi DP runs ON the TPU inside the train step:

- forward pass: one `lax.scan` over mel frames; each step is a vectorized
  max over (stay, advance) across the whole batch and text axis
- backtrack: one reverse `lax.scan` carrying the per-sample text position,
  starting at each sample's true (out_len-1, in_len-1) corner

Tie-breaking matches `mas_width1` exactly (diagonal preferred on ties,
alignment.py:66-67), verified by differential test against the reference
kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -jnp.inf


def mas(log_attn: jnp.ndarray, in_lens: jnp.ndarray,
        out_lens: jnp.ndarray) -> jnp.ndarray:
    """Batched width-1 monotonic alignment search.

    log_attn: [B, T_mel, T_txt] log-attention map; in_lens/out_lens: [B].
    Returns hard alignment [B, T_mel, T_txt] in {0, 1} with zeros outside
    each sample's valid (out_len, in_len) region.
    """
    B, T_mel, T_txt = log_attn.shape
    cols = jnp.arange(T_txt)[None, :]
    col_valid = cols < in_lens[:, None]  # [B, T_txt]
    attn = jnp.where(col_valid[:, None, :], log_attn, _NEG)

    # --- forward DP ---------------------------------------------------------
    row0 = jnp.where(cols == 0, attn[:, 0, :], _NEG)

    def fwd(prev, attn_t):
        shifted = jnp.pad(prev[:, :-1], ((0, 0), (1, 0)),
                          constant_values=_NEG)
        row = attn_t + jnp.maximum(prev, shifted)
        return row, row

    _, rest = jax.lax.scan(fwd, row0, jnp.swapaxes(attn[:, 1:], 0, 1),
                           unroll=8)
    log_p = jnp.concatenate([row0[:, None, :], jnp.swapaxes(rest, 0, 1)],
                            axis=1)  # [B, T_mel, T_txt]

    # --- backtrack ----------------------------------------------------------
    j0 = in_lens - 1  # [B]

    def bwd(j, inputs):
        prev_row, i = inputs  # log_p[:, i-1, :], row index i
        active = (i < out_lens) & (i >= 1)
        opt_row = (cols == j[:, None]) & active[:, None]
        stay = jnp.take_along_axis(prev_row, j[:, None], axis=1)[:, 0]
        diag = jnp.take_along_axis(prev_row,
                                   jnp.maximum(j - 1, 0)[:, None],
                                   axis=1)[:, 0]
        move = active & (j > 0) & (diag >= stay)
        return jnp.where(move, j - 1, j), opt_row

    i_seq = jnp.arange(T_mel - 1, 0, -1)
    prev_rows = jnp.swapaxes(log_p[:, :-1], 0, 1)[::-1]  # rows T_mel-2..0
    j_final, opt_rows = jax.lax.scan(bwd, j0, (prev_rows, i_seq), unroll=8)

    opt = jnp.swapaxes(opt_rows, 0, 1)[:, ::-1]  # rows 1..T_mel-1
    row0_opt = (cols == j_final[:, None]) & (out_lens > 0)[:, None]
    opt = jnp.concatenate([row0_opt[:, None, :], opt], axis=1)
    return opt.astype(log_attn.dtype)


def mas_durations(attn_soft: jnp.ndarray, in_lens, out_lens,
                  eps: float = 1e-12):
    """Soft attention [B, T_mel, T_txt] -> (hard alignment, durations
    [B, T_txt]) — the training-forward helper replacing
    `binarize_attention` + column sums (model.py:310-314)."""
    attn_hard = mas(jnp.log(jnp.clip(attn_soft, min=eps)), in_lens, out_lens)
    attn_hard = jax.lax.stop_gradient(attn_hard)
    return attn_hard, jnp.sum(attn_hard, axis=1)
