"""Tacotron2 acoustic model (flax): autoregressive text -> mel.

Re-implementation of the reference `Tacotron2MS`
(`models/tacotron2/tacotron2_ms.py:119-332`), whose compute core lives in
torchaudio (`_Encoder`, `_Decoder`, `_Postnet`; tacotron2_ms.py:113):

- encoder: 3x [conv512 k5 -> BatchNorm -> ReLU -> dropout] -> BiLSTM(2x256)
  with packed-sequence semantics (the backward pass starts at each sample's
  true length)
- optional 128-dim speaker embedding concatenated to the encoder output
  (tacotron2_ms.py:209-212, 251-258)
- decoder: prenet (2x256, dropout ALWAYS active — the Tacotron2 trick) ->
  attention LSTM (1024) -> location-sensitive attention (128 hidden,
  32 filters, k31) -> decoder LSTM (1024) -> mel + gate projections
- postnet: 5x conv512 k5 BatchNorm tanh, residual

TPU-first control flow: the torchaudio per-step Python loop becomes
- training (teacher forcing): one `lax.scan` over mel frames
- inference: one `lax.while_loop` with a static `decoder_max_step` bound,
  per-sample finished masking and early exit when every sequence has fired
  its stop token (matching torchaudio's `decoder_early_stopping`)

The recurrence is inherently sequential; each step is a handful of
[B, 1024]-sized matmuls, so batch size is the TPU utilization lever.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import sequence_mask

_NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class Tacotron2Config:
    n_mels: int = 80
    n_symbols: int = 40
    symbol_embedding_dim: int = 512
    encoder_embedding_dim: int = 512
    encoder_n_convolutions: int = 3
    encoder_kernel_size: int = 5
    num_speakers: int = 1
    speaker_embedding_dim: int = 128
    decoder_rnn_dim: int = 1024
    decoder_max_step: int = 2000
    decoder_dropout: float = 0.1
    decoder_early_stopping: bool = True
    attention_rnn_dim: int = 1024
    attention_hidden_dim: int = 128
    attention_location_n_filters: int = 32
    attention_location_kernel_size: int = 31
    attention_dropout: float = 0.1
    prenet_dim: int = 256
    postnet_embedding_dim: int = 512
    postnet_kernel_size: int = 5
    postnet_n_convolutions: int = 5
    gate_threshold: float = 0.5
    # torchaudio's prenet hardcodes training=True dropout at 0.5; 0.0 makes
    # inference deterministic (used for differential testing vs the
    # reference with its dropout patched out)
    prenet_dropout: float = 0.5

    @property
    def memory_dim(self) -> int:
        extra = (self.speaker_embedding_dim if self.num_speakers > 1 else 0)
        return self.encoder_embedding_dim + extra


# --- LSTM primitives --------------------------------------------------------

def lstm_step(p, x, h, c):
    """torch LSTMCell semantics; gate order [i, f, g, o].

    p: {"wi": [in, 4H], "wh": [H, 4H], "bi": [4H], "bh": [4H]}.
    """
    z = x @ p["wi"] + p["bi"] + h @ p["wh"] + p["bh"]
    i, f, g, o = jnp.split(z, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _lstm_params(name, d_in, d_hidden):
    def init(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        s = 1.0 / np.sqrt(d_hidden)
        return {
            "wi": jax.random.uniform(k1, (d_in, 4 * d_hidden), minval=-s,
                                     maxval=s),
            "wh": jax.random.uniform(k2, (d_hidden, 4 * d_hidden), minval=-s,
                                     maxval=s),
            "bi": jax.random.uniform(k3, (4 * d_hidden,), minval=-s,
                                     maxval=s),
            "bh": jax.random.uniform(k4, (4 * d_hidden,), minval=-s,
                                     maxval=s),
        }
    return init


def _reverse_by_length(x, lengths):
    """Flip each sequence's valid prefix: out[b, i] = x[b, len_b-1-i] for
    i < len_b (padded-sequence reverse, for the packed backward LSTM)."""
    T = x.shape[1]
    pos = jnp.arange(T)[None, :]
    idx = jnp.where(pos < lengths[:, None], lengths[:, None] - 1 - pos, pos)
    return jnp.take_along_axis(x, idx[..., None], axis=1)


class BiLSTM(nn.Module):
    """Bidirectional LSTM over [B, T, C] with packed-sequence semantics."""
    hidden: int

    @nn.compact
    def __call__(self, x, lengths):
        B, T, C = x.shape
        fwd = self.param("fwd", _lstm_params("fwd", C, self.hidden))
        bwd = self.param("bwd", _lstm_params("bwd", C, self.hidden))

        def run(p, seq):
            def step(carry, xt):
                h, c = carry
                h, c = lstm_step(p, xt, h, c)
                return (h, c), h
            init = (jnp.zeros((B, self.hidden), x.dtype),
                    jnp.zeros((B, self.hidden), x.dtype))
            _, ys = jax.lax.scan(step, init, jnp.swapaxes(seq, 0, 1))
            return jnp.swapaxes(ys, 0, 1)

        out_f = run(fwd, x)
        out_b = _reverse_by_length(run(bwd, _reverse_by_length(x, lengths)),
                                   lengths)
        return jnp.concatenate([out_f, out_b], axis=-1)


class Tacotron2(nn.Module):
    config: Tacotron2Config = Tacotron2Config()

    # ---- submodule setup ---------------------------------------------------

    def setup(self):
        c = self.config
        self.embedding = nn.Embed(c.n_symbols, c.symbol_embedding_dim,
                                  name="embedding")
        # encoder convs
        self.enc_convs = [
            nn.Conv(c.encoder_embedding_dim, (c.encoder_kernel_size,),
                    padding="SAME", name=f"enc_conv_{i}")
            for i in range(c.encoder_n_convolutions)
        ]
        self.enc_bns = [
            nn.BatchNorm(epsilon=1e-5, momentum=0.9, name=f"enc_bn_{i}")
            for i in range(c.encoder_n_convolutions)
        ]
        self.enc_lstm = BiLSTM(c.encoder_embedding_dim // 2, name="enc_lstm")

        if c.num_speakers > 1:
            self.speaker_embedding = nn.Embed(
                c.num_speakers, c.speaker_embedding_dim,
                name="speaker_embedding")

        # decoder
        mem = c.memory_dim
        self.prenet1 = nn.Dense(c.prenet_dim, use_bias=False, name="prenet1")
        self.prenet2 = nn.Dense(c.prenet_dim, use_bias=False, name="prenet2")
        self.attention_rnn = self.param(
            "attention_rnn",
            _lstm_params("attention_rnn", c.prenet_dim + mem,
                         c.attention_rnn_dim))
        self.decoder_rnn = self.param(
            "decoder_rnn",
            _lstm_params("decoder_rnn", c.attention_rnn_dim + mem,
                         c.decoder_rnn_dim))
        self.query_layer = nn.Dense(c.attention_hidden_dim, use_bias=False,
                                    name="query_layer")
        self.memory_layer = nn.Dense(c.attention_hidden_dim, use_bias=False,
                                     name="memory_layer")
        self.v = nn.Dense(1, use_bias=False, name="v")
        self.location_conv = nn.Conv(
            c.attention_location_n_filters,
            (c.attention_location_kernel_size,), padding="SAME",
            use_bias=False, name="location_conv")
        self.location_dense = nn.Dense(c.attention_hidden_dim, use_bias=False,
                                       name="location_dense")
        self.linear_projection = nn.Dense(c.n_mels, name="linear_projection")
        self.gate_layer = nn.Dense(1, name="gate_layer")

        # postnet
        dims = ([c.postnet_embedding_dim] * (c.postnet_n_convolutions - 1)
                + [c.n_mels])
        self.post_convs = [
            nn.Conv(d, (c.postnet_kernel_size,), padding="SAME",
                    name=f"post_conv_{i}")
            for i, d in enumerate(dims)
        ]
        self.post_bns = [
            nn.BatchNorm(epsilon=1e-5, momentum=0.9, name=f"post_bn_{i}")
            for i in range(c.postnet_n_convolutions)
        ]

    # ---- encoder / postnet -------------------------------------------------

    def _dropout(self, x, rate, train):
        if not train:
            return x
        keep = jax.random.bernoulli(self.make_rng("dropout"), 1.0 - rate,
                                    x.shape)
        return keep * x / (1.0 - rate)

    def encode(self, tokens, token_lens, speaker_ids=None, *, train=False):
        """tokens [B, T] -> memory [B, T, memory_dim].

        Every conv input is re-masked so pad positions read as zeros — the
        same values the reference's exact-length run sees past the sequence
        end (zero "SAME" padding). This makes encoding pad-invariant: bucket
        padding in the pipeline cannot perturb real positions (the reference
        itself leaks pad values between its stacked k=5 convs when batching,
        torchaudio _Encoder; its single-utterance path is the oracle)."""
        c = self.config
        x = self.embedding(tokens)
        m = sequence_mask(token_lens, x.shape[1])[..., None]
        for conv, bn in zip(self.enc_convs, self.enc_bns):
            x = conv(jnp.where(m, x, 0.0))
            x = bn(x, use_running_average=not train)
            x = nn.relu(x)
            x = self._dropout(x, 0.5, train)
        x = self.enc_lstm(x, token_lens)
        if c.num_speakers > 1:
            if speaker_ids is None:
                speaker_ids = jnp.zeros((tokens.shape[0],), jnp.int32)
            spk = self.speaker_embedding(speaker_ids)[:, None, :]
            spk = jnp.broadcast_to(
                spk, (x.shape[0], x.shape[1], c.speaker_embedding_dim))
            x = jnp.concatenate([x, spk], axis=-1)
        return x

    def postnet(self, mel, mel_lens=None, *, train=False):
        """mel [B, T, n_mels] -> residual [B, T, n_mels].

        With `mel_lens`, conv inputs are re-masked past each sample's length
        (pad-invariance, same rationale as `encode`)."""
        x = mel
        m = (None if mel_lens is None
             else sequence_mask(mel_lens, mel.shape[1])[..., None])
        n = len(self.post_convs)
        for i, (conv, bn) in enumerate(zip(self.post_convs, self.post_bns)):
            x = conv(x if m is None else jnp.where(m, x, 0.0))
            x = bn(x, use_running_average=not train)
            if i < n - 1:
                x = jnp.tanh(x)
            x = self._dropout(x, 0.5, train)
        return x

    # ---- decoder core ------------------------------------------------------

    def _prenet(self, x, rng):
        """Prenet with always-on dropout (torchaudio `_Prenet` hardcodes
        training=True — the stochastic prenet is integral to Tacotron2).
        `config.prenet_dropout=0` disables it (deterministic decode)."""
        p = self.config.prenet_dropout
        if p == 0.0:
            return nn.relu(self.prenet2(nn.relu(self.prenet1(x))))
        r1, r2 = jax.random.split(rng)
        scale = 1.0 / (1.0 - p)
        x = nn.relu(self.prenet1(x))
        x = jax.random.bernoulli(r1, 1.0 - p, x.shape) * x * scale
        x = nn.relu(self.prenet2(x))
        x = jax.random.bernoulli(r2, 1.0 - p, x.shape) * x * scale
        return x

    def _attend(self, query, memory, processed_memory, attn_cat, memory_mask):
        """Location-sensitive attention. attn_cat [B, T, 2] (current +
        cumulative weights)."""
        loc = self.location_dense(self.location_conv(attn_cat))
        energies = self.v(jnp.tanh(
            self.query_layer(query)[:, None, :] + loc + processed_memory
        )).squeeze(-1)
        energies = jnp.where(memory_mask, energies, _NEG_INF)
        weights = jax.nn.softmax(energies, axis=1)
        context = jnp.einsum("bt,btc->bc", weights, memory)
        return context, weights

    def _materialize_decoder(self, memory, processed_memory, memory_mask):
        """Create all decoder submodule params OUTSIDE scan/while_loop traces
        (flax materializes params lazily at first call; creating them inside
        a lax control-flow trace leaks tracers). The dummy step's outputs are
        unused and DCE'd by XLA."""
        state = self._init_decoder_state(memory)
        pre = jnp.zeros((memory.shape[0], self.config.prenet_dim),
                        memory.dtype)
        self._decode_step(state, pre, memory, processed_memory, memory_mask,
                          train=False)

    def _init_decoder_state(self, memory):
        c = self.config
        B, T, _ = memory.shape
        z = lambda *shape: jnp.zeros(shape, memory.dtype)
        return {
            "attn_h": z(B, c.attention_rnn_dim),
            "attn_c": z(B, c.attention_rnn_dim),
            "dec_h": z(B, c.decoder_rnn_dim),
            "dec_c": z(B, c.decoder_rnn_dim),
            "attn_weights": z(B, T),
            "attn_weights_cum": z(B, T),
            "attn_context": z(B, c.memory_dim),
        }

    def _decode_step(self, state, prenet_out, memory, processed_memory,
                     memory_mask, *, train, dropout_rng=None):
        c = self.config
        cell_input = jnp.concatenate([prenet_out, state["attn_context"]],
                                     axis=-1)
        attn_h, attn_c = lstm_step(self.attention_rnn, cell_input,
                                   state["attn_h"], state["attn_c"])
        if train and dropout_rng is not None:
            keep = jax.random.bernoulli(dropout_rng, 1 - c.attention_dropout,
                                        attn_h.shape)
            attn_h = keep * attn_h / (1 - c.attention_dropout)

        attn_cat = jnp.stack([state["attn_weights"],
                              state["attn_weights_cum"]], axis=-1)
        context, weights = self._attend(attn_h, memory, processed_memory,
                                        attn_cat, memory_mask)
        weights_cum = state["attn_weights_cum"] + weights

        dec_input = jnp.concatenate([attn_h, context], axis=-1)
        dec_h, dec_c = lstm_step(self.decoder_rnn, dec_input,
                                 state["dec_h"], state["dec_c"])
        if train and dropout_rng is not None:
            keep = jax.random.bernoulli(
                jax.random.fold_in(dropout_rng, 1), 1 - c.decoder_dropout,
                dec_h.shape)
            dec_h = keep * dec_h / (1 - c.decoder_dropout)

        proj_in = jnp.concatenate([dec_h, context], axis=-1)
        mel_frame = self.linear_projection(proj_in)
        gate = self.gate_layer(proj_in).squeeze(-1)

        new_state = {
            "attn_h": attn_h, "attn_c": attn_c, "dec_h": dec_h,
            "dec_c": dec_c, "attn_weights": weights,
            "attn_weights_cum": weights_cum, "attn_context": context,
        }
        return new_state, mel_frame, gate, weights

    # ---- teacher-forced forward (training) ---------------------------------

    def __call__(self, tokens, token_lens, mel_tgt, mel_lens,
                 speaker_ids=None, *, train=False):
        """Teacher-forced forward (reference `Tacotron2MS.forward`,
        tacotron2_ms.py:214-276).

        mel_tgt: [B, T_mel, n_mels] feature-last.
        Returns (mel_out, mel_out_postnet, gates, alignments [B,T_mel,T_txt]).
        """
        memory = self.encode(tokens, token_lens, speaker_ids, train=train)
        processed_memory = self.memory_layer(memory)
        memory_mask = sequence_mask(token_lens, memory.shape[1])

        B, T_mel, _ = mel_tgt.shape
        go = jnp.zeros((B, 1, self.config.n_mels), mel_tgt.dtype)
        dec_in = jnp.concatenate([go, mel_tgt[:, :-1]], axis=1)
        rng = (self.make_rng("dropout") if train
               else jax.random.PRNGKey(0))
        # prenet is per-frame: compute for all steps at once
        pre = self._prenet(dec_in, rng)

        self._materialize_decoder(memory, processed_memory, memory_mask)
        state = self._init_decoder_state(memory)

        def step(carry, inp):
            state, t = carry
            pre_t = inp
            drop_rng = (jax.random.fold_in(rng, t + 1) if train else None)
            state, mel_frame, gate, weights = self._decode_step(
                state, pre_t, memory, processed_memory, memory_mask,
                train=train, dropout_rng=drop_rng)
            return (state, t + 1), (mel_frame, gate, weights)

        (_, _), (mels, gates, aligns) = jax.lax.scan(
            step, (state, 0), jnp.swapaxes(pre, 0, 1))
        mel_out = jnp.swapaxes(mels, 0, 1)
        gates = jnp.swapaxes(gates, 0, 1)
        aligns = jnp.swapaxes(aligns, 0, 1)

        post = self.postnet(mel_out, mel_lens, train=train)
        return mel_out, mel_out + post, gates, aligns

    # ---- autoregressive inference ------------------------------------------

    def infer(self, tokens, token_lens=None, speaker_ids=None, *,
              max_steps: Optional[int] = None, rng=None):
        """Autoregressive decode (reference `Tacotron2MS.infer`,
        tacotron2_ms.py:278-332; loop semantics of torchaudio
        `_Decoder.infer`): per-sample length bookkeeping, stop when
        sigmoid(gate) > threshold for every sample (early stopping) or at
        `max_steps`.

        Returns dict: mel [B, max_steps, n_mels] (before postnet masked to
        length), mel_postnet, mel_lens [B], alignments [B, max_steps, T_txt].
        """
        c = self.config
        B, T_txt = tokens.shape
        if token_lens is None:
            token_lens = jnp.full((B,), T_txt, jnp.int32)
        max_steps = max_steps or c.decoder_max_step
        if rng is None:
            rng = jax.random.PRNGKey(0)

        memory = self.encode(tokens, token_lens, speaker_ids, train=False)
        processed_memory = self.memory_layer(memory)
        memory_mask = sequence_mask(token_lens, T_txt)

        self._materialize_decoder(memory, processed_memory, memory_mask)
        state = self._init_decoder_state(memory)
        buffers = {
            "mel": jnp.zeros((B, max_steps, c.n_mels), memory.dtype),
            "gate": jnp.zeros((B, max_steps), memory.dtype),
            "align": jnp.zeros((B, max_steps, T_txt), memory.dtype),
        }
        init = {
            "state": state,
            "prev_frame": jnp.zeros((B, c.n_mels), memory.dtype),
            "finished": jnp.zeros((B,), bool),
            "lengths": jnp.zeros((B,), jnp.int32),
            "t": jnp.asarray(0, jnp.int32),
            "buffers": buffers,
        }

        def cond(carry):
            not_done = jnp.logical_not(jnp.all(carry["finished"]))
            if not c.decoder_early_stopping:
                not_done = True
            return jnp.logical_and(carry["t"] < max_steps, not_done)

        def body(carry):
            t = carry["t"]
            pre = self._prenet(carry["prev_frame"],
                               jax.random.fold_in(rng, t))
            state, mel_frame, gate, weights = self._decode_step(
                carry["state"], pre, memory, processed_memory, memory_mask,
                train=False)
            finished_now = jax.nn.sigmoid(gate) > c.gate_threshold
            active = jnp.logical_not(carry["finished"])
            buffers = carry["buffers"]
            buffers = {
                "mel": buffers["mel"].at[:, t].set(
                    jnp.where(active[:, None], mel_frame, 0.0)),
                "gate": buffers["gate"].at[:, t].set(gate),
                "align": buffers["align"].at[:, t].set(
                    jnp.where(active[:, None], weights, 0.0)),
            }
            return {
                "state": state,
                "prev_frame": mel_frame,
                "finished": jnp.logical_or(carry["finished"], finished_now),
                "lengths": carry["lengths"] + active.astype(jnp.int32),
                "t": t + 1,
                "buffers": buffers,
            }

        out = jax.lax.while_loop(cond, body, init)
        mel = out["buffers"]["mel"]
        post = self.postnet(mel, out["lengths"], train=False)
        return {
            "mel": mel,
            "mel_postnet": mel + post,
            "mel_lens": out["lengths"],
            "alignments": out["buffers"]["align"],
            "gates": out["buffers"]["gate"],
        }

    # ---- segmented autoregressive decode (streaming) -----------------------

    def encode_infer(self, tokens, token_lens=None, speaker_ids=None):
        """Encoder pass + attention-key precomputation, packaged for
        `decode_segment` (streaming synthesis; no reference equivalent)."""
        B, T_txt = tokens.shape
        if token_lens is None:
            token_lens = jnp.full((B,), T_txt, jnp.int32)
        memory = self.encode(tokens, token_lens, speaker_ids, train=False)
        return {
            "memory": memory,
            "processed_memory": self.memory_layer(memory),
            "memory_mask": sequence_mask(token_lens, T_txt),
        }

    def init_decode_carry(self, memory):
        c = self.config
        B = memory.shape[0]
        return {
            "state": self._init_decoder_state(memory),
            "prev_frame": jnp.zeros((B, c.n_mels), memory.dtype),
            "finished": jnp.zeros((B,), bool),
            "lengths": jnp.zeros((B,), jnp.int32),
            "t": jnp.asarray(0, jnp.int32),
        }

    def decode_segment(self, carry, enc, rng, *, n_steps: int):
        """Run up to `n_steps` decoder steps from `carry`, early-exiting
        when every row's gate fires. Each step is the SAME computation as
        `infer`'s loop body (prenet rng folded on the global step), so
        concatenated segment mels are bit-identical to one full decode.

        Returns (carry', {mel [B, n_steps, n_mels] (pre-postnet; rows past
        the new frames zero), gate, align, n_new scalar}).
        """
        c = self.config
        memory = enc["memory"]
        processed_memory = enc["processed_memory"]
        memory_mask = enc["memory_mask"]
        B, T_txt = memory.shape[:2]
        self._materialize_decoder(memory, processed_memory, memory_mask)
        buffers = {
            "mel": jnp.zeros((B, n_steps, c.n_mels), memory.dtype),
            "gate": jnp.zeros((B, n_steps), memory.dtype),
            "align": jnp.zeros((B, n_steps, T_txt), memory.dtype),
        }
        init = {**carry, "s": jnp.asarray(0, jnp.int32), "buffers": buffers}

        def cond(cy):
            not_done = jnp.logical_not(jnp.all(cy["finished"]))
            if not c.decoder_early_stopping:
                not_done = True
            return jnp.logical_and(cy["s"] < n_steps, not_done)

        def body(cy):
            t, s = cy["t"], cy["s"]
            pre = self._prenet(cy["prev_frame"], jax.random.fold_in(rng, t))
            state, mel_frame, gate, weights = self._decode_step(
                cy["state"], pre, memory, processed_memory, memory_mask,
                train=False)
            finished_now = jax.nn.sigmoid(gate) > c.gate_threshold
            active = jnp.logical_not(cy["finished"])
            buffers = {
                "mel": cy["buffers"]["mel"].at[:, s].set(
                    jnp.where(active[:, None], mel_frame, 0.0)),
                "gate": cy["buffers"]["gate"].at[:, s].set(gate),
                "align": cy["buffers"]["align"].at[:, s].set(
                    jnp.where(active[:, None], weights, 0.0)),
            }
            return {
                "state": state,
                "prev_frame": mel_frame,
                "finished": jnp.logical_or(cy["finished"], finished_now),
                "lengths": cy["lengths"] + active.astype(jnp.int32),
                "t": t + 1, "s": s + 1,
                "buffers": buffers,
            }

        out = jax.lax.while_loop(cond, body, init)
        new_carry = {k: out[k] for k in
                     ("state", "prev_frame", "finished", "lengths", "t")}
        return new_carry, {**out["buffers"], "n_new": out["s"]}
