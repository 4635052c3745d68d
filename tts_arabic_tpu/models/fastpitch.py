"""FastPitch acoustic model (flax): parallel text -> mel with duration,
pitch, and energy prediction.

TPU-first re-implementation of the reference network
(`models/fastpitch/fastpitch/model.py`): 6+6 FFT transformer encoder/decoder
(384-dim, 1 head of 64, conv-k3 filter 1536), 2-layer conv TemporalPredictors
for log-duration / pitch / energy, conv-k3 pitch and energy embeddings added
to the encoder output, a cumsum-matmul length regulator, and a Linear mel
projection. Training-time alignment uses the ConvAttention soft aligner
(`attention.py:85-223`) with in-graph MAS binarization (`tts_arabic_tpu.align`)
instead of the reference's CPU numba round-trip (model.py:238-258).

Everything here is static-shape and jit-compatible: the length regulator
takes a static `max_frames` (bucketed by the caller), and inference composes
as `encode_infer` (text -> durations + conditioned encoder state) plus
`decode` (length-regulate -> decoder -> mel), so the expensive decoder can be
compiled per mel-length bucket.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import FFTransformer, TemporalPredictor, sequence_mask


@dataclasses.dataclass(frozen=True)
class FastPitchConfig:
    """Hyperparameters (reference `models/fastpitch/__init__.py:3-41`)."""
    n_mel_channels: int = 80
    n_symbols: int = 40
    padding_idx: int = 0
    d_model: int = 384
    # encoder / decoder FFT stacks
    enc_n_layers: int = 6
    enc_n_heads: int = 1
    enc_d_head: int = 64
    enc_kernel_size: int = 3
    enc_filter_size: int = 1536
    enc_dropout: float = 0.1
    enc_dropatt: float = 0.1
    enc_dropemb: float = 0.0
    dec_n_layers: int = 6
    dec_n_heads: int = 1
    dec_d_head: int = 64
    dec_kernel_size: int = 3
    dec_filter_size: int = 1536
    dec_dropout: float = 0.1
    dec_dropatt: float = 0.1
    dec_dropemb: float = 0.0
    # predictors
    dur_filter_size: int = 256
    dur_kernel_size: int = 3
    dur_dropout: float = 0.1
    dur_n_layers: int = 2
    pitch_filter_size: int = 256
    pitch_kernel_size: int = 3
    pitch_dropout: float = 0.1
    pitch_n_layers: int = 2
    pitch_emb_kernel_size: int = 3
    pitch_formants: int = 1
    energy_conditioning: bool = True
    energy_filter_size: int = 256
    energy_kernel_size: int = 3
    energy_dropout: float = 0.1
    energy_n_layers: int = 2
    energy_emb_kernel_size: int = 3
    # compile the 6+6 identical FFT blocks as ONE lax.scan over a stacked
    # layer axis (smaller XLA program, same math; layers.py::FFTransformer).
    # Param layout changes — `runtime/checkpoint.py` and the torch importer
    # emit the per-layer layout; convert with stack_fft_params.
    scan_layers: bool = False
    # speakers
    n_speakers: int = 1
    speaker_emb_weight: float = 1.0
    # aligner
    attn_channels: int = 80

    @classmethod
    def from_reference_net_config(cls, net_config: dict) -> "FastPitchConfig":
        """Map a reference-style `net_config` dict (the layout embedded in
        its checkpoints) onto this config."""
        m = _REF_NET_CONFIG_KEYMAP
        kwargs = {m[k]: v for k, v in net_config.items() if k in m}
        return cls(**kwargs)

    def to_reference_net_config(self) -> dict:
        """Inverse mapping: emit the reference-style `net_config` dict
        (`models/fastpitch/__init__.py:3-41` keys) for checkpoints exported
        back to the reference (`models/torch_export.py`)."""
        return {ref_k: getattr(self, our_k)
                for ref_k, our_k in _REF_NET_CONFIG_KEYMAP.items()}


_REF_NET_CONFIG_KEYMAP = {
            "n_mel_channels": "n_mel_channels",
            "n_symbols": "n_symbols",
            "padding_idx": "padding_idx",
            "symbols_embedding_dim": "d_model",
            "in_fft_n_layers": "enc_n_layers",
            "in_fft_n_heads": "enc_n_heads",
            "in_fft_d_head": "enc_d_head",
            "in_fft_conv1d_kernel_size": "enc_kernel_size",
            "in_fft_conv1d_filter_size": "enc_filter_size",
            "p_in_fft_dropout": "enc_dropout",
            "p_in_fft_dropatt": "enc_dropatt",
            "p_in_fft_dropemb": "enc_dropemb",
            "out_fft_n_layers": "dec_n_layers",
            "out_fft_n_heads": "dec_n_heads",
            "out_fft_d_head": "dec_d_head",
            "out_fft_conv1d_kernel_size": "dec_kernel_size",
            "out_fft_conv1d_filter_size": "dec_filter_size",
            "p_out_fft_dropout": "dec_dropout",
            "p_out_fft_dropatt": "dec_dropatt",
            "p_out_fft_dropemb": "dec_dropemb",
            "dur_predictor_kernel_size": "dur_kernel_size",
            "dur_predictor_filter_size": "dur_filter_size",
            "p_dur_predictor_dropout": "dur_dropout",
            "dur_predictor_n_layers": "dur_n_layers",
            "pitch_predictor_kernel_size": "pitch_kernel_size",
            "pitch_predictor_filter_size": "pitch_filter_size",
            "p_pitch_predictor_dropout": "pitch_dropout",
            "pitch_predictor_n_layers": "pitch_n_layers",
            "pitch_embedding_kernel_size": "pitch_emb_kernel_size",
            "energy_conditioning": "energy_conditioning",
            "energy_predictor_kernel_size": "energy_kernel_size",
            "energy_predictor_filter_size": "energy_filter_size",
            "p_energy_predictor_dropout": "energy_dropout",
            "energy_predictor_n_layers": "energy_n_layers",
            "energy_embedding_kernel_size": "energy_emb_kernel_size",
            "n_speakers": "n_speakers",
            "speaker_emb_weight": "speaker_emb_weight",
}


def regulate_len(durations, enc_out, max_frames: int, pace: float = 1.0):
    """Expand encoder states by integer durations (reference `regulate_len`,
    model.py:68-90) with a STATIC output length.

    durations: [B, T] float; enc_out: [B, T, C].
    Returns (expanded [B, max_frames, C], dec_lens [B] int32).

    The expansion is a boolean interval matmul — cumsum the rounded
    durations, then frame f copies token t iff cs[t] <= f < cs[t+1] — which
    maps the whole operation onto one MXU matmul instead of a gather.
    """
    reps = jnp.floor(durations / pace + 0.5).astype(jnp.int32)
    dec_lens = jnp.sum(reps, axis=1)
    cs = jnp.cumsum(jnp.pad(reps, ((0, 0), (1, 0))), axis=1)  # [B, T+1]
    frames = jnp.arange(max_frames)[None, :, None]            # [1, F, 1]
    mult = (cs[:, None, :-1] <= frames) & (cs[:, None, 1:] > frames)
    out = jnp.einsum("bft,btc->bfc", mult.astype(enc_out.dtype), enc_out)
    return out, jnp.minimum(dec_lens, max_frames)


def average_by_durations(values, durations):
    """Average frame-level values over each token's duration span
    (reference `average_pitch`, model.py:93-111).

    values: [B, n_formants, T_mel] (zeros are excluded from the average);
    durations: [B, T_text]. Returns [B, n_formants, T_text].
    """
    ends = jnp.cumsum(durations, axis=1).astype(jnp.int32)
    starts = jnp.pad(ends[:, :-1], ((0, 0), (1, 0)))
    nonzero_cums = jnp.pad(
        jnp.cumsum((values != 0.0).astype(jnp.float32), axis=2),
        ((0, 0), (0, 0), (1, 0)))
    value_cums = jnp.pad(jnp.cumsum(values, axis=2), ((0, 0), (0, 0), (1, 0)))

    def gather(c, idx):
        return jnp.take_along_axis(c, idx[:, None, :], axis=2)

    sums = gather(value_cums, ends) - gather(value_cums, starts)
    counts = gather(nonzero_cums, ends) - gather(nonzero_cums, starts)
    return jnp.where(counts == 0.0, 0.0, sums / jnp.maximum(counts, 1.0))


class ConvAttention(nn.Module):
    """Soft mel<->text aligner for training (reference `ConvAttention`,
    attention.py:85-223): conv projections of both streams, negative-L2
    Gaussian log-likelihood scores, beta-binomial prior in log space,
    masked softmax over the text axis. Layout feature-last.
    """
    n_mel_channels: int = 80
    n_text_channels: int = 384
    n_att_channels: int = 80

    @nn.compact
    def __call__(self, mels, text_emb, text_mask, attn_prior=None):
        """mels [B, T_mel, n_mel], text_emb [B, T_txt, C], text_mask [B,T_txt].
        Returns (attn [B, T_mel, T_txt] softmaxed, attn_logprob same shape).
        """
        k = nn.Conv(2 * self.n_text_channels, (3,), padding="SAME",
                    name="key_conv1")(text_emb)
        k = nn.relu(k)
        k = nn.Conv(self.n_att_channels, (1,), name="key_conv2")(k)

        q = nn.Conv(2 * self.n_mel_channels, (3,), padding="SAME",
                    name="query_conv1")(mels)
        q = nn.relu(q)
        q = nn.Conv(self.n_mel_channels, (1,), name="query_conv2")(q)
        q = nn.relu(q)
        q = nn.Conv(self.n_att_channels, (1,), name="query_conv3")(q)

        # -0.0005 * ||q_f - k_t||^2, expanded so the cross term is a matmul
        q2 = jnp.sum(q**2, axis=-1)[:, :, None]
        k2 = jnp.sum(k**2, axis=-1)[:, None, :]
        qk = jnp.einsum("bfc,btc->bft", q, k)
        scores = -0.0005 * (q2 + k2 - 2.0 * qk)

        if attn_prior is not None:
            scores = (jax.nn.log_softmax(scores, axis=2)
                      + jnp.log(attn_prior + 1e-8))
        attn_logprob = scores
        scores = jnp.where(text_mask[:, None, :], scores, -jnp.inf)
        return jax.nn.softmax(scores, axis=2), attn_logprob


class FastPitch(nn.Module):
    """The FastPitch network. See module docstring."""
    config: FastPitchConfig = FastPitchConfig()

    def setup(self):
        c = self.config
        self.encoder = FFTransformer(
            n_layer=c.enc_n_layers, n_head=c.enc_n_heads, d_model=c.d_model,
            d_head=c.enc_d_head, d_inner=c.enc_filter_size,
            kernel_size=c.enc_kernel_size, dropout=c.enc_dropout,
            dropatt=c.enc_dropatt, dropemb=c.enc_dropemb, embed_input=True,
            n_embed=c.n_symbols, padding_idx=c.padding_idx,
            scan_layers=c.scan_layers, name="encoder")
        self.decoder = FFTransformer(
            n_layer=c.dec_n_layers, n_head=c.dec_n_heads, d_model=c.d_model,
            d_head=c.dec_d_head, d_inner=c.dec_filter_size,
            kernel_size=c.dec_kernel_size, dropout=c.dec_dropout,
            dropatt=c.dec_dropatt, dropemb=c.dec_dropemb, embed_input=False,
            scan_layers=c.scan_layers, name="decoder")
        self.duration_predictor = TemporalPredictor(
            c.dur_filter_size, c.dur_kernel_size, c.dur_dropout,
            c.dur_n_layers, name="duration_predictor")
        self.pitch_predictor = TemporalPredictor(
            c.pitch_filter_size, c.pitch_kernel_size, c.pitch_dropout,
            c.pitch_n_layers, n_predictions=c.pitch_formants,
            name="pitch_predictor")
        self.pitch_emb = nn.Conv(c.d_model, (c.pitch_emb_kernel_size,),
                                 padding="SAME", name="pitch_emb")
        if c.energy_conditioning:
            self.energy_predictor = TemporalPredictor(
                c.energy_filter_size, c.energy_kernel_size, c.energy_dropout,
                c.energy_n_layers, name="energy_predictor")
            self.energy_emb = nn.Conv(c.d_model, (c.energy_emb_kernel_size,),
                                      padding="SAME", name="energy_emb")
        if c.n_speakers > 1:
            self.speaker_emb = nn.Embed(c.n_speakers, c.d_model,
                                        name="speaker_emb")
        self.proj = nn.Dense(c.n_mel_channels, name="proj")
        self.attention = ConvAttention(
            c.n_mel_channels, c.d_model, c.attn_channels, name="attention")
        # corpus pitch statistics, stored with the weights like the
        # reference's registered buffers (model.py:213-214)
        self.pitch_mean = self.param(
            "pitch_mean", lambda key: jnp.zeros((1,), jnp.float32))
        self.pitch_std = self.param(
            "pitch_std", lambda key: jnp.zeros((1,), jnp.float32))

    # ---- shared pieces -----------------------------------------------------

    def _speaker_vector(self, batch_size: int, speaker):
        """speaker may be a python int or a traced int scalar (dynamic, so
        changing speaker_id never recompiles)."""
        if self.config.n_speakers <= 1:
            return 0.0
        sid = jnp.broadcast_to(jnp.asarray(speaker, jnp.int32), (batch_size,))
        return (self.speaker_emb(sid)[:, None, :]
                * self.config.speaker_emb_weight)

    def encode_infer(self, tokens, *, speaker=0, pace: float = 1.0,
                     pitch_mul: float = 1.0, pitch_add: float = 0.0,
                     pitch_tgt=None, energy_tgt=None,
                     max_duration: float = 75.0, pitch_transform=None):
        """Text tokens [B, T] -> conditioned encoder state + durations.

        Mirrors reference `FastPitch.infer` up to the length regulator
        (model.py:351-397). pitch_mul/pitch_add implement the wrapper's
        `pitch_trf` closure (`networks.py:38-42`); `pitch_transform` is the
        general hook (model.py:373-380): a traceable callable
        `(pitch [B, T, 1], enc_lens [B], mean, std) -> pitch`, given the
        stored corpus pitch statistics (LJSpeech fallback 218.14/67.24 when
        absent, model.py:376). Applied before the mul/add.
        """
        spk = self._speaker_vector(tokens.shape[0], speaker)
        enc_out, enc_mask = self.encoder(tokens, conditioning=spk)

        log_dur = self.duration_predictor(enc_out, enc_mask).squeeze(-1)
        dur_pred = jnp.clip(jnp.exp(log_dur) - 1.0, 0.0, max_duration)
        dur_pred = jnp.where(enc_mask, dur_pred, 0.0)

        pitch_pred = self.pitch_predictor(enc_out, enc_mask)  # [B, T, 1]
        if pitch_transform is not None:
            # stored corpus stats; LJSpeech fallback when the checkpoint
            # carries none (std == 0), matching model.py:373-377
            has_stats = self.pitch_std[0] != 0.0
            mean = jnp.where(has_stats, self.pitch_mean[0], 218.14)
            std = jnp.where(has_stats, self.pitch_std[0], 67.24)
            pitch_pred = pitch_transform(
                pitch_pred, jnp.sum(enc_mask, axis=1), mean, std)
        # the reference's pitch_trf hook scales the *normalized* pitch
        # directly (networks.py:38-42). Applied unconditionally with dynamic
        # scalars (identity at mul=1, add=0) so changing pitch controls never
        # triggers a recompile.
        pitch_pred = jnp.asarray(pitch_mul) * pitch_pred + jnp.asarray(
            pitch_add)
        # re-mask: a nonzero pitch_add would otherwise put nonzero values on
        # pad positions, leaking into real frames through the k=3 pitch_emb
        # conv (pad-invariance, see layers.ConvFFN)
        pitch_pred = jnp.where(enc_mask[..., None], pitch_pred, 0.0)
        if pitch_tgt is None:
            pitch_emb = self.pitch_emb(pitch_pred)
        else:
            pitch_emb = self.pitch_emb(pitch_tgt)
        enc_out = enc_out + pitch_emb

        if self.config.energy_conditioning:
            if energy_tgt is None:
                energy_pred = self.energy_predictor(
                    enc_out, enc_mask).squeeze(-1)
                energy_emb = self.energy_emb(energy_pred[..., None])
            else:
                energy_pred = None
                energy_emb = self.energy_emb(energy_tgt)
            enc_out = enc_out + energy_emb
        else:
            energy_pred = None

        return {
            "enc_out": enc_out,
            "enc_mask": enc_mask,
            "dur_pred": dur_pred,
            "pitch_pred": jnp.swapaxes(pitch_pred, 1, 2),
            "energy_pred": energy_pred,
        }

    def decode(self, enc_out, durations, max_frames: int, pace: float = 1.0):
        """Length-regulate + decoder FFT + mel projection.

        Returns (mel [B, max_frames, n_mel], dec_lens [B]).
        """
        regulated, dec_lens = regulate_len(durations, enc_out, max_frames,
                                           pace)
        dec_out, _ = self.decoder(regulated, seq_lens=dec_lens)
        return self.proj(dec_out), dec_lens

    def infer(self, tokens, *, speaker=0, pace: float = 1.0,
              max_frames: int = 2048, pitch_mul: float = 1.0,
              pitch_add: float = 0.0, dur_tgt=None, pitch_tgt=None,
              energy_tgt=None, max_duration: float = 75.0,
              pitch_transform=None):
        """Full single-jit inference (reference `infer`, model.py:351-409).

        Returns dict with mel [B, max_frames, n_mel], mel_lens, dur_pred,
        pitch_pred, energy_pred.
        """
        enc = self.encode_infer(
            tokens, speaker=speaker, pace=pace, pitch_mul=pitch_mul,
            pitch_add=pitch_add, pitch_tgt=pitch_tgt, energy_tgt=energy_tgt,
            max_duration=max_duration, pitch_transform=pitch_transform)
        durations = enc["dur_pred"] if dur_tgt is None else dur_tgt
        mel, mel_lens = self.decode(enc["enc_out"], durations, max_frames,
                                    pace)
        return {
            "mel": mel,
            "mel_lens": mel_lens,
            "dur_pred": enc["dur_pred"],
            "pitch_pred": enc["pitch_pred"],
            "energy_pred": enc["energy_pred"],
        }

    def __call__(self, tokens, *, max_frames: int = 2048, **kw):
        return self.infer(tokens, max_frames=max_frames, **kw)

    # ---- training ----------------------------------------------------------

    def forward_train(self, tokens, token_lens, mel_tgt, mel_lens,
                      pitch_dense, energy_dense, attn_prior, attn_hard_dur,
                      *, speaker=None, use_gt_pitch: bool = True,
                      max_duration: float = 75.0,
                      deterministic: bool = False):
        """Teacher-forced training forward (reference `forward`,
        model.py:273-349), with one structural change for the TPU: MAS
        binarization of the soft attention is NOT inside this function —
        the train step computes the soft attention via `align_attention`,
        runs in-graph MAS (`tts_arabic_tpu.align.mas`) on it, and passes the
        resulting `attn_hard_dur` back in. That keeps this function purely
        differentiable; gradients are stopped on `attn_hard_dur` by the
        caller.

        mel_tgt: [B, T_mel, n_mel] (feature-last); pitch_dense [B, 1, T_mel];
        energy_dense [B, T_mel]; attn_prior [B, T_mel, T_txt].
        Returns a dict of everything the losses need.
        """
        c = self.config
        spk = (self._speaker_vector(tokens.shape[0], speaker)
               if speaker is not None else 0.0)
        enc_out, enc_mask = self.encoder(tokens, conditioning=spk,
                                         deterministic=deterministic)

        log_dur_pred = self.duration_predictor(
            enc_out, enc_mask, deterministic=deterministic).squeeze(-1)
        dur_pred = jnp.clip(jnp.exp(log_dur_pred) - 1.0, 0.0, max_duration)

        pitch_pred = self.pitch_predictor(
            enc_out, enc_mask, deterministic=deterministic)  # [B, T, 1]
        pitch_pred = jnp.swapaxes(pitch_pred, 1, 2)  # [B, 1, T]

        # soft alignment for the aligner losses
        text_emb = self.encoder.embed_tokens(tokens)
        attn_soft, attn_logprob = self.attention(
            mel_tgt, text_emb, enc_mask, attn_prior)

        dur_tgt = jax.lax.stop_gradient(attn_hard_dur)

        pitch_tgt = average_by_durations(pitch_dense, dur_tgt)
        if use_gt_pitch:
            pitch_emb = self.pitch_emb(jnp.swapaxes(pitch_tgt, 1, 2))
        else:
            pitch_emb = self.pitch_emb(jnp.swapaxes(pitch_pred, 1, 2))
        enc_out = enc_out + pitch_emb

        energy_pred = None
        energy_tgt = None
        if c.energy_conditioning:
            energy_pred = self.energy_predictor(
                enc_out, enc_mask, deterministic=deterministic).squeeze(-1)
            energy_tgt = average_by_durations(energy_dense[:, None, :],
                                              dur_tgt)
            energy_tgt = jnp.log1p(energy_tgt)
            enc_out = enc_out + self.energy_emb(
                jnp.swapaxes(energy_tgt, 1, 2))
            energy_tgt = energy_tgt.squeeze(1)

        max_frames = mel_tgt.shape[1]
        regulated, dec_lens = regulate_len(dur_tgt, enc_out, max_frames)
        dec_out, dec_mask = self.decoder(regulated, seq_lens=dec_lens,
                                         deterministic=deterministic)
        mel_out = self.proj(dec_out)

        return {
            "mel_out": mel_out,
            "dec_mask": dec_mask,
            "dur_pred": dur_pred,
            "log_dur_pred": log_dur_pred,
            "dur_tgt": dur_tgt,
            "pitch_pred": pitch_pred,
            "pitch_tgt": pitch_tgt,
            "energy_pred": energy_pred,
            "energy_tgt": energy_tgt,
            "attn_soft": attn_soft,
            "attn_logprob": attn_logprob,
        }

    def align_attention(self, tokens, mel_tgt, attn_prior):
        """Soft attention only (used by the train step to compute MAS input
        without a second full forward)."""
        text_emb = self.encoder.embed_tokens(tokens)
        enc_mask = tokens != self.config.padding_idx
        return self.attention(mel_tgt, text_emb, enc_mask, attn_prior)
