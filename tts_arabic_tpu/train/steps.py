"""Jitted train steps for FastPitch and Tacotron2 (MSE and adversarial).

Functional equivalents of the reference trainers (`scripts/train_fp.py`,
`scripts/train_fp_adv.py`, `scripts/train_tc2.py`, `scripts/train_tc2_adv.py`)
as single compiled TPU steps:

- FastPitch: soft ConvAttention -> in-graph MAS (no CPU round trip) ->
  teacher-forced forward -> composite loss + binarization KL (+ LSGAN
  critic on random 128-frame mel chunks with feature matching)
- Tacotron2: teacher-forced scan forward -> MSE+gate loss (+ same GAN
  recipe), with BatchNorm batch_stats threaded through the state

The discriminator update runs inside the same jit: D sees detached fakes
from a no-grad forward; the generator loss then queries the UPDATED critic,
matching the reference's optimizer ordering (train_fp_adv.py:144-169).
Data parallelism: wrap the returned step with
`tts_arabic_tpu.parallel.data_parallel_jit`.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..align import mas_durations
from ..eval.alignment import alignment_diagnostics
from ..models.fastpitch import FastPitch
from ..models.tacotron2 import Tacotron2
from .gan import (PatchDiscriminator, extract_chunks, feature_match_loss,
                  normalize_mel_chunk, sample_chunk_params)
from .losses import (attention_binarization_loss, fastpitch_loss,
                     tacotron2_loss)

CHUNK_LEN = 128


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    extra: Any = None          # batch_stats (tacotron) etc.
    d_params: Any = None       # critic
    d_opt_state: Any = None
    d_spectral: Any = None     # power-iteration vectors


def make_optimizer(lr=1e-4, beta1=0.9, beta2=0.999, weight_decay=1e-6,
                   grad_clip=1000.0, flatten=False):
    """AdamW + global-norm clip (reference recipe). `flatten=True` wraps
    the update in `optax.flatten`, running it over ONE concatenated vector
    instead of one op-set per param leaf — mathematically identical for
    these (elementwise + global-norm) transforms (pinned by
    `test_flattened_optimizer_updates_identical`), but it changes the
    `opt_state` pytree layout, so it is opt-in (checkpoints are not
    interchangeable across the flag). Measured on the v5e production
    adversarial step it is a LOSS (29.56 -> 26.68 steps/s: the
    concatenate/split HBM traffic costs more than the per-leaf dispatch
    it saves), so nothing enables it by default — kept as an adjudicated
    lever for param-heavier models (docs/PERF.md r4 train section)."""
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr, b1=beta1, b2=beta2, weight_decay=weight_decay),
    )
    return optax.flatten(tx) if flatten else tx


def _critic_losses(critic, state, mel_tgt, mel_out_sg, mel_lens, rng,
                   tx_d):
    """LSGAN discriminator step (train_fp_adv.py:127-152). Returns
    (new d state pieces, fmaps_org, chunk ids/offsets, d_loss)."""
    B = mel_tgt.shape[0]
    mel_ids, ofx = sample_chunk_params(rng, B, mel_lens, CHUNK_LEN)
    real = normalize_mel_chunk(
        extract_chunks(mel_tgt, ofx, mel_ids, CHUNK_LEN))[..., None]
    fake = normalize_mel_chunk(
        extract_chunks(mel_out_sg, ofx, mel_ids, CHUNK_LEN))[..., None]

    def d_loss_fn(d_params):
        (d_org, fmaps_org), _ = critic.apply(
            {"params": d_params, "spectral": state.d_spectral}, real,
            mutable=["spectral"])
        (d_gen, _), new_spec = critic.apply(
            {"params": d_params, "spectral": state.d_spectral}, fake,
            mutable=["spectral"])
        loss_d = 0.5 * jnp.mean((d_org - 1.0) ** 2) + \
            0.5 * jnp.mean(d_gen ** 2)
        return loss_d, (fmaps_org, new_spec["spectral"])

    (loss_d, (fmaps_org, new_spectral)), d_grads = jax.value_and_grad(
        d_loss_fn, has_aux=True)(state.d_params)
    d_updates, d_opt_state = tx_d.update(d_grads, state.d_opt_state,
                                         state.d_params)
    d_params = optax.apply_updates(state.d_params, d_updates)
    return (d_params, d_opt_state, new_spectral, fmaps_org, mel_ids, ofx,
            loss_d)


def make_fastpitch_train_step(model: FastPitch, tx,
                              critic: Optional[PatchDiscriminator] = None,
                              tx_d=None, gan_loss_weight: float = 3.0,
                              feat_loss_weight: float = 1.0,
                              kl_loss_weight: float = 1.0):
    """Returns step(state, batch, rng) -> (state, meta). `batch` comes from
    `data.collate_fastpitch`.

    Deliberately f32 throughout: a bf16 master-weights variant (params +
    float batch cast down inside the differentiated function, losses and
    the alignment path f32) measured EXACTLY neutral on the v5e —
    26.87 -> 26.99 steps/s at the production shape — because JAX's default
    matmul precision already executes the f32 matmuls as bf16 MXU passes
    and the rest of the step is op-latency-bound, not activation-bandwidth
    bound; it also destabilized the adversarial recipe at random init
    (NaN after ~30 steps). See docs/PERF.md "Mixed-precision train step"."""
    adv = critic is not None

    def forward(params, batch, durs, rng, deterministic=False):
        return model.apply(
            {"params": params}, batch["tokens"], batch["token_lens"],
            batch["mel_tgt"], batch["mel_lens"], batch["pitch_dense"],
            batch["energy_dense"], batch["attn_prior"], durs,
            deterministic=deterministic, rngs={"dropout": rng},
            method=FastPitch.forward_train)

    def step(state, batch, rng):
        rng_drop, rng_chunk = jax.random.split(jax.random.fold_in(
            rng, state.step))

        # soft alignment -> in-graph MAS (replaces the reference's CPU
        # numba round trip, model.py:238-258)
        attn_soft, _ = model.apply(
            {"params": state.params}, batch["tokens"], batch["mel_tgt"],
            batch["attn_prior"], method=FastPitch.align_attention)
        attn_hard, durs = mas_durations(attn_soft, batch["token_lens"],
                                        batch["mel_lens"])

        if adv:
            out_ng = forward(jax.lax.stop_gradient(state.params), batch,
                             durs, rng_drop)
            (d_params, d_opt_state, new_spectral, fmaps_org, mel_ids, ofx,
             loss_d) = _critic_losses(
                critic, state, batch["mel_tgt"],
                jax.lax.stop_gradient(out_ng["mel_out"]),
                batch["mel_lens"], rng_chunk, tx_d)
        else:
            d_params = d_opt_state = new_spectral = None

        def loss_fn(params):
            out = forward(params, batch, durs, rng_drop)
            loss, meta = fastpitch_loss(out, batch)
            kl = attention_binarization_loss(attn_hard, out["attn_soft"])
            loss = loss + kl_loss_weight * kl
            meta["kl_loss"] = kl
            if adv:
                fake = normalize_mel_chunk(extract_chunks(
                    out["mel_out"], ofx, mel_ids, CHUNK_LEN))[..., None]
                (d_gen2, fmaps_gen), _ = critic.apply(
                    {"params": d_params, "spectral": new_spectral}, fake,
                    mutable=["spectral"])
                score = jnp.mean((d_gen2 - 1.0) ** 2)
                fmatch = feature_match_loss(fmaps_gen, fmaps_org)
                loss = (loss + gan_loss_weight * score
                        + feat_loss_weight * fmatch)
                meta["score"] = score
                meta["fmatch"] = fmatch
                meta["loss_d"] = loss_d
            meta["loss"] = loss
            return loss, meta

        (_, meta), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        meta["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=params, opt_state=opt_state, step=state.step + 1,
            d_params=d_params if adv else state.d_params,
            d_opt_state=d_opt_state if adv else state.d_opt_state,
            d_spectral=new_spectral if adv else state.d_spectral), meta

    return step


def make_tacotron_train_step(model: Tacotron2, tx,
                             critic: Optional[PatchDiscriminator] = None,
                             tx_d=None, gan_loss_weight: float = 4.0,
                             feat_loss_weight: float = 1.0):
    """Returns step(state, batch, rng) -> (state, meta). `batch` comes from
    `data.collate_tacotron`. state.extra holds batch_stats."""
    adv = critic is not None

    def forward(params, batch_stats, batch, rng):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["tokens"], batch["token_lens"], batch["mel_tgt"],
            batch["mel_lens"], train=True, rngs={"dropout": rng},
            mutable=["batch_stats"])

    def step(state, batch, rng):
        rng_drop, rng_chunk = jax.random.split(jax.random.fold_in(
            rng, state.step))

        if adv:
            (out_ng, _), _ = forward(
                jax.lax.stop_gradient(state.params), state.extra, batch,
                rng_drop), None
            mel_post_ng = jax.lax.stop_gradient(out_ng[1])
            (d_params, d_opt_state, new_spectral, fmaps_org, mel_ids, ofx,
             loss_d) = _critic_losses(
                critic, state, batch["mel_tgt"], mel_post_ng,
                batch["mel_lens"], rng_chunk, tx_d)
        else:
            d_params = d_opt_state = new_spectral = None

        def loss_fn(params):
            (mel_out, mel_post, gates, aligns), mut = forward(
                params, state.extra, batch, rng_drop)
            loss, meta = tacotron2_loss(
                mel_out, mel_post, gates, batch["mel_tgt"],
                batch["gate_tgt"], batch["mel_lens"])
            if adv:
                fake = normalize_mel_chunk(extract_chunks(
                    mel_post, ofx, mel_ids, CHUNK_LEN))[..., None]
                (d_gen2, fmaps_gen), _ = critic.apply(
                    {"params": d_params, "spectral": new_spectral}, fake,
                    mutable=["spectral"])
                score = jnp.mean((d_gen2 - 1.0) ** 2)
                fmatch = feature_match_loss(fmaps_gen, fmaps_org)
                loss = (loss + gan_loss_weight * score
                        + feat_loss_weight * fmatch)
                meta["score"] = score
                meta["fmatch"] = fmatch
                meta["loss_d"] = loss_d
            meta["loss"] = loss
            return loss, (meta, mut["batch_stats"])

        (_, (meta, batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        meta["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=params, opt_state=opt_state, step=state.step + 1,
            extra=batch_stats,
            d_params=d_params if adv else state.d_params,
            d_opt_state=d_opt_state if adv else state.d_opt_state,
            d_spectral=new_spectral if adv else state.d_spectral), meta

    return step


def make_fastpitch_eval_step(model: FastPitch):
    """Validation step (reference `validate()`, train.py:19-58): forward
    only, deterministic, no optimizer. Returns (meta, artifacts) — the
    artifacts carry the soft attention and mels for TB figures."""

    def eval_step(state, batch, rng):
        attn_soft, _ = model.apply(
            {"params": state.params}, batch["tokens"], batch["mel_tgt"],
            batch["attn_prior"], method=FastPitch.align_attention)
        attn_hard, durs = mas_durations(attn_soft, batch["token_lens"],
                                        batch["mel_lens"])
        out = model.apply(
            {"params": state.params}, batch["tokens"], batch["token_lens"],
            batch["mel_tgt"], batch["mel_lens"], batch["pitch_dense"],
            batch["energy_dense"], batch["attn_prior"], durs,
            deterministic=True, method=FastPitch.forward_train)
        loss, meta = fastpitch_loss(out, batch)
        kl = attention_binarization_loss(attn_hard, out["attn_soft"])
        meta["kl_loss"] = kl
        meta["loss"] = loss + kl
        # alignment-health scalars (the reference only surfaces alignment
        # as human-inspected TB figures, utils/logging.py:23-40)
        meta.update(alignment_diagnostics(
            out["attn_soft"], batch["mel_lens"], batch["token_lens"]))
        artifacts = {"alignment": out["attn_soft"],  # [B, T_mel, T_txt]
                     "mel_pred": out["mel_out"],
                     "mel_tgt": batch["mel_tgt"]}
        return meta, artifacts

    return eval_step


def make_tacotron_eval_step(model: Tacotron2):
    """Validation step for Tacotron2 (teacher-forced, eval-mode BN, no
    optimizer). Returns (meta, artifacts)."""

    def eval_step(state, batch, rng):
        mel_out, mel_post, gates, aligns = model.apply(
            {"params": state.params, "batch_stats": state.extra},
            batch["tokens"], batch["token_lens"], batch["mel_tgt"],
            batch["mel_lens"], train=False)
        loss, meta = tacotron2_loss(
            mel_out, mel_post, gates, batch["mel_tgt"], batch["gate_tgt"],
            batch["mel_lens"])
        meta["loss"] = loss
        meta.update(alignment_diagnostics(
            aligns, batch["mel_lens"], batch["token_lens"]))
        artifacts = {"alignment": aligns, "mel_pred": mel_post,
                     "mel_tgt": batch["mel_tgt"]}
        return meta, artifacts

    return eval_step
