"""HiFi-GAN vocoder adversarial training (the vocoder-training surface).

The reference carries the MPD/MSD discriminators and GAN losses
(`vocoder/hifigan/models.py:139-293`) but ships its vocoder pretrained and
never trains them (SURVEY.md §2.6) — training lives upstream in the
original HiFi-GAN repo. This module completes the surface with that
standard recipe as ONE jitted D->G step, TPU-style: the generator runs on
log-mels computed in-graph from the waveform batch (`audio/mel.py` pads
(n_fft-hop)/2 per side, so a segment of S samples gives exactly S/hop
frames and the generated waveform aligns sample-for-sample with the
target), the discriminator step uses the current generator's output with
gradients stopped, and the generator step plays against the UPDATED
discriminators — matching the upstream loop ordering. Loss weights are
the published recipe: LSGAN adversarial + feature-matching (x2 inside
`feature_loss`) + 45x L1 on log-mels; AdamW(0.8, 0.99).

Reuses `steps.TrainState` (d_params = {"mpd", "msd"} under one optimizer,
as upstream chains both into one AdamW) so `train.trainer.Trainer`,
checkpointing, and the DP mesh path work unchanged.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..audio.mel import MelConfig, log_mel_spectrogram
from ..vocoder.discriminators import (MultiPeriodDiscriminator,
                                      MultiScaleDiscriminator,
                                      discriminator_loss, feature_loss,
                                      generator_loss)
from .steps import TrainState


def init_vocoder_state(gen, mpd: MultiPeriodDiscriminator,
                       msd: MultiScaleDiscriminator, tx_g, tx_d,
                       segment_length: int, seed: int = 0,
                       mel_cfg: Optional[MelConfig] = None) -> TrainState:
    """Random-init generator + discriminators into one TrainState."""
    cfg = mel_cfg or MelConfig()
    rng = jax.random.PRNGKey(seed)
    wave = jnp.zeros((1, segment_length), jnp.float32)
    mel = _logmel(wave, cfg)
    params = gen.init(rng, mel)["params"]
    d_params = {
        "mpd": mpd.init(jax.random.fold_in(rng, 1), wave, wave)["params"],
        "msd": msd.init(jax.random.fold_in(rng, 2), wave, wave)["params"],
    }
    return TrainState(params=params, opt_state=tx_g.init(params),
                      step=jnp.asarray(0), d_params=d_params,
                      d_opt_state=tx_d.init(d_params))


def _logmel(wave: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """[B, S] waveform -> [B, S/hop, n_mels] log-mel (generator layout)."""
    return log_mel_spectrogram(wave, cfg).transpose(0, 2, 1)


def make_hifigan_train_step(gen, mpd: MultiPeriodDiscriminator,
                            msd: MultiScaleDiscriminator, tx_g, tx_d, *,
                            mel_cfg: Optional[MelConfig] = None,
                            mel_weight: float = 45.0):
    """Returns step(state, batch, rng) -> (state, meta); `batch` comes
    from `data.collate_vocoder` ({"wave": [B, S]} float32 in [-1, 1])."""
    cfg = mel_cfg or MelConfig()

    def step(state: TrainState, batch, rng):
        del rng  # no stochastic layers in the HiFi-GAN recipe
        wave = batch["wave"]
        mel_in = _logmel(wave, cfg)
        y_hat_ng = jax.lax.stop_gradient(
            gen.apply({"params": state.params}, mel_in))

        def d_loss_fn(d_params):
            s_r, s_g, _, _ = mpd.apply({"params": d_params["mpd"]},
                                       wave, y_hat_ng)
            loss_f, _, _ = discriminator_loss(s_r, s_g)
            s_r, s_g, _, _ = msd.apply({"params": d_params["msd"]},
                                       wave, y_hat_ng)
            loss_s, _, _ = discriminator_loss(s_r, s_g)
            return loss_f + loss_s, (loss_f, loss_s)

        (loss_d, (ld_f, ld_s)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_up, d_opt_state = tx_d.update(d_grads, state.d_opt_state,
                                        state.d_params)
        d_params = optax.apply_updates(state.d_params, d_up)

        def g_loss_fn(params):
            y_hat = gen.apply({"params": params}, mel_in)
            l_mel = jnp.mean(jnp.abs(_logmel(y_hat, cfg) - mel_in))
            _, s_g, f_r, f_g = mpd.apply({"params": d_params["mpd"]},
                                         wave, y_hat)
            adv_f, _ = generator_loss(s_g)
            fm_f = feature_loss(f_r, f_g)
            _, s_g, f_r, f_g = msd.apply({"params": d_params["msd"]},
                                         wave, y_hat)
            adv_s, _ = generator_loss(s_g)
            fm_s = feature_loss(f_r, f_g)
            loss = adv_f + adv_s + fm_f + fm_s + mel_weight * l_mel
            return loss, {"mel_loss": l_mel, "gen_adv_loss": adv_f + adv_s,
                          "feat_loss": fm_f + fm_s}

        (loss_g, meta), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.params)
        up, opt_state = tx_g.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, up)

        meta.update(loss=loss_g, loss_d=loss_d, d_mpd_loss=ld_f,
                    d_msd_loss=ld_s)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1, d_params=d_params,
                             d_opt_state=d_opt_state), meta

    return step


def make_hifigan_eval_step(gen, mel_cfg: Optional[MelConfig] = None):
    """Validation: log-mel L1 of the resynthesized waveform (upstream's
    validation metric). Returns (meta, None) — no TB figures."""
    cfg = mel_cfg or MelConfig()

    def eval_step(state: TrainState, batch, rng):
        del rng
        mel_in = _logmel(batch["wave"], cfg)
        y_hat = gen.apply({"params": state.params}, mel_in)
        l_mel = jnp.mean(jnp.abs(_logmel(y_hat, cfg) - mel_in))
        return {"loss": l_mel, "mel_loss": l_mel}, None

    return eval_step
