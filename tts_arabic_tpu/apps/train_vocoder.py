"""HiFi-GAN vocoder adversarial training / fine-tuning CLI.

    python -m tts_arabic_tpu.apps.train_vocoder --config configs/hifigan_ft.yaml

The reference repo ships its vocoder pretrained and carries the MPD/MSD
discriminators without a trainer (`vocoder/hifigan/models.py:139-293`,
SURVEY.md §2.6); this CLI completes that surface with the published
HiFi-GAN recipe (LSGAN + feature matching + 45x log-mel L1, AdamW(0.8,
0.99), per-epoch lr decay) as one jitted D->G step. Fine-tuning: when
`vocoder_state_path` points at a `.pth`, the generator warm-starts from
it (discriminators start fresh — the reference publishes no
discriminator weights). Data parallelism: same 1-D mesh as the other
trainers (single chip is the degenerate case).
"""
from __future__ import annotations

import argparse

import jax
import optax

from ..data import VocoderSegmentDataset, collate_vocoder
from ..parallel import make_mesh
from ..runtime.cache import enable_compilation_cache
from ..runtime.config import get_config
from ..train.trainer import Trainer
from ..train.vocoder import (init_vocoder_state, make_hifigan_eval_step,
                             make_hifigan_train_step)
from ..vocoder.discriminators import (MultiPeriodDiscriminator,
                                      MultiScaleDiscriminator)
from ..vocoder.hifigan import Generator, HiFiGANConfig


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/hifigan_ft.yaml")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--no-mesh", action="store_true")
    parser.add_argument("--from-scratch", action="store_true",
                        help="skip the vocoder_state_path warm start")
    args = parser.parse_args(argv)

    enable_compilation_cache()
    config = get_config(args.config)

    dataset = VocoderSegmentDataset(
        config.train_labels, config.train_wavs_path,
        label_pattern=config.label_pattern,
        segment_length=config.get("segment_length", 8192),
        batch_size=config.get("batch_size", 16),
        seed=config.get("random_seed", 0) or 0,
        cache=config.get("cache_dataset", False))

    vc_path = (config.get_path("vocoder_config_path")
               if config.get("vocoder_config_path") else None)
    gen_config = (HiFiGANConfig.from_json(vc_path)
                  if vc_path is not None and vc_path.is_file()
                  else HiFiGANConfig())
    gen = Generator(gen_config)
    # discriminator size knobs (defaults = published recipe; tests and
    # small-data fine-tunes can shrink them)
    mpd = MultiPeriodDiscriminator(
        periods=tuple(config.get("mpd_periods", (2, 3, 5, 7, 11))),
        width=config.get("disc_width", 1.0))
    msd = MultiScaleDiscriminator(n_scales=config.get("msd_scales", 3),
                                  width=config.get("disc_width", 1.0))

    # per-epoch exponential lr decay (upstream ExponentialLR gamma)
    def lr_sched(base):
        decay = config.get("lr_decay", 1.0)
        if decay == 1.0:
            return base
        return optax.exponential_decay(base, transition_steps=len(dataset),
                                       decay_rate=decay, staircase=True)

    def adamw(base, b1, b2):
        return optax.chain(
            optax.clip_by_global_norm(1000.0),
            optax.adamw(lr_sched(base), b1=b1, b2=b2, weight_decay=0.01))

    tx_g = adamw(config.g_lr, config.g_beta1, config.g_beta2)
    tx_d = adamw(config.d_lr, config.d_beta1, config.d_beta2)
    state = init_vocoder_state(gen, mpd, msd, tx_g, tx_d,
                               config.get("segment_length", 8192),
                               seed=config.get("random_seed", 0) or 0)

    vs_path = (config.get_path("vocoder_state_path")
               if config.get("vocoder_state_path") else None)
    if not args.from_scratch and vs_path is not None and vs_path.is_file():
        from ..models.torch_import import hifigan_params_from_torch
        from ..runtime.checkpoint import load_torch_state_dict
        sd = load_torch_state_dict(vs_path)
        sd.pop("__extras__", None)
        params = hifigan_params_from_torch(sd, gen_config)
        state = state.replace(params=params, opt_state=tx_g.init(params))
        print(f"warm-started generator from {vs_path}")

    step_fn = make_hifigan_train_step(
        gen, mpd, msd, tx_g, tx_d,
        mel_weight=config.get("mel_loss_weight", 45.0))

    mesh = None if args.no_mesh or len(jax.devices()) == 1 else make_mesh()
    trainer = Trainer(step_fn, state, log_dir=config.log_dir,
                      checkpoint_dir=config.checkpoint_dir,
                      n_save_states_iter=config.n_save_states_iter,
                      n_save_backup_iter=config.n_save_backup_iter,
                      mesh=mesh, net_config=gen_config.__dict__)
    if config.get("restore_model"):
        trainer.restore(config.get_path("restore_model"))

    val_ds = eval_fn = None
    if config.get("test_labels"):
        try:
            val_ds = VocoderSegmentDataset(
                config.test_labels,
                config.get("test_wavs_path") or config.train_wavs_path,
                label_pattern=config.label_pattern,
                segment_length=config.get("segment_length", 8192),
                batch_size=config.get("batch_size", 16),
                seed=1)
            eval_fn = make_hifigan_eval_step(gen)
        except ValueError:
            val_ds = None  # no usable held-out wavs

    trainer.fit(dataset, collate_vocoder,
                epochs=args.epochs or config.epochs,
                val_dataset=val_ds, eval_fn=eval_fn)


if __name__ == "__main__":
    main()
