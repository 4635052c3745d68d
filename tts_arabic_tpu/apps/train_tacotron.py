"""Tacotron2 training CLI (reference `scripts/train_tc2.py` /
`scripts/train_tc2_adv.py` equivalents).

    python -m tts_arabic_tpu.apps.train_tacotron --config configs/nawar_tc2.yaml
    python -m tts_arabic_tpu.apps.train_tacotron --config configs/nawar_tc2_adv.yaml --adv

Long batches over `max_frames` frames are truncated to
`truncated_batch_size` samples (train_tc2.py:100-113 behavior).
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..data import ArabDataset, collate_tacotron
from ..models.tacotron2 import Tacotron2, Tacotron2Config
from ..parallel import make_mesh
from ..runtime.cache import enable_compilation_cache
from ..runtime.config import get_config
from ..train.gan import PatchDiscriminator
from ..train.steps import (TrainState, make_optimizer,
                           make_tacotron_eval_step, make_tacotron_train_step)
from ..train.trainer import Trainer


class _BatchedView:
    """Fixed-size batches over an ArabDataset with per-epoch shuffling and
    the reference's long-batch truncation."""

    def __init__(self, ds, batch_size, max_frames=2000, truncated=6, seed=0,
                 sampler=None):
        self.ds = ds
        self.bs = batch_size
        self.max_frames = max_frames
        self.truncated = truncated
        self.rng = np.random.default_rng(seed)
        self.sampler = sampler  # balanced sampling (reference train.py:150)
        self.order = np.arange(len(ds))
        self.shuffle()

    def shuffle(self):
        if self.sampler is not None:
            self.order = self.sampler.sample()
        else:
            self.rng.shuffle(self.order)

    def __len__(self):
        return (len(self.ds) + self.bs - 1) // self.bs

    def __getitem__(self, i):
        ids = self.order[i * self.bs: (i + 1) * self.bs]
        items = [self.ds[j] for j in ids]
        longest = max(m.shape[1] for _, m in items)
        if longest > self.max_frames:
            items = items[: self.truncated]
        return items


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/nawar_tc2.yaml")
    parser.add_argument("--adv", action="store_true")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--no-mesh", action="store_true")
    args = parser.parse_args(argv)

    enable_compilation_cache()
    config = get_config(args.config)

    dataset = ArabDataset(config.train_labels, config.train_wavs_path,
                          label_pattern=config.label_pattern,
                          cache=config.get("cache_dataset", False))
    sampler = None
    if config.get("balanced_sampling"):
        from ..data import WeightedSampler
        sampler = WeightedSampler.from_file(
            config.get_path("sampler_weights_file"))
    batches = _BatchedView(dataset, config.batch_size,
                           max_frames=config.get("max_frames", 2000),
                           truncated=config.get("truncated_batch_size", 6),
                           sampler=sampler)

    model_config = Tacotron2Config(
        decoder_max_step=config.get("decoder_max_step", 2000))
    model = Tacotron2(model_config)
    sample = collate_tacotron(batches[0])
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(sample["tokens"][:1]),
        jnp.asarray(sample["token_lens"][:1]),
        jnp.asarray(sample["mel_tgt"][:1]),
        jnp.asarray(sample["mel_lens"][:1]))

    tx = make_optimizer(config.g_lr, config.g_beta1, config.g_beta2,
                        config.get("weight_decay", 1e-6),
                        grad_clip=config.get("grad_clip_thresh", 1.0))
    state_kw = dict(params=variables["params"],
                    opt_state=tx.init(variables["params"]),
                    step=jnp.asarray(0), extra=variables["batch_stats"])

    critic = tx_d = None
    if args.adv:
        critic = PatchDiscriminator(32)
        d_vars = critic.init({"params": jax.random.PRNGKey(1)},
                             jnp.zeros((1, 128, model_config.n_mels, 1)))
        tx_d = make_optimizer(config.d_lr, config.d_beta1, config.d_beta2,
                              config.get("weight_decay", 1e-6))
        state_kw.update(d_params=d_vars["params"],
                        d_opt_state=tx_d.init(d_vars["params"]),
                        d_spectral=d_vars["spectral"])
    state = TrainState(**state_kw)

    step_fn = make_tacotron_train_step(
        model, tx, critic=critic, tx_d=tx_d,
        gan_loss_weight=config.get("gan_loss_weight", 4.0),
        feat_loss_weight=config.get("feat_loss_weight", 1.0))

    mesh = None if args.no_mesh or len(jax.devices()) == 1 else make_mesh()
    trainer = Trainer(step_fn, state, log_dir=config.log_dir,
                      checkpoint_dir=config.checkpoint_dir,
                      n_save_states_iter=config.n_save_states_iter,
                      n_save_backup_iter=config.n_save_backup_iter,
                      mesh=mesh, net_config=model_config.__dict__)
    if config.get("restore_model"):
        trainer.restore(config.get_path("restore_model"))

    # per-epoch validation on the held-out split
    val_batches = eval_fn = None
    if config.get("test_labels"):
        val_dataset = ArabDataset(
            config.test_labels,
            config.get("test_wavs_path") or config.train_wavs_path,
            label_pattern=config.label_pattern)
        if len(val_dataset):
            val_batches = _BatchedView(
                val_dataset, config.batch_size,
                max_frames=config.get("max_frames", 2000),
                truncated=config.get("truncated_batch_size", 6))
            eval_fn = make_tacotron_eval_step(model)

    trainer.fit(batches, collate_tacotron,
                epochs=args.epochs or config.epochs,
                val_dataset=val_batches, eval_fn=eval_fn)


if __name__ == "__main__":
    main()
