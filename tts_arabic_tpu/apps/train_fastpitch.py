"""FastPitch training CLI (reference `scripts/train_fp.py` /
`scripts/train_fp_adv.py` equivalents).

    python -m tts_arabic_tpu.apps.train_fastpitch --config configs/nawar_fp.yaml
    python -m tts_arabic_tpu.apps.train_fastpitch --config configs/nawar_fp_adv.yaml --adv

Data parallelism: runs over all visible devices via a 1-D mesh (single chip
is the degenerate case).
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import ArabDatasetFastPitch, DynBatchDataset, collate_fastpitch
from ..models.fastpitch import FastPitch, FastPitchConfig
from ..parallel import make_mesh
from ..runtime.cache import enable_compilation_cache
from ..runtime.config import get_config
from ..train.gan import PatchDiscriminator
from ..train.steps import (TrainState, make_fastpitch_eval_step,
                           make_fastpitch_train_step, make_optimizer)
from ..train.trainer import Trainer


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/nawar_fp.yaml")
    parser.add_argument("--adv", action="store_true",
                        help="adversarial training (PatchDiscriminator)")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--no-mesh", action="store_true")
    args = parser.parse_args(argv)

    enable_compilation_cache()
    config = get_config(args.config)

    f0_path = (config.get_path("f0_dict_path")
               if config.get("f0_dict_path") else None)
    if f0_path is not None and not f0_path.is_file():
        f0_path = None
    dataset = ArabDatasetFastPitch(
        config.train_labels, config.train_wavs_path,
        label_pattern=config.label_pattern,
        f0_dict_path=f0_path,
        f0_mean=config.f0_mean, f0_std=config.f0_std,
        cache=config.get("cache_dataset", False))
    dyn = DynBatchDataset(dataset, max_lengths=config.max_lengths,
                          batch_sizes=config.batch_sizes)

    model_config = FastPitchConfig()
    model = FastPitch(model_config)
    rng = jax.random.PRNGKey(config.get("random_seed", 0) or 0)
    sample = collate_fastpitch(dyn[0])
    variables = model.init(
        rng, jnp.asarray(sample["tokens"][:1]),
        jnp.asarray(sample["token_lens"][:1]),
        jnp.asarray(sample["mel_tgt"][:1]),
        jnp.asarray(sample["mel_lens"][:1]),
        jnp.asarray(sample["pitch_dense"][:1]),
        jnp.asarray(sample["energy_dense"][:1]),
        jnp.asarray(sample["attn_prior"][:1]),
        jnp.asarray(sample["tokens"][:1].astype(np.float32) * 0),
        deterministic=True, method=FastPitch.forward_train)
    params = variables["params"]
    # store corpus pitch stats in the weights (model.py:213-214 analogue)
    params["pitch_mean"] = jnp.asarray([config.f0_mean], jnp.float32)
    params["pitch_std"] = jnp.asarray([config.f0_std], jnp.float32)

    tx = make_optimizer(config.g_lr, config.g_beta1, config.g_beta2,
                        config.get("weight_decay", 1e-6), grad_clip=1000.0)
    state_kw = dict(params=params, opt_state=tx.init(params),
                    step=jnp.asarray(0))

    critic = tx_d = None
    if args.adv:
        critic = PatchDiscriminator(32)
        d_vars = critic.init(
            {"params": jax.random.PRNGKey(1)},
            jnp.zeros((1, 128, model_config.n_mel_channels, 1)))
        tx_d = make_optimizer(config.d_lr, config.d_beta1, config.d_beta2,
                              config.get("weight_decay", 1e-6),
                              grad_clip=1000.0)
        state_kw.update(d_params=d_vars["params"],
                        d_opt_state=tx_d.init(d_vars["params"]),
                        d_spectral=d_vars["spectral"])
    state = TrainState(**state_kw)

    step_fn = make_fastpitch_train_step(
        model, tx, critic=critic, tx_d=tx_d,
        gan_loss_weight=config.get("gan_loss_weight", 3.0),
        feat_loss_weight=config.get("feat_loss_weight", 1.0))

    mesh = None if args.no_mesh or len(jax.devices()) == 1 else make_mesh()
    trainer = Trainer(step_fn, state, log_dir=config.log_dir,
                      checkpoint_dir=config.checkpoint_dir,
                      n_save_states_iter=config.n_save_states_iter,
                      n_save_backup_iter=config.n_save_backup_iter,
                      mesh=mesh, net_config=model_config.__dict__)
    if config.get("restore_model"):
        trainer.restore(config.get_path("restore_model"))

    # per-epoch validation on the held-out split (reference validate(),
    # train.py:19-58 — disabled in its live scripts; here it is on)
    val_dyn = eval_fn = None
    if config.get("test_labels"):
        val_dataset = ArabDatasetFastPitch(
            config.test_labels,
            config.get("test_wavs_path") or config.train_wavs_path,
            label_pattern=config.label_pattern,
            f0_dict_path=f0_path,
            f0_mean=config.f0_mean, f0_std=config.f0_std)
        if len(val_dataset):
            val_dyn = DynBatchDataset(val_dataset,
                                      max_lengths=config.max_lengths,
                                      batch_sizes=config.batch_sizes)
            eval_fn = make_fastpitch_eval_step(model)

    trainer.fit(dyn, collate_fastpitch, epochs=args.epochs or config.epochs,
                val_dataset=val_dyn, eval_fn=eval_fn)


if __name__ == "__main__":
    main()
