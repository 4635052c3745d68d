"""Training loops (driver equivalents of the reference's
`scripts/train_{fp,fp_adv,tc2,tc2_adv}.py`).

One `Trainer` orchestrates: dataset shuffle per epoch, host->device batch
transfer (sharded over the mesh when one is given), the jitted train step,
metric logging (TB + JSONL), and checkpoint cadence (overwrite `states.ckpt`
every `n_save_states_iter`, versioned backup every `n_save_backup_iter` —
matching configs/nawar_fp.yaml:34-35).
"""
from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import make_mesh, replicate, shard_batch, data_parallel_jit
from ..runtime.checkpoint import CheckpointManager, load_states
from ..runtime.logging import MetricLogger


class Trainer:
    def __init__(self, step_fn: Callable, state, *, log_dir, checkpoint_dir,
                 n_save_states_iter: int = 100, n_save_backup_iter: int = 1000,
                 mesh=None, seed: int = 0, net_config: Optional[dict] = None):
        self.mesh = mesh
        if mesh is not None:
            self.step_fn = data_parallel_jit(step_fn, mesh, donate_argnums=(0,))
            state = replicate(state, mesh)
        else:
            self.step_fn = jax.jit(step_fn, donate_argnums=(0,))
        self.state = state
        self.rng = jax.random.PRNGKey(seed)
        self.logger = MetricLogger(log_dir)
        self.ckpt = CheckpointManager(checkpoint_dir, n_save_states_iter,
                                      n_save_backup_iter)
        self.net_config = net_config or {}

    def _put(self, batch):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh)
        return batch

    def restore(self, path=None):
        from flax import serialization
        path = path or self.ckpt.latest()
        if path is None:
            return 0
        st = load_states(path)
        restored = {
            "params": st["model"],
            "step": jnp.asarray(st["step"]),
        }
        if "optim" in st:
            restored["opt_state"] = serialization.from_state_dict(
                self.state.opt_state, st["optim"])
        if st.get("model_d") is not None and self.state.d_params is not None:
            restored["d_params"] = st["model_d"]
            if "optim_d" in st:
                restored["d_opt_state"] = serialization.from_state_dict(
                    self.state.d_opt_state, st["optim_d"])
        if st.get("batch_stats") is not None:
            restored["extra"] = st["batch_stats"]
        if (st.get("spectral_d") is not None
                and self.state.d_spectral is not None):
            # power-iteration u/v vectors (the reference checkpoints carry
            # them as torch buffers inside model_d); re-converging from
            # random costs a few steps, carrying them is exact
            restored["d_spectral"] = st["spectral_d"]
        self.state = self.state.replace(**restored)
        return st["step"]

    def save(self, step, epoch):
        trees = {"model": self.state.params,
                 "optim": self.state.opt_state}
        if self.state.d_params is not None:
            trees["model_d"] = self.state.d_params
            trees["optim_d"] = self.state.d_opt_state
        if self.state.d_spectral is not None:
            trees["spectral_d"] = self.state.d_spectral
        if self.state.extra is not None:
            trees["batch_stats"] = self.state.extra
        return self.ckpt.maybe_save(step, epoch=epoch,
                                    config={"net_config": self.net_config},
                                    **trees)

    def validate(self, val_dataset, collate_fn, eval_fn, step: int,
                 figures: bool = True):
        """Run the eval step over a validation set, log mean `val/` scalars
        and (optionally) alignment + mel figures for the first sample
        (reference `validate()`, train.py:19-58). `eval_fn(state, batch,
        rng) -> (meta, artifacts)` — see `make_*_eval_step`."""
        if not hasattr(self, "_eval_jit") or self._eval_fn is not eval_fn:
            self._eval_fn = eval_fn
            self._eval_jit = jax.jit(eval_fn)
        sums, n = {}, 0
        first_artifacts = None
        for b_idx in range(len(val_dataset)):
            batch = collate_fn(val_dataset[b_idx])
            b = int(next(iter(batch.values())).shape[0])
            meta, artifacts = self._eval_jit(self.state, self._put(batch),
                                             self.rng)
            if first_artifacts is None:
                first_artifacts = jax.device_get(artifacts)
            meta = jax.device_get(meta)  # one sync per batch, not per key
            for k, v in meta.items():
                # weight by batch size: ragged final/truncated batches must
                # not count like full ones
                sums[k] = sums.get(k, 0.0) + float(v) * b
            n += b
        means = {k: v / max(n, 1) for k, v in sums.items()}
        self.logger.log_scalars(step, means, prefix="val/")
        if figures and first_artifacts is not None:
            a = first_artifacts
            self.logger.log_alignment_and_mels(
                step,
                alignment=np.asarray(a["alignment"])[0].T,
                mel_pred=np.asarray(a["mel_pred"])[0].T,
                mel_target=np.asarray(a["mel_tgt"])[0].T)
        print(f"validation @ step {step}: "
              f"loss {means.get('loss', float('nan')):.4f} ({n} batches)")
        return means

    def fit(self, dataset, collate_fn, epochs: int, start_epoch: int = 0,
            log_every: int = 10, on_epoch_end=None,
            val_dataset=None, val_collate_fn=None, eval_fn=None):
        """dataset yields whole batches (DynBatchDataset style)."""
        step = int(np.asarray(jax.device_get(self.state.step)))
        for epoch in range(start_epoch, epochs):
            if hasattr(dataset, "shuffle"):
                dataset.shuffle()
            for b_idx in range(len(dataset)):
                batch = collate_fn(dataset[b_idx])
                t0 = time.perf_counter()
                self.state, meta = self.step_fn(self.state, self._put(batch),
                                                self.rng)
                if step % log_every == 0:
                    meta_host = {k: float(np.asarray(v))
                                 for k, v in meta.items()}
                    meta_host["step_time"] = time.perf_counter() - t0
                    self.logger.log_scalars(step, meta_host, prefix="train/")
                    print(f"epoch {epoch} step {step} "
                          f"loss {meta_host.get('loss', 0):.4f}")
                self.save(step, epoch)
                step += 1
            if val_dataset is not None and eval_fn is not None:
                self.validate(val_dataset, val_collate_fn or collate_fn,
                              eval_fn, step)
            if on_epoch_end is not None:
                on_epoch_end(self, epoch)
        self.save(step, epochs)
        return self.state
