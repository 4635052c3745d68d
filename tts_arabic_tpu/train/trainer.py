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
        self.state = self.state.replace(**restored)
        return st["step"]

    def save(self, step, epoch):
        trees = {"model": self.state.params,
                 "optim": self.state.opt_state}
        if self.state.d_params is not None:
            trees["model_d"] = self.state.d_params
            trees["optim_d"] = self.state.d_opt_state
        if self.state.extra is not None:
            trees["batch_stats"] = self.state.extra
        return self.ckpt.maybe_save(step, epoch=epoch,
                                    config={"net_config": self.net_config},
                                    **trees)

    def fit(self, dataset, collate_fn, epochs: int, start_epoch: int = 0,
            log_every: int = 10, on_epoch_end=None):
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
            if on_epoch_end is not None:
                on_epoch_end(self, epoch)
        self.save(step, epochs)
        return self.state
