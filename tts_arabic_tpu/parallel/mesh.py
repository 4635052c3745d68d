"""Device mesh and sharding policy.

The reference is single-GPU (SURVEY.md §2.10 — no torch.distributed anywhere);
here multi-chip scaling is a first-class axis. The models are small (~46M
params) and sequences short, so the right decomposition is pure data
parallelism over ICI: batch-sharded training with psum gradient reduction,
and embarrassingly-parallel batched synthesis at inference. All sharding
decisions are centralized in this module so the single-chip path is just the
degenerate 1-device mesh.
"""
from __future__ import annotations

import contextlib
from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, n_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of [B, ...] arrays with the batch axis split over the
    mesh (host->device transfer happens here, once per step)."""
    sharding = batch_sharded(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_jit(step_fn, mesh: Mesh, donate_argnums=()):
    """jit a train/eval step for data-parallel execution: params replicated,
    batch sharded on its leading axis, outputs replicated. XLA inserts the
    psum for any cross-batch reduction inside `step_fn` (e.g. the mean loss
    and its gradients)."""
    return jax.jit(
        step_fn,
        in_shardings=(replicated(mesh), batch_sharded(mesh)),
        out_shardings=replicated(mesh),
        donate_argnums=donate_argnums,
    )


@contextlib.contextmanager
def mesh_context(mesh: Mesh):
    with mesh:
        yield mesh


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.devices.size
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by mesh size {n}"
        )
    return global_batch // n


def pad_batch_to_devices(batch, mesh: Mesh):
    """Pad the leading axis of every array so it divides the mesh size
    (needed for ragged final batches at inference)."""
    n = mesh.devices.size

    def _pad(x):
        b = x.shape[0]
        rem = (-b) % n
        if rem == 0:
            return x
        pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), pad_width)

    return jax.tree.map(_pad, batch)
