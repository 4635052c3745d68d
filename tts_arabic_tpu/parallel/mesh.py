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


SEQ_AXIS = "seq"


def make_mesh_2d(n_data: int, n_seq: int, devices=None) -> Mesh:
    """2-D (data × seq) mesh: batch rows sharded over `data`, and within
    each row-group one utterance's time axis sharded over `seq`
    (`sp.sp_vocode(..., axis=SEQ_AXIS)`). `seq` is the fast (minor) axis so
    its halo ppermutes ride adjacent-chip ICI links."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_data * n_seq:
        raise ValueError(
            f"make_mesh_2d({n_data}, {n_seq}) needs "
            f"{n_data * n_seq} devices, got {len(devices)}")
    devices = np.asarray(devices[: n_data * n_seq])
    return Mesh(devices.reshape(n_data, n_seq), (DATA_AXIS, SEQ_AXIS))


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


# --- multi-process (multi-host / DCN) path ---------------------------------
#
# A TPU pod slice spans several hosts: each process sees only its local
# chips, and cross-host traffic rides DCN while intra-slice traffic rides
# ICI. The reference has nothing here (single GPU); the TPU-native design
# is: initialize the jax distributed runtime once per process, build ONE
# global mesh over every process's devices, keep params replicated, and
# feed each process only its local batch rows
# (`jax.make_array_from_process_local_data` assembles the global sharded
# array without any host gathering). The same `data_parallel_jit` step then
# runs unmodified — XLA routes the gradient psum over ICI within a host and
# DCN across hosts.

def init_multiprocess(coordinator_address: str | None = None,
                      num_processes: int | None = None,
                      process_id: int | None = None) -> None:
    """Initialize the cross-process runtime (call once per process, before
    any other jax call). On Cloud TPU pods all arguments are auto-detected
    from the environment; pass them explicitly for CPU/GPU clusters or
    tests (e.g. coordinator '127.0.0.1:<port>')."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_multiprocess_mesh() -> Mesh:
    """Global 1-D data-parallel mesh over EVERY process's devices (requires
    `init_multiprocess` first). Devices are ordered process-major, so
    contiguous batch rows land on one host and the batch axis crosses DCN
    only at host boundaries."""
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def process_local_rows(global_batch: int, mesh: Mesh) -> slice:
    """The slice of global batch rows this process must supply to
    `shard_batch_from_process_local` (rows are laid out process-major to
    match `make_multiprocess_mesh`)."""
    n_proc = jax.process_count()
    if global_batch % n_proc:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"process count {n_proc}")
    per = global_batch // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def shard_batch_from_process_local(local_batch, mesh: Mesh):
    """Multi-host input sharding: each process passes ONLY its local rows
    (a pytree of [B_local, ...] arrays); returns global jax.Arrays whose
    leading axis is sharded over the full mesh, with zero cross-host data
    movement (each host's rows stay on its own chips). Single-process
    meshes degenerate to `shard_batch`."""
    sharding = batch_sharded(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), local_batch)


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
