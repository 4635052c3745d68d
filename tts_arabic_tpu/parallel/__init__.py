"""Parallelism: mesh construction, sharding policy, DP helpers
(single-process ICI and multi-process DCN), and sequence-parallel ops."""
from .mesh import (DATA_AXIS, SEQ_AXIS, make_mesh_2d, batch_sharded, data_parallel_jit,
                   init_multiprocess, local_batch_size, make_mesh,
                   make_multiprocess_mesh, mesh_context,
                   pad_batch_to_devices, process_local_rows, replicate,
                   replicated, shard_batch, shard_batch_from_process_local)
from .sp import sp_vocode

__all__ = [
    "DATA_AXIS", "SEQ_AXIS", "make_mesh_2d", "batch_sharded", "data_parallel_jit", "init_multiprocess",
    "local_batch_size", "make_mesh", "make_multiprocess_mesh",
    "mesh_context", "pad_batch_to_devices", "process_local_rows",
    "replicate", "replicated", "shard_batch",
    "shard_batch_from_process_local", "sp_vocode",
]
