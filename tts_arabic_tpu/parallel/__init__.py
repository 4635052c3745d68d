"""Parallelism: mesh construction, sharding policy, DP helpers."""
from .mesh import (DATA_AXIS, batch_sharded, data_parallel_jit,
                   local_batch_size, make_mesh, mesh_context,
                   pad_batch_to_devices, replicate, replicated, shard_batch)

__all__ = [
    "DATA_AXIS", "batch_sharded", "data_parallel_jit", "local_batch_size",
    "make_mesh", "mesh_context", "pad_batch_to_devices", "replicate",
    "replicated", "shard_batch",
]
