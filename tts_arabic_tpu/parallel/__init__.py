"""Parallelism: mesh construction, sharding policy, DP helpers
(single-process ICI and multi-process DCN), and sequence-parallel ops."""
from .mesh import (DATA_AXIS, SEQ_AXIS, make_mesh_2d, batch_sharded, data_parallel_jit,
                   init_multiprocess, local_batch_size, make_mesh,
                   make_multiprocess_mesh, mesh_context,
                   pad_batch_to_devices, process_local_rows, replicate,
                   replicated, shard_batch, shard_batch_from_process_local)
from .sp import sp_vocode
from .tp import (MODEL_AXIS, fastpitch_tp_shardings, make_mesh_dp_tp,
                 tp_mel_infer_jit)

__all__ = [
    "DATA_AXIS", "SEQ_AXIS", "MODEL_AXIS", "make_mesh_2d", "batch_sharded",
    "data_parallel_jit", "init_multiprocess",
    "local_batch_size", "make_mesh", "make_mesh_dp_tp",
    "make_multiprocess_mesh",
    "mesh_context", "pad_batch_to_devices", "process_local_rows",
    "replicate", "replicated", "shard_batch",
    "shard_batch_from_process_local", "sp_vocode",
    "fastpitch_tp_shardings", "tp_mel_infer_jit",
]
