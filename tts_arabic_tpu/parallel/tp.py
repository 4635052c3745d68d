"""Tensor (model) parallelism for the FFT stacks.

Data parallelism is this model family's primary decomposition (~46M
params fit on any chip — see `mesh.py`); TP exists for the
latency-bound serving regime the DP axis cannot help: ONE utterance
(batch too small to split) where the encoder/decoder FFN contractions
dominate and splitting them across chips divides the per-layer matmul
time. The reference has no parallelism at all (single GPU,
SURVEY.md §2.10) — this axis is TPU-native headroom.

Design: Megatron-style column/row parallel pair on each ConvFFN
(`models/layers.py::ConvFFN`, reference `PositionwiseConvFF`
transformer.py:51-90):

  conv1 kernel [k, d_model, d_inner]  -> sharded on d_inner (column)
  conv1 bias                [d_inner] -> sharded
  conv2 kernel [k, d_inner, d_model]  -> sharded on d_inner (row,
                                         the contracting dim)

so each chip computes a full-depth slice of the hidden activation and
GSPMD inserts exactly ONE all-reduce per FFN block (after conv2's
partial sums) with NO activation resharding between the two convs —
the hidden [B, T, d_inner/n] tensor never moves. Everything else
(attention, embeddings, predictors, norms) is replicated: the
reference config runs single-head d_head=64 attention
(`FastPitchConfig.enc_n_heads=1`), so there is nothing worth splitting
there, and the FFN is where the FLOPs are (d_inner=1536 = 4x d_model).

Sharding is expressed purely as `NamedSharding` annotations on the
params pytree + jit in_shardings; XLA/GSPMD partitions the einsums and
places the collectives on ICI. Composes with DP on a 2-D
('data', 'model') mesh: batch rows over 'data', every FFN contraction
over 'model'.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

MODEL_AXIS = "model"

__all__ = ["MODEL_AXIS", "make_mesh_dp_tp", "fastpitch_tp_shardings",
           "tp_mel_infer_jit"]


def make_mesh_dp_tp(n_data: int, n_model: int, devices=None) -> Mesh:
    """2-D (data x model) mesh: batch rows sharded over `data`, FFN
    contractions sharded over `model`. `model` is the fast (minor) axis
    so each FFN all-reduce rides adjacent-chip ICI links."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_data * n_model:
        raise ValueError(
            f"make_mesh_dp_tp({n_data}, {n_model}) needs "
            f"{n_data * n_model} devices, got {len(devices)}")
    devices = np.asarray(devices[: n_data * n_model])
    return Mesh(devices.reshape(n_data, n_model), (DATA_AXIS, MODEL_AXIS))


def fastpitch_tp_shardings(variables, mesh: Mesh):
    """NamedSharding pytree for a FastPitch `variables` tree: ConvFFN
    conv1/conv2 split over `model` as documented above, everything else
    replicated. d_inner need not divide the axis size (GSPMD pads), but
    even splits (1536 % n == 0 for n in {2,4,8,16}) avoid waste."""

    def spec(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        # require 'ff' to be conv1/conv2's DIRECT parent so only the
        # FFT-block ConvFFN params match (a nested module containing an
        # 'ff' component further up must not get sharded by accident)
        if len(names) >= 3 and names[-3] == "ff":
            mod, param = names[-2], names[-1]
            if mod == "conv1" and param == "kernel":
                return P(None, None, MODEL_AXIS)
            if mod == "conv1" and param == "bias":
                return P(MODEL_AXIS)
            if mod == "conv2" and param == "kernel":
                return P(None, MODEL_AXIS, None)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec(path, leaf)), variables)


def tp_mel_infer_jit(model, variables, mesh: Mesh, max_frames: int = 256):
    """jit the full FastPitch mel-infer under DP x TP sharding.

    Returns (jitted_fn, sharded_variables): call
    `jitted_fn(sharded_variables, tokens)` with tokens [B, T] (B a
    multiple of the 'data' axis size). Params enter pre-placed per
    `fastpitch_tp_shardings` (the device_put here is the one-time
    weight distribution), the batch is sharded over 'data', and the
    mel comes back replicated."""
    from tts_arabic_tpu.models.fastpitch import FastPitch

    shardings = fastpitch_tp_shardings(variables, mesh)
    sharded_vars = jax.tree.map(jax.device_put, variables, shardings)

    def fwd(v, tokens):
        out = model.apply(v, tokens, max_frames=max_frames,
                          method=FastPitch.infer)
        return out["mel"], out["mel_lens"]

    fn = jax.jit(
        fwd,
        in_shardings=(shardings, NamedSharding(mesh, P(DATA_AXIS))),
        out_shardings=NamedSharding(mesh, P()),
    )
    return fn, sharded_vars
