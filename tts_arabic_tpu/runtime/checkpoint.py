"""Checkpointing: single-file pytree checkpoints + PyTorch .pth import.

Mirrors the reference's checkpoint capability surface
(`utils/training.py:6-31`): one file holding
{model, optim, epoch, iter, config(, model_d, optim_d)}, written at a
states/backup cadence, restorable key-by-key — plus an importer that maps
reference PyTorch checkpoints into our parameter pytrees for parity testing
(SURVEY.md §5 checkpoint/resume).

Format: msgpack via flax.serialization for arrays; JSON for metadata. A
checkpoint is one file, so the UX matches `torch.save`'s single `.pth`.
"""
from __future__ import annotations

import json
import os
import pathlib
from typing import Any

import jax
import numpy as np
from flax import serialization

_META_KEY = "__meta__"


def _to_numpy(tree):
    # to_state_dict converts namedtuple-based structures (optax states,
    # flax structs) into plain serializable dicts
    tree = serialization.to_state_dict(tree)
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_states(path, step: int = 0, epoch: int = 0, config: dict | None = None,
                **trees) -> None:
    """Write a single-file checkpoint.

    `trees` are named array pytrees (e.g. model=..., optim=..., model_d=...).
    """
    payload = {name: _to_numpy(tree) for name, tree in trees.items()}
    payload[_META_KEY] = json.dumps(
        {"step": int(step), "epoch": int(epoch),
         "config": dict(config) if config else None,
         "keys": sorted(payload.keys())}
    )
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)


def load_states(path) -> dict[str, Any]:
    """Read a checkpoint back: {'step', 'epoch', 'config', <tree names>...}."""
    payload = serialization.msgpack_restore(pathlib.Path(path).read_bytes())
    meta = json.loads(payload.pop(_META_KEY))
    out = {"step": meta["step"], "epoch": meta["epoch"],
           "config": meta["config"]}
    out.update(payload)
    return out


class CheckpointManager:
    """Save cadence matching the reference trainers: overwrite `states.ckpt`
    every `n_save_states_iter`, keep a versioned backup every
    `n_save_backup_iter` (`configs/nawar_fp.yaml:34-35` in the reference)."""

    def __init__(self, directory, n_save_states_iter: int = 100,
                 n_save_backup_iter: int = 1000):
        self.directory = pathlib.Path(directory)
        self.n_states = n_save_states_iter
        self.n_backup = n_save_backup_iter

    def maybe_save(self, step: int, epoch: int = 0, config=None, **trees):
        wrote = []
        if step % self.n_states == 0:
            p = self.directory / "states.ckpt"
            save_states(p, step=step, epoch=epoch, config=config, **trees)
            wrote.append(p)
        if step % self.n_backup == 0:
            p = self.directory / f"states_{step}.ckpt"
            save_states(p, step=step, epoch=epoch, config=config, **trees)
            wrote.append(p)
        return wrote

    def latest(self):
        p = self.directory / "states.ckpt"
        return p if p.exists() else None


# --- PyTorch checkpoint import ---------------------------------------------

def load_torch_state_dict(path) -> dict[str, np.ndarray]:
    """Load a reference `.pth` checkpoint into flat {name: ndarray}.

    Handles the reference layouts: either a bare state_dict or a dict with
    'model'/'generator' keys (`models/fastpitch/networks.py:52-60`,
    `vocoder/__init__.py:10-18`). Tensors come back as numpy; non-tensor
    entries (embedded config/symbols) are returned under `__extras__`.
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    extras = {}
    if isinstance(raw, dict):
        for key in ("model", "generator", "state_dict"):
            if key in raw and isinstance(raw[key], dict):
                extras = {k: v for k, v in raw.items() if k != key}
                raw = raw[key]
                break
    flat = {}
    for k, v in raw.items():
        if hasattr(v, "detach"):
            flat[k.removeprefix("module.")] = v.detach().cpu().numpy()
    flat["__extras__"] = {
        k: v for k, v in extras.items()
        if not hasattr(v, "detach") and k in ("config", "symbols", "epoch",
                                              "iter")
    }
    return flat


# --- orbax backend ----------------------------------------------------------

class OrbaxCheckpointer:
    """Directory-based orbax checkpointing for long training runs: versioned
    async-capable saves with retention, complementing the single-file
    msgpack format (which remains the interchange format). API mirrors
    CheckpointManager.
    """

    def __init__(self, directory, max_to_keep: int = 5):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = pathlib.Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, tree) -> None:
        self.manager.save(step, args=self._ocp.args.StandardSave(tree))

    def restore(self, step: int | None = None, target=None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if target is not None:
            return self.manager.restore(
                step, args=self._ocp.args.StandardRestore(target))
        return self.manager.restore(step)

    def latest_step(self):
        return self.manager.latest_step()

    def wait(self):
        self.manager.wait_until_finished()
