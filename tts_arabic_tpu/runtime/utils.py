"""Small utilities (reference `utils/__init__.py:43-74` equivalents, plus
pytree dtype helpers shared by the inference pipelines and train steps)."""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp


def force_cpu_backend():
    """Force the CPU backend, robustly against remote-TPU plugins.

    `jax.config.update("jax_platforms", "cpu")` alone is not enough with
    the axon remote-TPU plugin on the path: its registered backend
    factory dials the chip tunnel inside backends() init regardless, and
    a half-dead tunnel hangs that connect indefinitely (observed
    2026-08-18). For a `--cpu` run nothing remote is wanted — drop the
    plugin's path entries, repoint JAX_PLATFORMS, and unregister its
    backend factory before any backend initializes."""
    import os

    sys.path[:] = [p for p in sys.path if "axon" not in p]
    if "PYTHONPATH" in os.environ:
        os.environ["PYTHONPATH"] = os.pathsep.join(
            p for p in os.environ["PYTHONPATH"].split(os.pathsep)
            if p and "axon" not in p)
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge as _xb
        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass


def cast_floating(tree, dtype):
    """Cast every floating leaf of a pytree to `dtype` (int/bool leaves
    untouched); identity when dtype is None."""
    if dtype is None:
        return tree
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def read_lines_from_file(path, encoding="utf-8"):
    with open(path, encoding=encoding) as f:
        return [line.strip() for line in f]


def write_lines_to_file(path, lines, mode="w", encoding="utf-8"):
    with open(path, mode, encoding=encoding) as f:
        f.write("\n".join(lines))


def progbar(iterable, length: int = 30, symbol: str = "="):
    """Inline progress bar generator (reference `progbar`,
    utils/__init__.py:59-74)."""
    n = len(iterable)
    for i, item in enumerate(iterable):
        steps = length * (i + 1) // max(n, 1)
        sys.stdout.write("\r")
        sys.stdout.write(f"[{symbol * steps:{length}}] "
                         f"{100 / max(n, 1) * (i + 1):.1f}%")
        if i == n - 1:
            sys.stdout.write("\n")
        sys.stdout.flush()
        yield item
