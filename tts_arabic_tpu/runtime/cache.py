"""Persistent XLA compilation cache setup.

The axon remote-compile path costs minutes per new jit signature; a
persistent cache makes every signature compile once per machine instead of
once per process. Called by bench.py and the CLIs.
"""
from __future__ import annotations

import os
import pathlib


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = pathlib.Path(
        path or os.environ.get("TTS_ARABIC_CACHE",
                               "/root/.cache/tts_arabic_tpu/xla"))
    cache_dir.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
