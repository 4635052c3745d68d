"""Profiling & timing harness.

The reference has no tracing or profiling of any kind (SURVEY.md §5 — its
only instrumentation is a progress bar). Here: trace annotations that show
up on the TPU timeline, a TensorBoard-viewable trace context, and a
block_until_ready benchmarking helper (the only correct way to time async
XLA dispatch).
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Any, Callable, Sequence

import jax


def annotate(name: str):
    """Context manager: label the enclosed device work on the profiler
    timeline (no-op cost when not tracing)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace of the enclosed block:
    `tensorboard --logdir <log_dir>` -> Profile tab."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block(tree: Any) -> Any:
    """Wait for every array in the pytree (async-dispatch barrier)."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree


@dataclass
class Timing:
    best_s: float
    mean_s: float
    times_s: Sequence[float]
    warmup_s: float

    def __str__(self):
        return (f"best {self.best_s * 1e3:.2f} ms, "
                f"mean {self.mean_s * 1e3:.2f} ms "
                f"over {len(self.times_s)} runs "
                f"(warmup {self.warmup_s:.2f} s)")


def benchmark(fn: Callable[[], Any], *, warmup: int = 1,
              iters: int = 5) -> Timing:
    """Time `fn` with a block_until_ready barrier after each call (timing
    the dispatch alone measures nothing under XLA's async execution).
    `warmup` runs absorb compilation; returns best/mean of `iters` runs."""
    t0 = time.perf_counter()
    for _ in range(max(warmup, 0)):
        block(fn())
    warmup_s = time.perf_counter() - t0

    times = []
    for _ in range(max(iters, 1)):
        t0 = time.perf_counter()
        block(fn())
        times.append(time.perf_counter() - t0)
    return Timing(best_s=min(times), mean_s=sum(times) / len(times),
                  times_s=times, warmup_s=warmup_s)
