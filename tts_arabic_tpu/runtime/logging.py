"""Training observability: scalar/figure logging.

Capability parity with the reference's `TBLogger` (`utils/logging.py:5-40`):
loss-meta scalar dicts, grad-norm, learning rate, parameter histograms, and
alignment/spectrogram figures — written to TensorBoard when available and
always to a JSONL metrics file (so headless runs keep observability).
"""
from __future__ import annotations

import json
import pathlib
import time
from typing import Mapping

import numpy as np


def _tb_writer(log_dir):
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(log_dir)
    except Exception:
        return None


class MetricLogger:
    def __init__(self, log_dir):
        self.log_dir = pathlib.Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._tb = _tb_writer(str(self.log_dir))
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")

    def log_scalars(self, step: int, scalars: Mapping[str, float],
                    prefix: str = ""):
        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            name = f"{prefix}{k}"
            v = float(np.asarray(v))
            rec[name] = v
            if self._tb:
                self._tb.add_scalar(name, v, step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def log_training(self, step: int, meta: Mapping[str, float],
                     grad_norm: float | None = None,
                     lr: float | None = None):
        scalars = dict(meta)
        if grad_norm is not None:
            scalars["grad_norm"] = grad_norm
        if lr is not None:
            scalars["lr"] = lr
        self.log_scalars(step, scalars, prefix="train/")

    def log_histograms(self, step: int, params, prefix: str = "params/"):
        if not self._tb:
            return
        import jax
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            name = prefix + "/".join(str(p.key) if hasattr(p, "key")
                                     else str(p) for p in path)
            self._tb.add_histogram(name, np.asarray(leaf), step)

    def log_figure(self, step: int, tag: str, fig):
        if self._tb:
            self._tb.add_figure(tag, fig, step)
        else:
            out = self.log_dir / f"{tag.replace('/', '_')}_{step}.png"
            fig.savefig(out)

    def log_alignment_and_mels(self, step: int, alignment=None, mel_pred=None,
                               mel_post=None, mel_target=None):
        """Validation figures analogous to `utils/logging.py:23-40`."""
        from ..eval.plotting import plot_alignment, plot_mel_triptych
        if alignment is not None:
            self.log_figure(step, "val/alignment", plot_alignment(alignment))
        if mel_target is not None or mel_pred is not None:
            self.log_figure(
                step, "val/mels",
                plot_mel_triptych(mel_pred, mel_post, mel_target),
            )

    def close(self):
        if self._tb:
            self._tb.close()
        self._jsonl.close()
