"""Observability: metric streams, profiler traces, and numeric sanitizers.

Replaces the reference's visdom dashboards (utils/misc.py:304-318,
train.py:241-260) with a JSONL metric stream any dashboard can tail, keeps a
visdom adapter for drop-in familiarity when visdom is importable, and exposes
the TPU-native profiling/sanitizing hooks (SURVEY.md §5: the reference has
wall-clock meters only and no sanitizers).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional

import jax


class MetricsLogger:
    """Append-only JSONL metric stream: one record per log call."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._start = time.time()

    def log(self, step: int, metrics: Dict[str, float], **extra) -> None:
        rec = {"step": int(step), "t": round(time.time() - self._start, 3),
               **{k: float(v) for k, v in metrics.items()}, **extra}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


class VisdomPlotter:
    """plot_loss-compatible live line plots; silently inert without visdom."""

    def __init__(self, env: str = "thermal semantic segmentation"):
        # visdom.Visdom() does NOT raise when no server is reachable — it
        # logs and returns a client whose every post fails. Gate on an
        # actual connection so "visdom installed but no server" stays inert
        # (callers key live-panel work, e.g. the GAN step's image outputs,
        # off ``vis is not None``).
        try:
            import visdom  # type: ignore
            vis = visdom.Visdom(env=env, raise_exceptions=True)
            self.vis = vis if vis.check_connection() else None
        except Exception:
            self.vis = None

    def _post(self, fn, *args, **kwargs) -> None:
        # a visdom server that drops mid-run (restart, network blip) must
        # not take hours of training down with it: on any post failure go
        # inert for the rest of the run, exactly like "no server at start"
        try:
            fn(*args, **kwargs)
        except Exception as e:  # visdom raises ConnectionError subclasses
            print(f"visdom post failed ({e!r}); live panels disabled")
            self.vis = None

    def plot_loss(self, epoch_counter_ratio, losses: Dict[str, list]) -> None:
        if self.vis is None:
            return
        import numpy as np
        legend = list(losses.keys())
        self._post(
            self.vis.line,
            X=np.array(epoch_counter_ratio),
            Y=np.array([losses[k] for k in legend]).transpose(),
            opts={"title": " loss over time", "legend": legend,
                  "xlabel": "epoch", "ylabel": "loss"},
            win="loss")

    def images(self, tensor, win: str, title: Optional[str] = None) -> None:
        if self.vis is None:
            return
        self._post(self.vis.images, tensor, win=win, padding=2,
                   opts=dict(title=title or win, caption=title or win))


@contextlib.contextmanager
def profiler_trace(logdir: str, enabled: bool = True):
    """jax.profiler trace around a training region (view with TensorBoard)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str):
    """Named profiler span for host-side phases (data wait, ckpt IO, ...)."""
    return jax.profiler.TraceAnnotation(name)


def enable_debug_mode(nans: bool = True, infs: bool = False) -> None:
    """Dev-mode numeric sanitizer: fail fast on NaN/Inf inside jit."""
    if nans:
        jax.config.update("jax_debug_nans", True)
    if infs:
        jax.config.update("jax_debug_infs", True)
