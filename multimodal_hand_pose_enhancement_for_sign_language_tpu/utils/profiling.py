"""Tracing/profiling hooks.

The reference has only ad-hoc time.time() prints (proc_vid.py:158-172);
here: a step timer, a jax.profiler trace context, and annotations.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class StepTimer:
    """Rolling per-step wall-clock stats; call tick() once per step."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self.best = float("inf")
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.count += 1
            if self.count > self.warmup:
                dt = now - self._last
                self.total += dt
                self.best = min(self.best, dt)
        self._last = now

    @property
    def mean(self) -> float:
        n = max(self.count - self.warmup, 1)
        return self.total / n

    def summary(self) -> dict:
        return {"steps": self.count, "mean_s": self.mean, "best_s": self.best}


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
