"""Profiling / observability harness.

The reference has no tracing or profiling at all (SURVEY.md §5 — only
commented-out ipdb breadcrumbs). TPU-native equivalents:

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace;
- :class:`StepTimer` — wall-clock timing with ``block_until_ready`` sync and
  simple percentile stats (compile time excluded via warmup).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): step(...)``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates synced step wall-clock times.

    Usage::

        timer = StepTimer(warmup=2)
        for batch in batches:
            with timer:
                out = step(state, batch)
            timer.sync(out)
        print(timer.summary())
    """

    def __init__(self, warmup: int = 2) -> None:
        self.warmup = warmup
        self._times: List[float] = []
        self._t0 = 0.0
        self._n = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        return False

    def sync(self, out) -> None:
        jax.block_until_ready(out)
        self._n += 1
        if self._n > self.warmup:
            self._times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        return {
            "steps": len(t),
            "mean_ms": float(t.mean() * 1e3),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p95_ms": float(np.percentile(t, 95) * 1e3),
            "steps_per_sec": float(1.0 / t.mean()),
        }
