"""Profiling / tracing utilities.

The reference had no profiling at all (SURVEY §5: only TB scalar
summaries, `train_n_est_w_experts.py:205-207`).  Here tracing is a
first-class subsystem: `trace()` wraps a code region in a
`jax.profiler` trace (viewable in TensorBoard / Perfetto), and
`StepTimer` aggregates per-step wall times into percentile summaries
for the structured metrics log.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True):
    """Capture a jax.profiler device trace into `logdir` (no-op when
    disabled so call sites stay unconditional)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with percentile aggregation.

    Usage:
        timer = StepTimer()
        with timer.step():
            ... one train step ...
        stats = timer.summary()   # {"steps", "mean_ms", "p50_ms", ...}
    """

    def __init__(self):
        self._times_s: list[float] = []

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._times_s.append(time.perf_counter() - t0)

    def reset(self):
        self._times_s.clear()

    @property
    def n_steps(self) -> int:
        return len(self._times_s)

    def summary(self) -> dict:
        if not self._times_s:
            return {"steps": 0}
        t = np.asarray(self._times_s) * 1e3
        return {
            "steps": int(t.size),
            "mean_ms": float(t.mean()),
            "p50_ms": float(np.percentile(t, 50)),
            "p90_ms": float(np.percentile(t, 90)),
            "p99_ms": float(np.percentile(t, 99)),
            "total_s": float(t.sum() / 1e3),
        }
