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


def block_sync_reliable(warn: bool = True) -> bool:
    """Self-check: does `jax.block_until_ready` actually wait for device
    completion on this backend?

    Through the axon relay it does NOT (docs/PERF.md "Measurement
    rules"): a multi-TFLOP chain "completes" in <1 ms under it, and any
    timing loop synchronized that way reports dispatch time, not compute
    time — wrong by construction.  Probe: dispatch a matmul chain sized
    to take >=10 ms on a TPU, time block_until_ready vs a one-element
    host fetch; if blocking covers well under half the fetch-synchronized
    time, blocking is not synchronizing.

    Returns True when block_until_ready is trustworthy for timing.
    CPU/GPU backends return True without probing (the chain would take
    minutes on a host core, and those backends block correctly).
    """
    import jax
    import jax.numpy as jnp

    if jax.devices()[0].platform in ("cpu", "gpu"):
        return True

    n = 4096

    @jax.jit
    def chain(x):
        for _ in range(24):
            x = x @ x / n
        return x

    x = jnp.ones((n, n), jnp.bfloat16)
    out = chain(x)
    jax.block_until_ready(out)
    _ = np.asarray(out[0, 0])  # true sync: compile + warm the relay

    t0 = time.perf_counter()
    jax.block_until_ready(chain(x))
    t_block = time.perf_counter() - t0

    t0 = time.perf_counter()
    _ = np.asarray(chain(x)[0, 0])
    t_fetch = time.perf_counter() - t0

    ok = t_block >= 0.5 * t_fetch
    if warn and not ok:
        import sys

        print(
            f"[profiling] WARNING: block_until_ready does NOT synchronize "
            f"on this backend (blocked {t_block*1e3:.1f} ms vs "
            f"{t_fetch*1e3:.1f} ms fetch-synchronized for the same "
            f"program) — time with fetch_sync()/timed() instead",
            file=sys.stderr,
        )
    return ok


def fetch_sync(out):
    """Force true device completion by fetching one element of the first
    output leaf to the host — the only reliable sync on relay backends.
    Returns `out` unchanged."""
    import jax

    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf if getattr(leaf, "ndim", 0) == 0 else leaf.ravel()[0])
    return out


def timed(fn, *args, reps: int = 5) -> float:
    """Median wall ms per `fn(*args)` call, synchronized by a one-element
    host fetch (valid on every backend; see block_sync_reliable)."""
    fetch_sync(fn(*args))  # warmup/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch_sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


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
