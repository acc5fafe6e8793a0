"""Profiling: wall-clock stage timing + jax.profiler trace capture.

Replaces the reference's print-based diagnostics (SURVEY.md §5) with
structured, reusable instrumentation. ``trace`` produces TensorBoard-
loadable XPlane traces of TPU execution.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class Timer:
    """Accumulating named wall-clock timers.

    >>> t = Timer()
    >>> with t("stitch"): ...
    >>> t.summary()  # {'stitch': {'total_s': ..., 'count': ..., 'mean_s': ...}}
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str, block_until_ready=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_until_ready is not None:
                jax.block_until_ready(block_until_ready)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_s": self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def stage_timer(name: str, log_fn=print):
    """One-shot stage timing context."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        log_fn(f"[timing] {name}: {time.perf_counter() - t0:.3f}s")


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (TensorBoard XPlane) for the block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> Optional[dict]:
    """Live HBM stats for a device when the backend exposes them."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", None)
    return stats() if callable(stats) else None
