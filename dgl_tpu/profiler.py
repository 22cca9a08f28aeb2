"""Profiling utilities (SURVEY.md §5.1: the reference has no built-in
tracer — a gap this fills): input-pipeline stage timers + a thin wrapper
over the JAX/XLA profiler for device traces."""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

__all__ = ["StageTimer", "profile_trace", "timed_stage"]


class StageTimer:
    """Accumulates wall time per named pipeline stage.

    >>> timer = StageTimer()
    >>> with timer.stage("sample"): ...
    >>> timer.summary()
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_ms": round(1e3 * self.totals[k] / max(self.counts[k], 1), 3),
            }
            for k in self.totals
        }

    def reset(self):
        self.totals.clear()
        self.counts.clear()

    def __repr__(self):
        return f"StageTimer({self.summary()})"


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture an XLA device trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_stage(timer: StageTimer, name: str, it):
    """Wrap an iterator so each ``next`` is timed as ``name``."""
    it = iter(it)
    while True:
        with timer.stage(name):
            try:
                item = next(it)
            except StopIteration:
                return
        yield item
