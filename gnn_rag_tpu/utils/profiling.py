"""Profiling hooks (new capability — the reference has none, SURVEY.md §5).

Wraps jax.profiler: ``trace(logdir)`` captures a TensorBoard-viewable device
trace; ``annotate(name)`` marks host regions; ``step_timer`` aggregates
wall-clock per named phase.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Device trace context; no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates wall-clock per phase; report() -> {phase: (total_s, n)}."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, tuple]:
        return {k: (round(self.totals[k], 4), self.counts[k])
                for k in sorted(self.totals)}
