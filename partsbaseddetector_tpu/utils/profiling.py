"""Profiling and observability.

The reference has no tracing (SURVEY.md §5: ad-hoc tick prints only).
Here: per-stage wall timers with device sync, frame counters, and a
context-manager wrapper around the JAX profiler."""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict
from typing import Dict, Optional


@dataclasses.dataclass
class StageStats:
    count: int = 0
    total_s: float = 0.0
    best_s: float = float("inf")

    @property
    def mean_s(self) -> float:
        return self.total_s / max(self.count, 1)


class StageTimer:
    """Accumulating per-stage timer.

    >>> timer = StageTimer()
    >>> with timer.stage("detect"):
    ...     out = det.detect_raw(im)
    ...     jax.block_until_ready(out.score)
    >>> timer.report()
    """

    def __init__(self):
        self.stats: Dict[str, StageStats] = defaultdict(StageStats)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self.stats[name]
            s.count += 1
            s.total_s += dt
            s.best_s = min(s.best_s, dt)

    def report(self) -> str:
        lines = [f"{'stage':<20} {'count':>6} {'mean':>10} {'best':>10}"]
        for name, s in sorted(self.stats.items()):
            lines.append(f"{name:<20} {s.count:>6} "
                         f"{s.mean_s * 1e3:>8.2f}ms "
                         f"{s.best_s * 1e3:>8.2f}ms")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/pbd_trace"):
    """JAX profiler trace context (view with tensorboard or parse the
    .trace.json.gz)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class FrameCounter:
    """Streaming throughput counter (frames/s over a sliding window)."""

    def __init__(self, window: int = 30):
        self.window = window
        self.times = []

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        self.times.append(now)
        if len(self.times) > self.window:
            self.times.pop(0)
        if len(self.times) < 2:
            return None
        return (len(self.times) - 1) / (self.times[-1] - self.times[0])
