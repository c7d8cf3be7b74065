"""Per-stage timing + counters (tracing/observability layer).

The reference has only driver-level chrono timing (`mono_fisheye.cc:
118-161`) and cout counters (SURVEY §5). This module provides: named stage
timers with summary stats, frame counters, and an optional JAX profiler
trace context for deep TPU profiling.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


class StageTimer:
    def __init__(self):
        self.samples = defaultdict(list)
        self.counters = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def count(self, name: str, n: int = 1):
        self.counters[name] += n

    def summary(self) -> str:
        lines = []
        for name, xs in sorted(self.samples.items()):
            a = np.array(xs) * 1e3
            lines.append(
                f"{name:30s} n={len(a):5d} median={np.median(a):8.2f} ms "
                f"mean={a.mean():8.2f} ms p95={np.percentile(a, 95):8.2f} ms")
        for name, c in sorted(self.counters.items()):
            lines.append(f"{name:30s} count={c}")
        return "\n".join(lines)

    def reset(self):
        self.samples.clear()
        self.counters.clear()


@contextlib.contextmanager
def jax_trace(log_dir: str):
    """JAX profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


GLOBAL_TIMER = StageTimer()
