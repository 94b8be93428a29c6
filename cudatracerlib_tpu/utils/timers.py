"""Timing + counters (reference: ``Base/Timer.h`` InstructionTimer /
PerformanceTimer scoped block profiler, and the TracerBase rays/s counters)."""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager


class InstructionTimer:
    def __init__(self):
        self.start()

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0


class PerformanceTimer:
    """Scoped block profiler: accumulate wall time per named block
    (START_PERF_BLOCK equivalent is the `block` context manager)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextmanager
    def block(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name}: {tot:.3f}s total, {n} calls, {tot / n * 1e3:.2f} ms avg")
        return "\n".join(lines)


class RayCounter:
    """Host-side rays-traced accounting (the reference reads device counters
    back per pass; lane-counting here is analytic: lanes * traversals)."""

    def __init__(self):
        self.rays = 0
        self.seconds = 0.0

    def add_pass(self, n_rays: int, seconds: float):
        self.rays += n_rays
        self.seconds += seconds

    @property
    def mrays_per_second(self) -> float:
        return self.rays / max(self.seconds, 1e-9) / 1e6
