"""Timing, tracing and metrics.

The reference's observability is two wall timers and a frame-counter printf
(optixHello.cpp:104-105,1156-1157,1253-1263) plus `-lineinfo` for external
profilers.  The TPU equivalents here:

* ``PhaseTimer`` — named phase accumulation with the reference's protocol
  (setup once, mean frame time) plus percentiles;
* ``trace_to`` — context manager around ``jax.profiler`` for device traces
  viewable in TensorBoard/Perfetto;
* ``Metrics`` — counter/gauge sink with one-line JSON dumps (the structured
  form of the reference's prints).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


class PhaseTimer:
    def __init__(self):
        self.phases: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name].append(time.perf_counter() - t0)

    def mean_ms(self, name: str) -> float:
        xs = self.phases.get(name, [])
        return 1000.0 * sum(xs) / len(xs) if xs else 0.0

    def summary(self) -> dict:
        out = {}
        for name, xs in self.phases.items():
            xs_sorted = sorted(xs)
            out[name] = {
                "count": len(xs),
                "mean_ms": round(1000.0 * sum(xs) / len(xs), 3),
                "min_ms": round(1000.0 * xs_sorted[0], 3),
                "p50_ms": round(1000.0 * xs_sorted[len(xs) // 2], 3),
                "max_ms": round(1000.0 * xs_sorted[-1], 3),
            }
        return out

    def report(self) -> str:
        return json.dumps(self.summary())


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture a jax.profiler device trace (view with TensorBoard's profile
    plugin or Perfetto). The reference relied on nvcc -lineinfo + Nsight
    (CMakeLists.txt:179-184); this is the XLA-native equivalent."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Metrics:
    """Minimal counter/gauge registry with JSON line output."""

    def __init__(self):
        self.counters: dict[str, float] = defaultdict(float)
        self.gauges: dict[str, float] = {}

    def inc(self, name: str, value: float = 1.0):
        self.counters[name] += value

    def set(self, name: str, value: float):
        self.gauges[name] = float(value)

    def dump(self) -> str:
        return json.dumps({"counters": dict(self.counters), "gauges": self.gauges})
