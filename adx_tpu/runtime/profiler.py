"""Named-section wall-time profiler.

Keeps the reference's operator-visible reporting format (the duplicated
``TimeAggregator`` — src/spectrogram_explainability.py:28-80 and
src/dsp_band_ops.py:31-83 — deduplicated here), and adds a device-throughput
counter used by the benchmark harness. For deep TPU traces use
``jax.profiler.trace`` around a section; this class is the cheap always-on
layer.
"""

from __future__ import annotations

import time
from functools import wraps


class TimeAggregator:
    def __init__(self):
        self.global_stats: dict[str, list[float]] = {}
        self.sample_stats: dict[str, list[float]] = {}
        self.counters: dict[str, float] = {}

    def record(self, name: str, elapsed: float):
        self.global_stats.setdefault(name, []).append(elapsed)
        self.sample_stats.setdefault(name, []).append(elapsed)

    def count(self, name: str, n: float = 1.0):
        """Accumulate a throughput counter (e.g. perturbation forwards)."""
        self.counters[name] = self.counters.get(name, 0.0) + n

    def reset_sample(self):
        self.sample_stats = {}

    def summary(self, stats: dict[str, list[float]]):
        out = {}
        for name, values in stats.items():
            total = sum(values)
            count = len(values)
            avg = total / count if count > 0 else 0.0
            out[name] = {"total": total, "count": count, "avg": avg}
        return out

    def print_sample_summary(self):
        if not self.sample_stats:
            return
        print("\n⏱️ Sample timing summary:")
        for name, s in self.summary(self.sample_stats).items():
            print(f"  - {name}: total {s['total']:.2f}s, calls {s['count']}, avg {s['avg']:.3f}s")

    def print_global_summary(self):
        if not self.global_stats:
            return
        print("\n⏱️ Global timing summary:")
        for name, s in self.summary(self.global_stats).items():
            print(f"  - {name}: total {s['total']:.2f}s, calls {s['count']}, avg {s['avg']:.3f}s")
        for name, v in self.counters.items():
            print(f"  - counter {name}: {v:.0f}")

    def section(self, name: str):
        """Context manager: ``with profiler.section('Predicting audio'): ...``"""
        return _Section(self, name)


class _Section:
    def __init__(self, agg: TimeAggregator, name: str):
        self.agg, self.name = agg, name

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.agg.record(self.name, time.time() - self.t0)
        return False


def timed(name: str):
    """Method decorator recording into ``self.profiler`` when present
    (drop-in for the reference's decorator of the same name)."""

    def decorator(func):
        @wraps(func)
        def wrapper(self, *args, **kwargs):
            profiler = getattr(self, "profiler", None)
            start = time.time()
            try:
                return func(self, *args, **kwargs)
            finally:
                elapsed = time.time() - start
                if profiler is not None:
                    profiler.record(name, elapsed)

        return wrapper

    return decorator
