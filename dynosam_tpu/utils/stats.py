"""Global statistics registry + RAII timers.

Reference parity: /root/reference/dynosam_common/include/dynosam_common/utils/
Statistics.hpp:90-305 (tag -> sample collector with mean/min/max/stddev,
`statistics_samples.csv` dump on shutdown) and TimingStats.hpp:118-250
(ChronoTimingStats RAII timers). Keeping the same CSV contract lets the
reference's timing-analysis scripts (sw_vs_batch_timing.py,
plot_ral_timing_data.py) run on our outputs unchanged.
"""

from __future__ import annotations

import csv
import math
import time
from contextlib import contextmanager
from typing import Dict, List


class _Collector:
    __slots__ = ("samples",)

    def __init__(self):
        self.samples: List[float] = []

    def add(self, v: float):
        self.samples.append(float(v))

    @property
    def count(self):
        return len(self.samples)

    @property
    def mean(self):
        return sum(self.samples) / len(self.samples) if self.samples else 0.0

    @property
    def minimum(self):
        return min(self.samples) if self.samples else 0.0

    @property
    def maximum(self):
        return max(self.samples) if self.samples else 0.0

    @property
    def stddev(self):
        n = len(self.samples)
        if n < 2:
            return 0.0
        m = self.mean
        return math.sqrt(sum((x - m) ** 2 for x in self.samples) / (n - 1))


class Statistics:
    """Process-global tag -> sample registry (singleton, like the reference)."""

    _collectors: Dict[str, _Collector] = {}

    @classmethod
    def get(cls, tag: str) -> _Collector:
        if tag not in cls._collectors:
            cls._collectors[tag] = _Collector()
        return cls._collectors[tag]

    @classmethod
    def add_sample(cls, tag: str, value: float):
        cls.get(tag).add(value)

    @classmethod
    def reset(cls):
        cls._collectors = {}

    @classmethod
    def tags(cls):
        return sorted(cls._collectors)

    @classmethod
    def summary(cls) -> str:
        lines = [f"{'tag':<48} {'n':>6} {'mean':>12} {'min':>12} {'max':>12} {'std':>12}"]
        for tag in cls.tags():
            c = cls._collectors[tag]
            lines.append(
                f"{tag:<48} {c.count:>6} {c.mean:>12.6f} {c.minimum:>12.6f}"
                f" {c.maximum:>12.6f} {c.stddev:>12.6f}"
            )
        return "\n".join(lines)

    @classmethod
    def write_all_samples_to_csv(cls, path: str):
        """Same layout as the reference's statistics_samples.csv: one column
        per tag, rows are samples."""
        tags = cls.tags()
        if not tags:
            return
        rows = max(cls._collectors[t].count for t in tags)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(tags)
            for i in range(rows):
                w.writerow(
                    [
                        cls._collectors[t].samples[i]
                        if i < cls._collectors[t].count
                        else ""
                        for t in tags
                    ]
                )


@contextmanager
def timed(tag: str, block_on=None):
    """RAII timer feeding Statistics in milliseconds (ChronoTimingStats).

    `block_on`: optional JAX array (or pytree) to block_until_ready before
    stopping the clock — required for honest device timings.
    """
    start = time.perf_counter()
    try:
        yield
    finally:
        if block_on is not None:
            import jax

            jax.block_until_ready(block_on)
        Statistics.add_sample(tag, (time.perf_counter() - start) * 1e3)


class Timer:
    """Imperative start/stop variant for loops that rebind the blocked value."""

    def __init__(self, tag: str):
        self.tag = tag
        self._start = None

    def start(self):
        self._start = time.perf_counter()
        return self

    def stop(self, block_on=None):
        if block_on is not None:
            import jax

            jax.block_until_ready(block_on)
        Statistics.add_sample(self.tag, (time.perf_counter() - self._start) * 1e3)
