"""Structured metrics and phase timing (SURVEY §5.1/§5.5).

The reference prints three wall-clock lines (BVH ms, CPU s, GPU s). Here every
phase is timed into a registry and can be emitted as JSON lines; the renderer
reports the north-star throughput metrics (paths/s, ray-segments/s) and
per-bounce live-ray fractions for observability into wavefront occupancy.
"""

from __future__ import annotations

import json
import sys
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class Metrics:
    """Append-only metric registry; one per render job."""

    phases: Dict[str, float] = field(default_factory=dict)
    counters: Dict[str, float] = field(default_factory=dict)
    series: Dict[str, List[float]] = field(default_factory=dict)

    @contextmanager
    def phase(self, name: str):
        """Time a phase: ``with metrics.phase("bvh_build"): ...``"""
        start = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (
                time.perf_counter() - start
            )

    def count(self, name: str, value: float) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + value

    def record(self, name: str, value: float) -> None:
        self.series.setdefault(name, []).append(float(value))

    def throughput(self, name: str, units: float, phase: str) -> Optional[float]:
        """units / phase-seconds, also stored as a counter."""
        seconds = self.phases.get(phase)
        if not seconds:
            return None
        rate = units / seconds
        self.counters[name] = rate
        return rate

    def emit(self, stream=None, **extra) -> str:
        """One JSON line with everything (the reference's std::cout lines,
        machine-readable)."""
        line = json.dumps(
            dict(
                phases=self.phases,
                counters=self.counters,
                series=self.series,
                **extra,
            ),
            sort_keys=True,
        )
        print(line, file=stream or sys.stderr)
        return line


def live_fraction(transmitted) -> float:
    """Fraction of rays still alive in a wavefront state (observability into
    dead-ray overhead; the reference has no analogue)."""
    import numpy as np

    alive = np.asarray((transmitted != 0).any(axis=-1))
    return float(alive.mean())
