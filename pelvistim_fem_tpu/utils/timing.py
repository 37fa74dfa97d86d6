"""Per-phase wall-time observability.

The reference has no profiling at all (SURVEY.md section 5) — only
per-phase progress prints.  Here every pipeline stage is timed, and the
judged throughput metrics (DOF/s, solves/min) fall out of the same
counters that bench.py reports.
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class PhaseTimer:
    def __init__(self, verbose: bool = True):
        self.phases: dict[str, float] = {}
        self.verbose = verbose

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            if self.verbose:
                print(f"    [{name}] {dt*1e3:.1f} ms")

    def total(self) -> float:
        return sum(self.phases.values())

    def report(self) -> dict:
        return dict(self.phases)


def dof_per_second(n_dof: int, seconds: float) -> float:
    return n_dof / seconds if seconds > 0 else float("inf")


def solves_per_minute(n_solves: int, seconds: float) -> float:
    return n_solves * 60.0 / seconds if seconds > 0 else float("inf")
