"""Loop ETA estimation (driver-side dev tool).

Counterpart of the reference's ``estimate_time``
(reference: pd_utils/timer.py:6-45). On Spark, per-stage progress
lives in the Spark UI; this helper covers the same driver-side
use case: estimating completion of an explicit Python loop (e.g.
over a list of partitions/dates being submitted).
"""

from __future__ import annotations

import time
from datetime import datetime, timedelta


class _LoopProgress:
    """Projected-finish arithmetic for a loop observed mid-flight.

    Separated from the printing so the projection is unit-testable
    and reusable (``estimate_time`` below is the reference-parity
    facade over it).
    """

    __slots__ = ("total", "completed", "elapsed")

    def __init__(self, total: int, completed: int, elapsed: float):
        self.total = total
        self.completed = completed
        self.elapsed = elapsed

    @property
    def remaining_seconds(self) -> float:
        pace = self.elapsed / self.completed
        return pace * (self.total - self.completed)

    def finish_at(self, now: datetime) -> datetime:
        return now + timedelta(seconds=self.remaining_seconds)

    def render(self, eta: datetime, index: int) -> str:
        pct = index / self.total
        return f"Completed {index}/{self.total} ({pct:.0%}) — ETA {eta}"


def estimate_time(
    length: int,
    i: int,
    start_time: float,
    output: bool = True,
) -> datetime:
    """Estimate when a loop will finish; call at the end of each
    iteration, with the clock value captured before the loop
    (``time.perf_counter()`` / ``timeit.default_timer()`` — the same
    clock, so reference-style call sites port unchanged; reference:
    pd_utils/timer.py:6-45).

    ``length`` is the loop's iteration count, ``i`` the zero-based
    index of the iteration that just ran, ``start_time`` the pre-loop
    clock value; pass ``output=False`` to suppress the carriage-return
    progress line and only get the projected finish back.
    """
    progress = _LoopProgress(length, i + 1, time.perf_counter() - start_time)
    eta = progress.finish_at(datetime.now())
    if output:
        print(progress.render(eta, i), end="\r", flush=True)
    return eta
