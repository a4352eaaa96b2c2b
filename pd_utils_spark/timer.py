"""Loop ETA estimation (driver-side dev tool).

Counterpart of the reference's ``estimate_time``
(reference: pd_utils/timer.py:6-45). On Spark, per-stage progress
lives in the Spark UI; this helper covers the same driver-side
use case as the reference: estimating completion of an explicit
Python loop (e.g. over a list of partitions/dates being submitted).
"""

from __future__ import annotations

import time
from datetime import datetime, timedelta


def estimate_time(
    length: int,
    i: int,
    start_time: float,
    output: bool = True,
) -> datetime:
    """Estimate when a loop will finish; call at the end of each
    iteration with ``start_time = timeit.default_timer()`` (equivalently
    ``time.perf_counter()``) taken before the loop
    (reference: pd_utils/timer.py:6-45).

    :param length: total number of iterations
    :param i: current zero-based iteration index
    :param start_time: ``time.perf_counter()`` value from before the loop
    :param output: False to suppress the progress line
    :return: estimated wall-clock finish time
    """
    done = i + 1
    elapsed = time.perf_counter() - start_time
    # elapsed * (length/done - 1) == per-iteration mean * iterations left
    eta = datetime.now() + timedelta(seconds=elapsed * (length / done - 1.0))

    if output:
        print(
            f"Completed {i}/{length} ({i / length:.0%}) — ETA {eta}",
            end="\r",
            flush=True,
        )

    return eta
