"""Loop ETA estimation (driver-side dev tool).

Counterpart of the reference's ``estimate_time``
(reference: pd_utils/timer.py:6-45). On Spark, per-stage progress
lives in the Spark UI; this helper covers the same driver-side
use case as the reference: estimating completion of an explicit
Python loop (e.g. over a list of partitions/dates being submitted).
"""

from __future__ import annotations

import datetime
import sys
import timeit


def estimate_time(
    length: int,
    i: int,
    start_time: float,
    output: bool = True,
) -> datetime.datetime:
    """Estimate when a loop will finish; call at the end of each
    iteration with ``start_time = timeit.default_timer()`` taken before
    the loop (reference: pd_utils/timer.py:6-45).

    :param length: total number of iterations
    :param i: current zero-based iteration index
    :param start_time: ``timeit.default_timer()`` value from before the loop
    :param output: False to suppress the progress line
    :return: estimated wall-clock finish time
    """
    done = i + 1
    per_loop = (timeit.default_timer() - start_time) / done
    remaining_sec = per_loop * (length - done)
    est_finish_time = datetime.datetime.now() + datetime.timedelta(
        seconds=remaining_sec
    )

    if output:
        pct = i / length
        msg = f"Completed {i}/{length} ({pct:.0%}) — ETA {est_finish_time}"
        print(msg, end="\r")
        sys.stdout.flush()

    return est_finish_time
