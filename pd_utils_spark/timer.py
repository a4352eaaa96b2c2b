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
    avg_time = (timeit.default_timer() - start_time) / (i + 1)
    loops_left = length - (i + 1)
    est_time_remaining = avg_time * loops_left
    est_finish_time = datetime.datetime.now() + datetime.timedelta(
        seconds=est_time_remaining
    )

    if output:
        print(
            "Estimated finish time: {}. Completed {}/{}, ({:.0%})".format(
                est_finish_time, i, length, i / length
            ),
            end="\r",
        )
        sys.stdout.flush()

    return est_finish_time
