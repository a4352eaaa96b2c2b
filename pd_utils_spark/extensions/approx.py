"""Approximate aggregates — the 100 TB knobs the exact operators
document as their scale escape hatch (SURVEY.md §2.4: the reference
has no approximate aggregation; these are the engine extension).

- ``approx_count_distinct``: HyperLogLog++, fixed-size sketch per
  group, mergeable map-side — distinct counts without the
  shuffle-everything exact form.
- ``percentile_approx``: t-digest-style quantiles with bounded state
  — the knob for winsorize/portfolio when a single group no longer
  fits an executor (exact ``percentile`` buffers the partition).

No SQL oracle: sketch parameters differ across engines, so driver
checks are rows-only; accuracy is asserted in pytest against exact
values with the documented error bounds.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pd_utils_spark.utils import to_list


def approx_group_stats(
    df: DataFrame,
    byvars: str | Sequence[str],
    distinct_cols: str | Sequence[str] | None = None,
    quantile_cols: str | Sequence[str] | None = None,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    rsd: float = 0.05,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate statistics in ONE aggregation pass:
    ``<col>_approx_distinct`` (HLL++, relative error ``rsd``) and
    ``<col>_q<pct>`` approximate quantiles (error <= 1/``accuracy``
    of rank). Sketches merge map-side, so shuffle volume is
    O(groups x sketch size) regardless of row count.
    """
    byvars_l = to_list(byvars)
    aggs = []
    for c in to_list(distinct_cols):
        aggs.append(F.approx_count_distinct(c, rsd=rsd).alias(f"{c}_approx_distinct"))
    for c in to_list(quantile_cols):
        for q in quantiles:
            pct = str(q).replace("0.", "").ljust(2, "0")
            aggs.append(
                F.percentile_approx(c, q, accuracy).alias(f"{c}_q{pct}")
            )
    if not aggs:
        raise ValueError("pass distinct_cols and/or quantile_cols")
    return df.groupBy(*byvars_l).agg(*aggs)
