"""Approximate aggregates — the 100 TB knobs the exact operators
document as their scale escape hatch (SURVEY.md §2.4: the reference
has no approximate aggregation; these are the engine extension).

- ``approx_count_distinct``: HyperLogLog++, fixed-size sketch per
  group, mergeable map-side — distinct counts without the
  shuffle-everything exact form.
- ``percentile_approx``: t-digest-style quantiles with bounded state
  — the knob for winsorize/portfolio when a single group no longer
  fits an executor (exact ``percentile`` buffers the partition).

Sketch parameters differ across engines, so the sketch VALUES have no
SQL oracle; ``approx_group_stats_check`` instead emits exact stats
(oracle-matchable) plus booleans asserting each sketch is within its
documented error bound — a hard cross-engine correctness signal.
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


def approx_group_stats_check(
    df: DataFrame,
    byvars: str | Sequence[str],
    distinct_col: str,
    quantile_col: str,
    q: float = 0.5,
    rsd: float = 0.05,
    accuracy: int = 10_000,
    distinct_tol_sigma: float = 3.0,
    rank_tol: float = 0.01,
    keep_estimates: bool = False,
) -> DataFrame:
    """Per-group EXACT stats plus booleans asserting the sketches of
    ``approx_group_stats`` sit within their documented error bounds:

    - ``n_distinct_exact`` / ``q_exact``: exact distinct count and
      interpolated ``q``-quantile (both ANSI-SQL-computable, so an
      external oracle can hash-match them);
    - ``distinct_within_bound``: |HLL++ estimate - exact| <=
      ``distinct_tol_sigma`` x ``rsd`` x exact (rsd is the sketch's
      relative standard deviation — 3 sigma is a hard bound in
      practice);
    - ``quantile_within_bound``: the approximate quantile's value lies
      between the exact quantiles at rank ``q +- rank_tol`` (the
      sketch guarantees rank error <= 1/accuracy << rank_tol).

    A broken sketch (or a broken exact aggregate) flips a boolean and
    fails the hash — this is the oracle harness for the approx path.

    ``keep_estimates``: also return the raw HLL++ estimate
    (``n_distinct_approx``). The estimate is DETERMINISTIC across
    partitionings (HLL registers are max-merged — order-insensitive),
    so an external oracle can pin its literal value, certifying the
    sketch itself rather than a boolean computed about it. The
    t-digest/GK quantile stays boolean-bounded only: its merge is
    partition-order-sensitive, so its exact value is not pinnable.
    """
    byvars_l = to_list(byvars)
    sk = approx_group_stats(
        df,
        byvars_l,
        distinct_cols=distinct_col,
        quantile_cols=quantile_col,
        quantiles=(q,),
        rsd=rsd,
        accuracy=accuracy,
    )
    pct = str(q).replace("0.", "").ljust(2, "0")
    ad = f"{distinct_col}_approx_distinct"
    aq = f"{quantile_col}_q{pct}"
    # ONE percentile buffer per group (array form), not three — the
    # exact-percentile UDAF buffers every group value per call, so the
    # 3-call form triples agg memory and GC pressure (measured 2-5x
    # slower at sf0.1 with 2M-row groups).
    exact = df.groupBy(*byvars_l).agg(
        F.countDistinct(distinct_col).alias("n_distinct_exact"),
        F.expr(
            f"percentile({quantile_col}, array({q - rank_tol}, {q}, {q + rank_tol}))"
        ).alias("__qs__"),
    ).select(
        *byvars_l,
        "n_distinct_exact",
        F.col("__qs__")[1].alias("q_exact"),
        F.col("__qs__")[0].alias("__qlo__"),
        F.col("__qs__")[2].alias("__qhi__"),
    )
    cols = [
        *byvars_l,
        F.col("n_distinct_exact"),
        F.col("q_exact"),
        (
            F.abs(F.col(ad) - F.col("n_distinct_exact"))
            <= F.lit(distinct_tol_sigma * rsd) * F.col("n_distinct_exact")
        ).alias("distinct_within_bound"),
        F.col(aq).between(F.col("__qlo__"), F.col("__qhi__")).alias(
            "quantile_within_bound"
        ),
    ]
    if keep_estimates:
        cols.insert(len(byvars_l) + 1, F.col(ad).alias("n_distinct_approx"))
    return exact.join(sk, byvars_l).select(*cols)
