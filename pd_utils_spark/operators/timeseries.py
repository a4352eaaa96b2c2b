"""Financial time-series operators: rolling co-movement, bar
aggregation, drawdown.

The reference engine's domain is empirical-finance panels (portfolio
sorts, cumulative returns — pd_utils/port.py, cum.py); these are the
time-series primitives that sit next to those in a real factor
pipeline. All are single-shuffle window/group plans — moving
aggregates over bounded frames, no Python in the row path.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pd_utils_spark.utils import to_list


def _frame(byvars_l: list[str], ordervar, n: int):
    return (
        Window.partitionBy(*byvars_l)
        .orderBy(*to_list(ordervar))
        .rowsBetween(-(n - 1), Window.currentRow)
    )


def rolling_corr(
    df: DataFrame,
    xcol: str,
    ycol: str,
    n: int,
    ordervar: str | Sequence[str],
    byvars: str | Sequence[str] | None = None,
    min_periods: Optional[int] = None,
    out: Optional[str] = None,
) -> DataFrame:
    """Rolling Pearson correlation of two columns over the trailing
    ``n`` rows per group (pandas ``rolling(n).corr`` semantics:
    warm-up rows with fewer than ``min_periods`` (default ``n``)
    complete pairs are null). Appends ``out`` (default
    ``{xcol}_{ycol}_corr{n}``).

    Moment form over ONE bounded window frame — corr = (E[xy] -
    E[x]E[y]) / (sd_x * sd_y), each moment a moving aggregate Spark
    maintains incrementally, O(rows) per group, one shuffle. Rows
    where either side is null are excluded pairwise (all moments
    condition on both present), matching pandas.
    """
    return _rolling_comovement(
        df, xcol, ycol, n, ordervar, byvars, min_periods,
        out or f"{xcol}_{ycol}_corr{n}", kind="corr",
    )


def rolling_beta(
    df: DataFrame,
    ycol: str,
    xcol: str,
    n: int,
    ordervar: str | Sequence[str],
    byvars: str | Sequence[str] | None = None,
    min_periods: Optional[int] = None,
    out: Optional[str] = None,
) -> DataFrame:
    """Rolling OLS slope of ``ycol`` on ``xcol`` over the trailing
    ``n`` rows per group — cov(x, y) / var(x), the market-beta /
    hedge-ratio primitive. Same single-window moment plan as
    :func:`rolling_corr`; appends ``out`` (default
    ``{ycol}_beta_{xcol}{n}``)."""
    return _rolling_comovement(
        df, xcol, ycol, n, ordervar, byvars, min_periods,
        out or f"{ycol}_beta_{xcol}{n}", kind="beta",
    )


def _rolling_comovement(
    df, xcol, ycol, n, ordervar, byvars, min_periods, out, kind
) -> DataFrame:
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    mp = n if min_periods is None else min_periods
    byvars_l = to_list(byvars)
    w = _frame(byvars_l, ordervar, n)
    x = F.col(xcol).cast("double")
    y = F.col(ycol).cast("double")
    both = x.isNotNull() & y.isNotNull()
    px = F.when(both, x)   # pairwise deletion, pandas-style
    py = F.when(both, y)
    cnt = F.count(px).over(w)
    sx = F.sum(px).over(w)
    sy = F.sum(py).over(w)
    sxx = F.sum(px * px).over(w)
    syy = F.sum(py * py).over(w)
    sxy = F.sum(px * py).over(w)
    cov = sxy - sx * sy / cnt
    varx = sxx - sx * sx / cnt
    vary = syy - sy * sy / cnt
    if kind == "corr":
        val = F.when((varx > 0) & (vary > 0), cov / F.sqrt(varx * vary))
    else:
        val = F.when(varx > 0, cov / varx)
    return df.withColumn(out, F.when(cnt >= F.lit(max(mp, 2)), val))


def resample_ohlc(
    df: DataFrame,
    valuecol: str,
    tscol: str,
    byvars: str | Sequence[str] | None = None,
    freq: str = "1 day",
    volumecol: Optional[str] = None,
) -> DataFrame:
    """Bar aggregation (pandas ``resample(freq).ohlc`` semantics):
    per group and time bucket of width ``freq``, the open (value at
    the earliest timestamp), high, low, close (value at the latest
    timestamp), observation count, and — when ``volumecol`` is given —
    the summed volume. Buckets with no rows simply don't appear
    (join :func:`~pd_utils_spark.operators.filldata.add_missing_group_rows`
    to densify).

    One aggregation pass: open/close are ``min_by``/``max_by`` keyed
    by ``struct(ts, value)`` (deterministic tie rule: the SMALLEST
    value at the extreme timestamp), the bucket comes from
    ``F.window`` — a single shuffle on (group, bucket) with map-side
    partial aggregation. The struct ordering key makes Spark pick
    SortAggregate over HashAggregate (struct buffers aren't
    hash-aggregable); the sort is per-partition on the grouping key,
    partials still combine map-side — plan-locked.
    """
    byvars_l = to_list(byvars)
    v = F.col(valuecol).cast("double")
    aggs = [
        F.expr(f"min_by({valuecol}, struct({tscol}, {valuecol}))").cast("double").alias("open"),
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.expr(f"max_by({valuecol}, struct({tscol}, -{valuecol}))").cast("double").alias("close"),
        F.count(v).alias("n_obs"),
    ]
    if volumecol is not None:
        aggs.append(F.sum(F.col(volumecol).cast("double")).alias("volume"))
    out = (
        df.groupBy(*byvars_l, F.window(tscol, freq).alias("__w__"))
        .agg(*aggs)
        .withColumn("bucket_start", F.col("__w__.start"))
        .drop("__w__")
    )
    return out.select("bucket_start", *byvars_l, *[c for c in out.columns if c not in {"bucket_start", *byvars_l}])


def drawdown(
    df: DataFrame,
    valuecol: str,
    ordervar: str | Sequence[str],
    byvars: str | Sequence[str] | None = None,
) -> DataFrame:
    """Per-row drawdown of a value series (equity curve, cumulative
    return index): ``dd = value / running_max(value) - 1`` within each
    group ordered by ``ordervar``, plus the running maximum itself as
    ``{valuecol}_peak``. ``dd`` is 0 at new highs and negative below
    them; ``min(dd)`` per group is the max drawdown.

    One unbounded-preceding running-max window — a moving aggregate,
    one shuffle. Requires positive values (it's a ratio drawdown);
    non-positive peaks yield null rather than a sign-flipped ratio.
    """
    byvars_l = to_list(byvars)
    w = (
        Window.partitionBy(*byvars_l)
        .orderBy(*to_list(ordervar))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col(valuecol).cast("double")
    peak = F.max(v).over(w)
    return df.withColumn(f"{valuecol}_peak", peak).withColumn(
        "drawdown", F.when(peak > 0, v / peak - 1)
    )


def changepoint_mean_shift(
    df: DataFrame,
    valuecol: str,
    ordervar: str,
    byvars: str | Sequence[str] | None = None,
    min_segment: int = 2,
) -> DataFrame:
    """Single most-likely mean-shift changepoint per group (the AMOC —
    at-most-one-changepoint — form of CUSUM segmentation): for every
    split position t in a group of n ordered points, score
    ``stat(t) = sqrt(t (n-t) / n) * |mean(x[1..t]) - mean(x[t+1..n])|``
    (the two-sample z numerator — the classic normalized CUSUM
    statistic) and return the argmax row per group:
    ``(byvars..., split_after, n, mean_before, mean_after, shift,
    stat, stat_norm)`` where ``split_after`` is the LAST ``ordervar``
    value of the left segment and ``stat_norm`` = stat / sample std
    of the whole group (comparable across groups; null for constant
    groups). Splits leaving fewer than ``min_segment`` points on
    either side are not considered; groups smaller than
    ``2 * min_segment`` produce no row.

    Scale shape: everything is bounded per-group window arithmetic
    over ONE shuffle on ``byvars`` (running sum/count + whole-group
    totals share the partitioning); the argmax is a row_number on the
    9-dp-rounded statistic (ulp noise must not outrank the ordervar
    tiebreak) — no self-join, no driver loop, no global window.
    """
    if min_segment < 1:
        raise ValueError(f"min_segment must be >= 1: {min_segment}")
    by = to_list(byvars)
    part = [F.col(b) for b in by]
    w_run = (
        Window.partitionBy(*part)
        .orderBy(F.col(ordervar))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*part)
    v = F.col(valuecol).cast("double")
    base = df.filter(
        F.col(valuecol).isNotNull() & F.col(ordervar).isNotNull()
    ).select(*by, F.col(ordervar), v.alias("__x__"))
    scored = (
        base.withColumn("__st__", F.sum("__x__").over(w_run))
        .withColumn("__t__", F.count(F.lit(1)).over(w_run))
        .withColumn("__sn__", F.sum("__x__").over(w_all))
        .withColumn("__n__", F.count(F.lit(1)).over(w_all))
        .withColumn("__sd__", F.stddev_samp("__x__").over(w_all))
    )
    t, n = F.col("__t__").cast("double"), F.col("__n__").cast("double")
    mean_l = F.col("__st__") / t
    mean_r = (F.col("__sn__") - F.col("__st__")) / (n - t)
    stat = F.sqrt(t * (n - t) / n) * F.abs(mean_l - mean_r)
    cand = (
        scored.filter(
            (F.col("__t__") >= min_segment)
            & (F.col("__n__") - F.col("__t__") >= min_segment)
        )
        .withColumn("__stat__", stat)
        .withColumn("__ml__", mean_l)
        .withColumn("__mr__", mean_r)
    )
    w_rank = Window.partitionBy(*part).orderBy(
        F.desc(F.round(F.col("__stat__"), 9)), F.col(ordervar)
    )
    return (
        cand.withColumn("__rk__", F.row_number().over(w_rank))
        .filter(F.col("__rk__") == 1)
        .select(
            *by,
            F.col(ordervar).alias("split_after"),
            F.col("__n__").alias("n"),
            F.col("__ml__").alias("mean_before"),
            F.col("__mr__").alias("mean_after"),
            (F.col("__mr__") - F.col("__ml__")).alias("shift"),
            F.col("__stat__").alias("stat"),
            F.when(
                F.col("__sd__") > 0, F.col("__stat__") / F.col("__sd__")
            ).alias("stat_norm"),
        )
    )


def mann_kendall(
    df: DataFrame,
    valuecol: str,
    ordervar: str,
    byvars: str | Sequence[str] | None = None,
) -> DataFrame:
    """Mann-Kendall trend test per group: one row
    ``(byvars..., n, s_stat, var_s, z, p_value)`` where
    ``s_stat = sum_{i<j} sign(x_j - x_i)`` over the series ordered by
    ``ordervar``, ``var_s`` is the tie-corrected null variance
    ``(n(n-1)(2n+5) - sum_t t(t-1)(2t+5)) / 18``, ``z`` applies the
    standard continuity correction, and the two-sided ``p_value``
    uses the same Abramowitz-Stegun erfc polynomial as the other
    tests in ``extensions.stats`` (so any engine can replay it). The
    non-parametric monotone-trend screen: metric drift, sensor
    creep, data-quality degradation over ingest batches — where a
    linear-fit t-test is wrecked by outliers.

    S is computed EXACTLY but never pairwise: a divide-and-conquer
    merge count (vectorized ``searchsorted`` at every level) gives
    the discordant-pair count in O(n log^2 n), so a long series
    costs n log n, not n^2/2. Groups need >= 2 rows (smaller groups
    are absent); ties in ``valuecol`` enter both S (as zero signs)
    and the variance correction. Rows with null value/order are
    dropped; ``ordervar`` ties are ordered by value for determinism
    (strict MK assumes distinct observation times).

    Scale shape: ONE shuffle on ``byvars`` + in-partition sort, then
    a single ``mapInPandas`` scan over blocks of complete groups
    (``group_block_stream`` — Arrow/Python overhead per BATCH, not
    per group); O(group) memory, nothing collected.
    """
    import math

    import numpy as np
    import pandas as pd

    from pd_utils_spark.utils import group_block_stream, group_boundaries

    byvars_l = to_list(byvars) if byvars is not None else []
    types = dict(df.dtypes)
    schema = ", ".join(f"`{b}` {types[b]}" for b in byvars_l)
    schema += (", " if schema else "") + (
        "`n` bigint, `s_stat` bigint, `var_s` double, `z` double, "
        "`p_value` double"
    )

    def _discordant(x: "np.ndarray") -> tuple[int, "np.ndarray"]:
        # pairs i<j with x[i] > x[j]; returns (count, sorted x)
        n = x.size
        if n < 2:
            return 0, x
        m = n // 2
        cl, left = _discordant(x[:m])
        cr, right = _discordant(x[m:])
        cross = int(
            (left.size - np.searchsorted(left, right, side="right")).sum()
        )
        return cl + cr + cross, np.sort(np.concatenate((left, right)))

    def _erfc_f(x: float) -> float:
        # A&S 7.1.26 — the identical polynomial extensions.stats._erfc
        # evaluates JVM-side and the DuckDB oracles replay in SQL
        t = 1.0 / (1.0 + 0.3275911 * x)
        poly = (
            0.254829592 * t
            - 0.284496736 * t * t
            + 1.421413741 * t * t * t
            - 1.453152027 * t * t * t * t
            + 1.061405429 * t * t * t * t * t
        )
        return poly * math.exp(-x * x)

    def _mk_row(x: "np.ndarray") -> tuple[int, int, float, float, float]:
        n = int(x.size)
        disc, _ = _discordant(x)
        _, counts = np.unique(x, return_counts=True)
        tied_pairs = int((counts * (counts - 1) // 2).sum())
        total = n * (n - 1) // 2
        s = total - tied_pairs - 2 * disc
        tie_term = int((counts * (counts - 1) * (2 * counts + 5)).sum())
        var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        if s > 0:
            z = (s - 1.0) / math.sqrt(var_s) if var_s > 0 else 0.0
        elif s < 0:
            z = (s + 1.0) / math.sqrt(var_s) if var_s > 0 else 0.0
        else:
            z = 0.0
        p = min(max(_erfc_f(abs(z) / math.sqrt(2.0)), 0.0), 1.0)
        return n, s, var_s, z, p

    def block(pdf: "pd.DataFrame") -> "pd.DataFrame":
        vals = pdf["__x__"].to_numpy(dtype="float64")
        if byvars_l:
            starts, ends = group_boundaries(pdf, byvars_l)
        else:
            starts, ends = [0], [len(pdf)]
        rows = []
        for s0, e0 in zip(starts, ends):
            if e0 - s0 < 2:
                continue
            n, s, var_s, z, p = _mk_row(vals[s0:e0])
            key = {b: pdf[b].iloc[s0] for b in byvars_l}
            rows.append(
                {**key, "n": n, "s_stat": s, "var_s": var_s, "z": z,
                 "p_value": p}
            )
        cols = byvars_l + ["n", "s_stat", "var_s", "z", "p_value"]
        return pd.DataFrame(rows, columns=cols)

    base = df.filter(
        F.col(valuecol).isNotNull() & F.col(ordervar).isNotNull()
    ).select(
        *byvars_l,
        F.col(ordervar).alias("__o__"),
        F.col(valuecol).cast("double").alias("__x__"),
    )
    sort_cols = [F.col(b) for b in byvars_l] + [F.col("__o__"), F.col("__x__")]
    if byvars_l:
        prepared = base.repartition(*byvars_l).sortWithinPartitions(*sort_cols)
        return prepared.mapInPandas(
            group_block_stream(byvars_l, block), schema
        )
    prepared = base.coalesce(1).sortWithinPartitions(*sort_cols)

    def _whole(batches):
        import pandas as pd

        parts = [p for p in batches if len(p)]
        if parts:
            yield block(pd.concat(parts, ignore_index=True))

    return prepared.mapInPandas(_whole, schema)


def theil_sen(
    df: DataFrame,
    valuecol: str,
    ordervar: str,
    byvars: str | Sequence[str] | None = None,
) -> DataFrame:
    """Theil-Sen robust trend per group: one row
    ``(byvars..., n, slope, intercept)`` with ``slope`` the EXACT
    median of all pairwise slopes ``(x_j - x_i) / (t_j - t_i)`` over
    ``t_i < t_j`` and ``intercept = median(x_i - slope * t_i)`` — the
    estimator with a 29% breakdown point that a single outlier
    cannot move, the standard robust companion to
    :func:`mann_kendall` (MK answers "is there a trend", Theil-Sen
    answers "how steep").

    ``ordervar`` must be numeric (cast yourself from dates — epoch
    days keep slopes exactly engine-portable); rows with null
    value/order are dropped; groups need >= 2 DISTINCT order values.

    Scale shape: the pair set is generated by a WITHIN-GROUP
    self-join (one shuffle on ``byvars``, both sides co-partitioned —
    never a global cross join), so cost is sum(n_g^2)/2 pairs: exact
    Theil-Sen is inherently quadratic in group size and meant for
    panels of bounded per-entity series (the repeated-median or
    sampled variants are the escape hatch if a group has millions of
    points). Medians are ``F.percentile`` exact interpolated
    (ANSI percentile_cont — DuckDB ``median`` parity); the slope
    median is broadcast back for the intercept pass, so the
    group-key shuffle is paid twice and nothing else moves.
    """
    byvars_l = to_list(byvars) if byvars is not None else []
    base = (
        df.filter(F.col(valuecol).isNotNull() & F.col(ordervar).isNotNull())
        .select(
            *byvars_l,
            F.col(ordervar).cast("double").alias("__t__"),
            F.col(valuecol).cast("double").alias("__x__"),
        )
    )
    right = base.select(
        *byvars_l,
        F.col("__t__").alias("__t2__"),
        F.col("__x__").alias("__x2__"),
    )
    if byvars_l:
        pairs = base.join(right, byvars_l)
    else:
        pairs = base.crossJoin(right)
    pairs = pairs.filter(F.col("__t__") < F.col("__t2__"))
    slope_expr = (F.col("__x2__") - F.col("__x__")) / (
        F.col("__t2__") - F.col("__t__")
    )
    slopes = pairs.groupBy(*byvars_l).agg(
        F.percentile(slope_expr, 0.5).alias("slope")
    )
    if byvars_l:
        joined = base.join(F.broadcast(slopes), byvars_l)
    else:
        joined = base.crossJoin(F.broadcast(slopes))
    resid = F.col("__x__") - F.col("slope") * F.col("__t__")
    return joined.groupBy(*byvars_l).agg(
        F.count(F.lit(1)).alias("n"),
        F.first("slope").alias("slope"),
        F.percentile(resid, 0.5).alias("intercept"),
    )


def rolling_quantile(
    df: DataFrame,
    valuecol: str,
    ordervar: str,
    byvars: str | Sequence[str] | None = None,
    n: int = 20,
    probs: Sequence[float] = (0.5,),
    min_periods: Optional[int] = None,
) -> DataFrame:
    """Trailing exact rolling quantiles per row: for each row, the
    interpolated quantile of ``valuecol`` over the last ``n`` rows of
    its group (ordered by ``ordervar``), one appended column
    ``{valuecol}_roll_q{prob}`` per prob — pandas
    ``rolling(n, min_periods).quantile(p, 'linear')`` semantics, and
    the window sibling of :func:`rolling_corr` (moments) and
    ``extensions.events.rolling_stats`` (time frames). Rolling
    medians/p95s are the robust alternative to rolling means on
    spiky series. Rows with fewer than ``min_periods`` (default
    ``n``) preceding-inclusive rows get null.

    Scale shape: ONE shuffle on ``byvars`` + one window pass
    computing every requested prob over the same bounded ROWS frame
    (``percentile`` is an exact aggregate over the <= n buffered
    frame rows — bounded memory by construction, and ANSI
    percentile_cont interpolation so any engine replays it).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1: {n}")
    if not probs or any(not 0.0 <= p <= 1.0 for p in probs):
        raise ValueError(f"probs must be fractions in [0, 1]: {probs}")
    mp = n if min_periods is None else int(min_periods)
    byvars_l = to_list(byvars) if byvars is not None else []
    w = _frame(byvars_l, ordervar, n)
    v = F.col(valuecol).cast("double")
    cnt = F.count(v).over(w)
    out = df
    for p in probs:
        out = out.withColumn(
            f"{valuecol}_roll_q{p:g}",
            F.when(cnt >= mp, F.percentile(v, float(p)).over(w)),
        )
    return out
