"""Event-stream analytics operators over the (event_id, ts, user_id,
event_type, value, props) shape: ordered funnels, cohort retention,
and generic per-group top-k. Engine extensions (the reference has no
event operators); all pure DataFrame expressions, oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pd_utils_spark.utils import to_list


def funnel_counts(
    df: DataFrame,
    steps: Sequence[str],
    usercol: str = "user_id",
    tscol: str = "ts",
    typecol: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: for each prefix of ``steps``, the
    number of users who performed those event types IN ORDER (first
    occurrence of step i+1 strictly after the first occurrence of
    step i — the standard first-touch funnel definition).

    One aggregation pass (min event time per user per step as
    conditional aggregates), then a tiny per-user expression — no
    joins, no window over events. Output: (step, step_index, users).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    aggs = [
        F.min(F.when(F.col(typecol) == s, F.col(tscol))).alias(f"__t{i}__")
        for i, s in enumerate(steps)
    ]
    per_user = df.groupBy(usercol).agg(*aggs)

    reached_exprs = []
    cond = None
    for i in range(len(steps)):
        ti = F.col(f"__t{i}__")
        if i == 0:
            cond = ti.isNotNull()
        else:
            cond = cond & ti.isNotNull() & (ti > F.col(f"__t{i - 1}__"))
        reached_exprs.append(F.sum(cond.cast("bigint")).alias(f"__r{i}__"))
    totals = per_user.agg(*reached_exprs)

    rows = None
    for i, s in enumerate(steps):
        row = totals.select(
            F.lit(s).alias("step"),
            F.lit(i).cast("bigint").alias("step_index"),
            F.col(f"__r{i}__").alias("users"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


def cohort_retention(
    df: DataFrame,
    usercol: str = "user_id",
    tscol: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity
    period (cohort), counted in each subsequent activity period.
    Output: (cohort, period_number, users) with period_number 0 = the
    cohort period itself.

    Two aggregations (first-activity per user, then distinct users
    per (cohort, period offset)) — both partially aggregated; no
    window over raw events.

    ``period``: one of hour/day/week/month. Fixed-length periods use
    an epoch-second divisor; month offsets use ``months_between``
    (month lengths vary, so a fixed divisor would miscount).
    """
    fixed_seconds = {"hour": 3600, "day": 86400, "week": 7 * 86400}
    if period not in fixed_seconds and period != "month":
        raise ValueError(
            f"period must be one of {sorted(fixed_seconds) + ['month']}, "
            f"got {period!r}"
        )
    p = F.date_trunc(period, F.col(tscol))
    firsts = df.groupBy(usercol).agg(F.min(p).alias("__cohort__"))
    activity = df.select(usercol, p.alias("__p__")).distinct()
    joined = activity.join(firsts, usercol)
    if period == "month":
        # both sides are month starts -> months_between is integral
        offset = F.round(
            F.months_between(F.col("__p__"), F.col("__cohort__"))
        ).cast("bigint")
    else:
        offset = F.floor(
            (F.col("__p__").cast("long") - F.col("__cohort__").cast("long"))
            / F.lit(fixed_seconds[period])
        ).cast("bigint")
    out = (
        joined.withColumn("period_number", offset)
        .groupBy(F.col("__cohort__").alias("cohort"), "period_number")
        .agg(F.countDistinct(usercol).alias("users"))
    )
    return out


def _epoch_us(col: Column) -> Column:
    """Microsecond epoch of a timestamp column (TIMESTAMP or
    TIMESTAMP_NTZ — NTZ is interpreted in the session timezone, which
    ``session.get_spark`` pins to UTC). Sub-second precision is
    preserved, unlike ``cast('long')`` which floors to whole seconds."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(
    df: DataFrame,
    usercol: str = "user_id",
    tscol: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: str | Sequence[str] | None = None,
    out: str = "session_index",
) -> DataFrame:
    """Gap-based batch sessionization: within each user, a new session
    starts whenever the time since the previous event exceeds
    ``gap_seconds``. Adds ``out`` = 1-based session number per user
    (deterministic given a ``tiebreak`` for equal timestamps).

    Classic lag-then-running-sum formulation: ONE shuffle on the user
    key serves both the lag and the cumulative sum (same window
    partitioning -> a single Exchange + sort in the plan). Contrast
    with ``streaming.session_window_agg`` (the streaming/state-store
    form): this one labels every ROW with its session, which the
    window-agg form cannot do.

    Gaps compare at MICROSECOND precision (``unix_micros``), so a
    true gap of 1800.9 s with ``gap_seconds=1800`` does start a new
    session — whole-second epoch truncation would silently glue such
    sessions together on sub-second event streams.
    """
    from pyspark.sql import Window

    order = [F.col(tscol)] + [F.col(c) for c in to_list(tiebreak)]
    w = Window.partitionBy(usercol).orderBy(*order)
    eus = _epoch_us(F.col(tscol))
    prev = F.lag(eus).over(w)
    is_new = (
        prev.isNull() | ((eus - prev) > F.lit(int(gap_seconds * 1_000_000)))
    ).cast("bigint")
    return df.withColumn(
        out,
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    usercol: str = "user_id",
    tscol: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: str | Sequence[str] | None = None,
) -> DataFrame:
    """Per-session summary built on :func:`sessionize`: (user,
    session_index, n_events, session_start, session_end,
    duration_seconds). The group-by keys are a superset of the
    sessionize window's partition key, so the aggregation reuses the
    existing hash partitioning (no second full shuffle of the event
    rows beyond the hash agg's own exchange on the finer key)."""
    s = sessionize(df, usercol, tscol, gap_seconds, tiebreak)
    eus = _epoch_us(F.col(tscol))
    return s.groupBy(usercol, "session_index").agg(
        F.count("*").alias("n_events"),
        F.min(tscol).alias("session_start"),
        F.max(tscol).alias("session_end"),
        ((F.max(eus) - F.min(eus)) / F.lit(1_000_000.0)).alias("duration_seconds"),
    )


def suppress_repeats(
    df: DataFrame,
    keys: str | Sequence[str],
    tscol: str = "ts",
    within_seconds: float = 10.0,
    tiebreak: str | Sequence[str] | None = None,
) -> DataFrame:
    """Drop repeated events: a row is suppressed when the PREVIOUS
    surviving row with the same ``keys`` is within ``within_seconds``
    — double-click / retry / at-least-once-delivery suppression, the
    event-stream cousin of exact dedup (which has no time bound).

    Semantics (burst rule): within each key, events sorted by
    (ts, tiebreak) split into BURSTS wherever the gap since the
    previous event exceeds the threshold; each burst keeps only its
    first event. A chain of events each within ``within_seconds`` of
    its predecessor therefore collapses to ONE survivor no matter how
    long the chain runs — the session-window dedup rule (identical to
    ``sessionize(gap_seconds=within_seconds)`` + first-row-per-
    session). This is deliberately NOT the "gap since last survivor"
    greedy (which re-admits an event every threshold seconds inside a
    continuous burst and needs a sequential scan); for retry storms
    the burst rule is what you want. One window pass at microsecond
    precision, one shuffle on the keys.
    """
    from pyspark.sql import Window

    keys_l = to_list(keys)
    order = [F.col(tscol)] + [F.col(c) for c in to_list(tiebreak)]
    w = Window.partitionBy(*keys_l).orderBy(*order)
    eus = _epoch_us(F.col(tscol))
    prev = F.lag(eus).over(w)
    gap_us = int(within_seconds * 1_000_000)
    new_burst = (
        F.when(prev.isNull() | ((eus - prev) > gap_us), F.lit(1))
        .otherwise(F.lit(0))
    )
    burst = F.sum(new_burst).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    first_in_burst = F.row_number().over(
        Window.partitionBy(*keys_l, "__burst__").orderBy(*order)
    )
    return (
        df.withColumn("__burst__", burst)
        .withColumn("__fib__", first_in_burst)
        .filter(F.col("__fib__") == 1)
        .drop("__burst__", "__fib__")
    )


def session_paths(
    df: DataFrame,
    usercol: str = "user_id",
    tscol: str = "ts",
    typecol: str = "event_type",
    n: int = 3,
    gap_seconds: int = 1800,
    tiebreak: str | Sequence[str] | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Top event-type paths: the frequency of every length-``n``
    consecutive event-type sequence WITHIN a session, across all
    sessions — ``(path, n_occurrences, n_sessions)``, most frequent
    first. The product-analytics "common journeys" query (what do
    users do right before converting/churning), inexpressible as a
    plain aggregate because order inside the session matters.

    Plan: sessionize (one shuffle on the user key), collect each
    session's ordered type array (same partitioning — no extra
    Exchange), slide an ``n``-window over it JVM-side
    (``transform(sequence(...))`` over the bound array — the shingle
    construction pattern), explode, and count. Path strings join types
    with ``>``; sessions shorter than ``n`` contribute nothing.
    """
    labeled = sessionize(df, usercol, tscol, gap_seconds, tiebreak)
    order = F.struct(
        F.col(tscol), *[F.col(c) for c in to_list(tiebreak)]
    )
    per_session = labeled.groupBy(usercol, "session_index").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(order.alias("o"), F.col(typecol).alias("t")))),
            lambda s: s["t"],
        ).alias("__types__")
    )
    t = F.col("__types__")
    sz = F.size(t)
    idx = F.sequence(F.lit(1), sz - F.lit(n - 1))
    grams = F.when(
        sz >= n,
        F.transform(idx, lambda i: F.concat_ws(">", F.slice(t, i, n))),
    ).otherwise(F.array().cast("array<string>"))
    ex = per_session.select(
        usercol, "session_index", F.explode(grams).alias("path")
    )
    return (
        ex.groupBy("path")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct(usercol, "session_index").alias("n_sessions"),
        )
        .filter(F.col("n_occurrences") >= min_count)
        .orderBy(F.desc("n_occurrences"), "path")
    )


def rolling_stats(
    df: DataFrame,
    valuecol: str,
    tscol: str = "ts",
    byvars: str | Sequence[str] | None = None,
    window_seconds: int = 3600,
    stats: Sequence[str] = ("avg", "sum", "min", "max", "count"),
) -> DataFrame:
    """Trailing time-window statistics per row: for each row, ``stats``
    of ``valuecol`` over rows of the same ``byvars`` group whose
    timestamp lies in ``[ts - window_seconds, ts]`` (inclusive both
    ends — the ANSI RANGE frame). Adds ``{valuecol}_roll_{stat}``.

    A RANGE window over the MICROSECOND-epoch ordering — evaluated in
    one pass per group with a sliding frame (Spark's bounded-preceding
    RANGE frame keeps a moving aggregate; work is O(n) per group, not
    O(n * frame)). The frame is exactly ``[ts - window_seconds, ts]``
    at microsecond precision (whole-second epoch ordering would
    silently widen it to ``[floor(ts) - w, floor(ts)]`` on sub-second
    streams). One shuffle on ``byvars``. The rolling sibling of the
    reference's cumulative ``cumulate`` (pd_utils/cum.py), which has
    no trailing-window form.
    """
    from pyspark.sql import Window

    allowed = {"avg", "sum", "min", "max", "count"}
    bad = set(stats) - allowed
    if bad:
        raise ValueError(f"unsupported stats {sorted(bad)}; allowed {sorted(allowed)}")
    by = to_list(byvars)
    w = (
        Window.partitionBy(*by)
        .orderBy(_epoch_us(F.col(tscol)))
        .rangeBetween(-int(window_seconds * 1_000_000), 0)
    )
    v = F.col(valuecol)
    exprs = {
        "avg": F.avg(v),
        "sum": F.sum(v),
        "min": F.min(v),
        "max": F.max(v),
        "count": F.count(v),
    }
    out = df
    cols = [
        exprs[s].over(w).alias(f"{valuecol}_roll_{s}") for s in stats
    ]
    return out.select("*", *cols)


def rolling_row_stats(
    df: DataFrame,
    valuecol: str,
    n: int,
    ordervar: str | Sequence[str],
    byvars: str | Sequence[str] | None = None,
    stats: Sequence[str] = ("avg", "sum", "min", "max"),
    min_periods: int | None = None,
) -> DataFrame:
    """ROW-count rolling statistics (pandas ``rolling(n)`` semantics):
    for each row, ``stats`` of ``valuecol`` over the previous ``n``
    rows (inclusive) of the same group in ``ordervar`` order. Rows
    with fewer than ``min_periods`` (default ``n``) observations in
    the frame get null — exactly pandas' warm-up behavior. Adds
    ``{valuecol}_roll{n}_{stat}``.

    The rows-based sibling of :func:`rolling_stats` (which frames by
    TIME range): use this one for "last 20 observations" signals
    (moving averages over trading days, lag features), the time one
    for "last hour". Same single-shuffle bounded-frame plan — Spark
    keeps a moving aggregate, O(rows) per group.
    """
    from pyspark.sql import Window

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    allowed = {"avg", "sum", "min", "max"}
    bad = set(stats) - allowed
    if bad:
        raise ValueError(f"unsupported stats {sorted(bad)}; allowed {sorted(allowed)}")
    mp = n if min_periods is None else min_periods
    by = to_list(byvars)
    w = (
        Window.partitionBy(*by)
        .orderBy(*[F.col(c) for c in to_list(ordervar)])
        .rowsBetween(-(n - 1), 0)
    )
    v = F.col(valuecol)
    exprs = {"avg": F.avg(v), "sum": F.sum(v), "min": F.min(v), "max": F.max(v)}
    enough = F.count(v).over(w) >= mp
    cols = [
        F.when(enough, exprs[s].over(w)).alias(f"{valuecol}_roll{n}_{s}")
        for s in stats
    ]
    return df.select("*", *cols)


def top_k_per_group(
    df: DataFrame,
    keys: str | Sequence[str],
    order_col: str,
    k: int = 3,
    descending: bool = True,
    tiebreak: str | Sequence[str] | None = None,
) -> DataFrame:
    """Generic top-k rows per group by ``order_col`` with a
    deterministic tiebreak; adds ``rank`` 1..k. One shuffle; only k
    rows per group survive the window filter (Spark pushes the rank
    predicate into the sort)."""
    from pyspark.sql import Window

    keys_l = to_list(keys)
    order = [F.desc(order_col) if descending else F.asc(order_col)]
    order += [F.col(c) for c in to_list(tiebreak)]
    w = Window.partitionBy(*keys_l).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ewma(
    df: DataFrame,
    valuecol: str,
    ordervar: str | Sequence[str],
    byvars: str | Sequence[str] | None = None,
    alpha: float = 0.5,
    adjust: bool = False,
    out: str | None = None,
) -> DataFrame:
    """Per-group exponentially weighted moving average with pandas
    ``ewm(alpha=..., adjust=...).mean()`` parity — the classic
    smoothing/volatility primitive (EWMA vol, momentum signals,
    metric smoothing) whose recursion ``y_i = (1-a)*y_{i-1} + a*x_i``
    is inherently SEQUENTIAL per group and therefore the textbook
    grouped-map case: Spark windows cannot express it safely (the
    closed form needs ``(1-a)^{-j}`` terms that overflow on long
    groups). Runs as one shuffle on ``byvars`` + in-partition sort +
    a single ``mapInPandas`` scan over blocks of complete groups
    (``group_block_stream``) — Python/Arrow overhead is per BATCH,
    not per group, so high-cardinality keys (the corpus case: one
    tiny series per user) cost the same as a few big ones; O(1)
    state per group.

    ``adjust=False`` (default) is the recursive form above seeded with
    the first value; ``adjust=True`` is pandas' weight-normalized
    form. Appends ``out`` (default ``{valuecol}_ewma``) as double;
    with ``byvars=None`` the whole frame is ONE group (single-task
    sequential — fine for a time series, wrong for a corpus; pass
    group keys at scale).

    Arithmetic note: the recursion runs as an EXPLICIT plain-float
    loop, not pandas' C kernel — compiler FMA contraction inside
    pandas makes its low bits compiler-dependent, while the explicit
    ``y = (1-a)*y + a*x`` ladder is deterministic and reproducible by
    any engine (the DuckDB oracle replays it with ``list_reduce``).
    Parity with ``pandas.ewm`` is to ~1 ulp (pytest-asserted).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    import numpy as np
    import pandas as pd

    out = out or f"{valuecol}_ewma"
    byvars_l = to_list(byvars) if byvars is not None else []
    order_l = to_list(ordervar)
    schema = ", ".join(f"`{n}` {t}" for n, t in df.dtypes) + f", `{out}` double"
    a = float(alpha)
    om = 1.0 - a

    def _scan(vals: list) -> list:
        # plain-float ladder over a Python list: np.float64 iteration
        # boxes every element (~10x slower) and pandas' C kernel has
        # compiler-dependent FMA low bits — this is the deterministic
        # form the DuckDB oracle replays
        ys = []
        y = None
        wsum = 0.0
        wval = 0.0
        for x in vals:
            x = float(x)
            if adjust:
                # y_i = sum w_j x_j / sum w_j with w_j = (1-a)^(i-j)
                wval = om * wval + x
                wsum = om * wsum + 1.0
                y = wval / wsum
            else:
                y = x if y is None else om * y + a * x
            ys.append(y)
        return ys

    from pd_utils_spark.utils import group_block_stream, group_boundaries

    def block(pdf: "pd.DataFrame") -> "pd.DataFrame":
        vals = pdf[valuecol].to_numpy().tolist()
        ys = np.empty(len(pdf), dtype="float64")
        if byvars_l:
            starts, ends = group_boundaries(pdf, byvars_l)
        else:
            starts, ends = [0], [len(pdf)]
        for s, e in zip(starts, ends):
            ys[s:e] = _scan(vals[s:e])
        pdf = pdf.copy()
        pdf[out] = ys
        return pdf

    sort_cols = [F.col(b) for b in byvars_l] + [
        F.col(c).asc_nulls_last() for c in order_l
    ]
    if byvars_l:
        prepared = df.repartition(*byvars_l).sortWithinPartitions(*sort_cols)
    else:
        # whole frame is ONE group: a single-task total order
        prepared = df.coalesce(1).sortWithinPartitions(*sort_cols)
    def _whole(batches):
        parts = [p for p in batches if len(p)]
        if parts:
            yield block(pd.concat(parts, ignore_index=True))

    return prepared.mapInPandas(
        group_block_stream(byvars_l, block) if byvars_l else _whole, schema
    )


def attribution(
    df: DataFrame,
    usercol: str = "user_id",
    tscol: str = "ts",
    typecol: str = "event_type",
    conversion: str = "purchase",
    touches: Sequence[str] | None = None,
    model: str = "last_touch",
    lookback_seconds: int | None = None,
    halflife_seconds: float = 86_400.0,
) -> DataFrame:
    """Multi-touch conversion attribution: distribute each conversion
    event's credit over the touch events that preceded it, then roll
    credit up per channel (``typecol``). Returns one row per channel:
    ``(channel, touches, conversions, credit)`` — ``touches`` = touch
    events attached to any conversion, ``conversions`` = distinct
    conversions the channel participated in, ``credit`` = the model's
    fractional credit sum (for every normalized model, total credit
    across channels = number of attributed conversions).

    Models (the standard marketing-analytics set):

    - ``last_touch`` / ``first_touch``: winner-takes-one;
    - ``linear``: 1/k to each of the k touches;
    - ``position``: U-shaped 40/20.../40 — 0.4 first, 0.4 last,
      0.2 split over interior touches (k=1 -> 1.0, k=2 -> 0.5/0.5);
    - ``time_decay``: weight 2^(-age/halflife), normalized per
      conversion.

    A touch attaches to the NEXT conversion of the same user (strictly
    later timestamp; ties by a later event being the conversion are
    excluded to keep attach deterministic), optionally only within
    ``lookback_seconds``. Touches after a user's last conversion and
    conversions with no preceding touch simply don't appear.

    Scale shape: one shuffle on the user, one bounded backward-looking
    window pass to stamp each touch with its next conversion time
    (min-over-following of the conversion timestamps), one (user,
    conversion) aggregation for the per-conversion totals the
    normalized models need (broadcast-free: rejoined on the composite
    key, AQE picks the strategy), and one final channel aggregation.
    Never a self-join of events against events.
    """
    allowed = ("last_touch", "first_touch", "linear", "position", "time_decay")
    if model not in allowed:
        raise ValueError(f"model must be one of {allowed}: {model!r}")
    t = F.col(typecol)
    base = df.select(
        F.col(usercol).alias("__u__"),
        _epoch_us(F.col(tscol)).alias("__t__"),
        t.alias("__ch__"),
        (t == conversion).alias("__conv__"),
    )
    if touches is not None:
        base = base.filter(F.col("__conv__") | t.isin(list(touches)))
    else:
        base = base.filter(F.col("__conv__") | (t != conversion))
    # RANGE frame (not ROWS): "next conversion" means STRICTLY later
    # in event time — with ROWS, a conversion tied on the timestamp
    # could mask a later one depending on arbitrary tie order
    w = (
        Window.partitionBy("__u__")
        .orderBy("__t__")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    stamped = base.withColumn(
        "__next_conv__",
        F.min(F.when(F.col("__conv__"), F.col("__t__"))).over(w),
    )
    attached = stamped.filter(
        (~F.col("__conv__")) & F.col("__next_conv__").isNotNull()
    )
    if lookback_seconds is not None:
        attached = attached.filter(
            F.col("__next_conv__") - F.col("__t__")
            <= F.lit(int(lookback_seconds) * 1_000_000)
        )
    age = (F.col("__next_conv__") - F.col("__t__")).cast("double") / 1e6
    raw_w = {
        "last_touch": F.lit(1.0),
        "first_touch": F.lit(1.0),
        "linear": F.lit(1.0),
        "position": F.lit(1.0),
        "time_decay": F.pow(F.lit(2.0), -age / F.lit(float(halflife_seconds))),
    }[model]
    attached = attached.withColumn("__w__", raw_w)
    gw = Window.partitionBy("__u__", "__next_conv__")
    k = F.count(F.lit(1)).over(gw)
    wsum = F.sum("__w__").over(gw)
    first_t = F.min("__t__").over(gw)
    last_t = F.max("__t__").over(gw)
    if model == "last_touch":
        credit = F.when(F.col("__t__") == last_t, 1.0).otherwise(0.0)
        # ties on the max timestamp: split evenly (deterministic)
        nmax = F.sum((F.col("__t__") == last_t).cast("int")).over(gw)
        credit = credit / nmax
    elif model == "first_touch":
        nmin = F.sum((F.col("__t__") == first_t).cast("int")).over(gw)
        credit = F.when(F.col("__t__") == first_t, 1.0).otherwise(0.0) / nmin
    elif model == "linear":
        credit = F.lit(1.0) / k
    elif model == "time_decay":
        credit = F.col("__w__") / wsum
    else:  # position
        nmin = F.sum((F.col("__t__") == first_t).cast("int")).over(gw)
        nmax = F.sum((F.col("__t__") == last_t).cast("int")).over(gw)
        is_first = F.col("__t__") == first_t
        is_last = F.col("__t__") == last_t
        interior = k - nmin - nmax
        credit = (
            F.when(k == 1, 1.0)
            .when(first_t == last_t, F.lit(1.0) / k)  # all touches tied
            .otherwise(
                F.when(is_first, F.lit(0.4) / nmin).otherwise(0.0)
                + F.when(is_last, F.lit(0.4) / nmax).otherwise(0.0)
                + F.when(
                    ~is_first & ~is_last,
                    F.when(interior > 0, F.lit(0.2) / interior).otherwise(0.0),
                ).otherwise(0.0)
            )
        )
        # k == 2 (or first/last groups covering everything): renormalize
        # the missing interior 0.2 proportionally
        total = F.sum(credit).over(gw)
        credit = credit / total
    return (
        attached.withColumn("__credit__", credit)
        .groupBy(F.col("__ch__").alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("touches"),
            F.countDistinct("__u__", "__next_conv__").alias("conversions"),
            F.sum("__credit__").alias("credit"),
        )
    )


def cooccurrence_lift(
    df: DataFrame,
    groupcol: str = "user_id",
    itemcol: str = "event_type",
    min_support: int = 1,
) -> DataFrame:
    """Market-basket association mining over (basket, item) rows: for
    every ordered item pair (a, b) present together in at least
    ``min_support`` baskets, the classic association measures —
    ``support`` = P(a and b), ``confidence`` = P(b | a), ``lift`` =
    P(a and b) / (P(a) P(b)) (>1: positive association, <1:
    substitution/avoidance). Rows per pair are ordered (a -> b) and
    (b -> a) both appear, since confidence is directional.

    Scale shape: baskets compress to DISTINCT (group, item) pairs
    (one partial-agg shuffle); the pair join fans out on the BASKET
    key, so a basket with m distinct items contributes m(m-1) pair
    rows — bounded by the item universe per basket, never
    corpus x corpus (the standard a-priori first pass; cap the item
    universe upstream if baskets can be pathologically wide). Totals
    join back as one broadcast of the per-item basket counts and a
    one-row basket count. No driver action, nothing collected.
    """
    gi = (
        df.select(
            F.col(groupcol).alias("__g__"), F.col(itemcol).alias("__i__")
        )
        .filter(F.col("__g__").isNotNull() & F.col("__i__").isNotNull())
        .distinct()
    )
    item_counts = gi.groupBy("__i__").agg(F.count(F.lit(1)).alias("__ni__"))
    n_baskets = gi.agg(
        F.countDistinct("__g__").cast("double").alias("__nb__")
    )
    a = gi.select(F.col("__g__"), F.col("__i__").alias("item_a"))
    b = gi.select(F.col("__g__"), F.col("__i__").alias("item_b"))
    pairs = (
        a.join(b, "__g__")
        .filter(F.col("item_a") != F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    ca = F.broadcast(
        item_counts.select(F.col("__i__").alias("item_a"), F.col("__ni__").alias("__na__"))
    )
    cb = F.broadcast(
        item_counts.select(F.col("__i__").alias("item_b"), F.col("__ni__").alias("__nb2__"))
    )
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a", "item_b", "n_ab",
            (F.col("n_ab") / F.col("__nb__")).alias("support"),
            (F.col("n_ab").cast("double") / F.col("__na__")).alias("confidence"),
            (
                F.col("n_ab") * F.col("__nb__")
                / (F.col("__na__") * F.col("__nb2__")).cast("double")
            ).alias("lift"),
        )
    )


def diff_in_diff(
    df: DataFrame,
    valuecol: str,
    treatcol: str,
    postcol: str,
) -> DataFrame:
    """Two-by-two difference-in-differences: one row with the four
    cell means (control/treated x pre/post), the two first
    differences, and the DiD estimate
    ``(treated_post - treated_pre) - (control_post - control_pre)`` —
    the canonical quasi-experimental effect estimate when treatment
    wasn't randomized but trends are parallel.

    ``treatcol`` / ``postcol`` must be boolean (or 0/1) columns. One
    conditional-aggregation pass over the data — four means from a
    single scan, no shuffle beyond the 1-row agg. Pair with
    :func:`poisson_bootstrap_ci` on the per-cell means for
    uncertainty."""
    v = F.col(valuecol)
    t = F.col(treatcol).cast("boolean")
    p = F.col(postcol).cast("boolean")
    agg = df.filter(v.isNotNull() & t.isNotNull() & p.isNotNull()).agg(
        F.avg(F.when(~t & ~p, v)).alias("control_pre"),
        F.avg(F.when(~t & p, v)).alias("control_post"),
        F.avg(F.when(t & ~p, v)).alias("treated_pre"),
        F.avg(F.when(t & p, v)).alias("treated_post"),
        F.sum((t & p).cast("long")).alias("n_treated_post"),
    )
    return agg.select(
        "control_pre", "control_post", "treated_pre", "treated_post",
        (F.col("control_post") - F.col("control_pre")).alias("control_diff"),
        (F.col("treated_post") - F.col("treated_pre")).alias("treated_diff"),
        (
            (F.col("treated_post") - F.col("treated_pre"))
            - (F.col("control_post") - F.col("control_pre"))
        ).alias("did_estimate"),
        "n_treated_post",
    )


def seasonal_anomalies(
    df: DataFrame,
    tscol: str = "ts",
    valuecol: str = "value",
    bycols: str | Sequence[str] | None = None,
    season: str = "hour_of_week",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Seasonal-baseline anomaly detection: aggregate ``valuecol``
    into time buckets, learn a per-(group, season-slot) baseline
    (mean/std over the bucket series), and flag buckets whose value
    is more than ``z_threshold`` baseline standard deviations out —
    the ops-monitoring workhorse for metrics with daily/weekly shape,
    where a global z-score would flag every Monday morning.

    ``season``: ``hour_of_week`` (168 slots — the common web-traffic
    shape), ``hour_of_day`` (24) or ``day_of_week`` (7). Output: one
    row per (group, bucket) with ``bucket_start``, ``slot``,
    ``bucket_value``, ``baseline_mean``, ``baseline_std``, ``z``,
    ``is_anomaly``. Buckets are hourly for hour-granular seasons,
    daily for ``day_of_week``. A slot seen once has null std -> null
    z -> never flagged (no division by zero).

    Scale shape: one (group, bucket) aggregation compresses the raw
    stream; the baseline re-aggregates THAT frame per (group, slot)
    and joins back — both shuffles are O(buckets), the raw events
    shuffle once. Self-inclusion caveat documented: each bucket is
    part of its own baseline (standard for retrospective audits; for
    ONLINE detection exclude it or train on a frozen window).
    """
    seasons = {
        "hour_of_week": ("hour", (F.dayofweek(F.col("__b__")) - 1) * 24
                         + F.hour(F.col("__b__"))),
        "hour_of_day": ("hour", F.hour(F.col("__b__"))),
        "day_of_week": ("day", F.dayofweek(F.col("__b__")) - 1),
    }
    if season not in seasons:
        raise ValueError(
            f"season must be one of {sorted(seasons)}: {season!r}"
        )
    trunc_unit, slot_expr = seasons[season]
    by = to_list(bycols)
    from pd_utils_spark.utils import materialize

    # materialize: the bucketed frame feeds BOTH the output rows and
    # the baseline re-aggregation — without it each branch re-runs the
    # raw-stream scan+agg (measured as two parquet scans in the plan)
    bucketed = materialize(
        df.filter(F.col(tscol).isNotNull())
        .withColumn("__b__", F.date_trunc(trunc_unit, F.col(tscol)))
        .groupBy(*by, "__b__")
        .agg(F.sum(F.col(valuecol)).alias("bucket_value"))
        .withColumn("slot", slot_expr.cast("int"))
    )
    baseline = bucketed.groupBy(*by, "slot").agg(
        F.avg("bucket_value").alias("baseline_mean"),
        F.stddev_samp("bucket_value").alias("baseline_std"),
        F.count(F.lit(1)).alias("baseline_n"),
    )
    joined = bucketed.join(baseline, [*by, "slot"])
    z = F.when(
        F.col("baseline_std") > 0,
        (F.col("bucket_value") - F.col("baseline_mean"))
        / F.col("baseline_std"),
    )
    return joined.select(
        *by,
        F.col("__b__").alias("bucket_start"),
        "slot", "bucket_value", "baseline_mean", "baseline_std",
        "baseline_n",
        z.alias("z"),
        F.coalesce(
            F.abs(z) > F.lit(float(z_threshold)), F.lit(False)
        ).alias("is_anomaly"),
    )


def decayed_agg(
    df: DataFrame,
    valuecol: str,
    tscol: str,
    byvars: str | Sequence[str],
    half_life: float,
    ref_time=None,
    out: str = "decayed_sum",
) -> DataFrame:
    """Recency-weighted (exponential time-decay) aggregation — the
    feature-store staple "user's purchase value, half-life 7 days":

        out = sum_i value_i * 0.5 ** (age_i / half_life)

    per group, where ``age_i`` is seconds from the row's ``tscol`` to
    ``ref_time``. ``ref_time`` defaults to the frame's max timestamp
    (computed once, broadcast as one row — NOT per group, so scores
    are comparable across groups and the result is a pure function of
    the data). Also returns ``n`` (rows) and ``last_ts`` per group.

    Unlike a windowed "last N days" sum, the decay never forgets
    abruptly and needs no window boundary tuning; unlike a recursive
    EWMA it is order-free — a plain weighted SUM, so it partial-aggs
    map-side and shuffles one row per group at any scale.
    """
    from pd_utils_spark.utils import to_list

    if half_life <= 0:
        raise ValueError(f"half_life must be > 0: {half_life}")
    by_l = to_list(byvars)
    # microsecond epochs (matching _epoch_us used by attribution/rfm):
    # unix_timestamp() truncates to whole seconds, silently losing
    # sub-second recency on TIMESTAMP(NANOS)/micros event data
    ts_us = _epoch_us(F.col(tscol)).cast("double")
    base = df.filter(F.col(valuecol).isNotNull() & F.col(tscol).isNotNull())
    if ref_time is None:
        ref = F.broadcast(
            base.agg(
                _epoch_us(F.max(tscol)).cast("double").alias("__ref__")
            )
        )
        base = base.join(ref)
        ref_col = F.col("__ref__")
    else:
        ref_col = _epoch_us(F.lit(ref_time)).cast("double")
    age_s = (ref_col - ts_us) / F.lit(1_000_000.0)
    w = F.pow(F.lit(0.5), age_s / F.lit(float(half_life)))
    return base.groupBy(*by_l).agg(
        F.sum(F.col(valuecol) * w).alias(out),
        F.count(F.lit(1)).alias("n"),
        F.max(tscol).alias("last_ts"),
    )


def event_transitions(
    df: DataFrame,
    usercol: str = "user_id",
    tscol: str = "ts",
    eventcol: str = "event_type",
) -> DataFrame:
    """First-order Markov transition matrix of an event stream: for
    every ordered pair of CONSECUTIVE events within a user's
    timeline, ``(prev_event, event, n, prob)`` where ``prob`` is the
    row-normalized transition probability P(event | prev_event).
    The journey-structure summary behind "what happens after an
    error" / "which step leaks users" questions — the matrix form of
    :func:`session_paths` (which enumerates full n-gram paths).
    Timestamp ties are ordered by the event value itself so the
    matrix is deterministic under re-partitioning.

    Scale shape: ONE window shuffle on ``usercol`` for the lag, one
    hash aggregation to the (prev, next) pair level (vocabulary-
    sized, tiny), and the normalizing row totals computed by a
    second aggregation on that tiny frame joined back — never a
    window over raw events.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(usercol).orderBy(F.col(tscol), F.col(eventcol))
    pairs = (
        df.filter(F.col(tscol).isNotNull() & F.col(eventcol).isNotNull())
        .select(
            F.lag(eventcol).over(w).alias("prev_event"),
            F.col(eventcol).alias("event"),
        )
        .filter(F.col("prev_event").isNotNull())
        .groupBy("prev_event", "event")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("prev_event").agg(F.sum("n").alias("__t__"))
    return (
        pairs.join(F.broadcast(totals), "prev_event")
        .select(
            "prev_event",
            "event",
            "n",
            (F.col("n").cast("double") / F.col("__t__").cast("double")).alias(
                "prob"
            ),
        )
    )


def cohort_ltv(
    df: DataFrame,
    usercol: str = "user_id",
    tscol: str = "ts",
    valuecol: str = "value",
    period: str = "week",
) -> DataFrame:
    """Cohort lifetime-value curve: users grouped by first-activity
    period (cohort), with the per-cohort CUMULATIVE value through
    each subsequent period normalized per cohort user —
    ``(cohort, period_number, cohort_users, period_value, cum_value,
    ltv_per_user)``. The revenue companion to
    :func:`cohort_retention` (which counts who comes back, while
    this sums what they bring): flat curves = one-shot users,
    steadily climbing = compounding value, and comparing curves
    across cohorts is THE acquisition-quality read.

    Scale shape: one first-activity agg per user, one
    (cohort, period) hash agg over user-stamped events, then the
    cumulative window runs on the TINY cohort x period frame —
    no window over raw events, same plan discipline as
    cohort_retention.
    """
    from pyspark.sql import Window

    if period not in ("hour", "day", "week", "month"):
        raise ValueError(f"period must be hour/day/week/month: {period}")
    first = (
        df.filter(F.col(tscol).isNotNull())
        .groupBy(usercol)
        .agg(F.min(F.date_trunc(period, F.col(tscol))).alias("__c0__"))
    )
    sizes = first.groupBy("__c0__").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    stamped = df.filter(F.col(tscol).isNotNull()).join(first, usercol)
    if period == "month":
        offset = (
            (F.year(F.col(tscol)) - F.year("__c0__")) * 12
            + (F.month(F.col(tscol)) - F.month("__c0__"))
        )
    else:
        secs = {"hour": 3600, "day": 86400, "week": 604800}[period]
        offset = F.floor(
            (
                F.unix_timestamp(F.date_trunc(period, F.col(tscol)))
                - F.unix_timestamp(F.col("__c0__"))
            )
            / F.lit(secs)
        )
    per = (
        stamped.groupBy(
            F.col("__c0__").alias("cohort"),
            offset.cast("int").alias("period_number"),
        )
        .agg(F.sum(F.col(valuecol).cast("double")).alias("period_value"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("period_number")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per.withColumn("cum_value", F.sum("period_value").over(w))
        .join(
            F.broadcast(sizes.withColumnRenamed("__c0__", "cohort")),
            "cohort",
        )
        .select(
            "cohort",
            "period_number",
            "cohort_users",
            "period_value",
            "cum_value",
            (
                F.col("cum_value") / F.col("cohort_users").cast("double")
            ).alias("ltv_per_user"),
        )
    )
