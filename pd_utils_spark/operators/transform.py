"""Reshape and within-group transformation operators.

Spark-native re-expression of the reference's transform module
(reference: pd_utils/transform.py). All lazy DataFrame transformations.
"""

from __future__ import annotations

import warnings
from typing import Optional, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pd_utils_spark.utils import numeric_cols, quote, to_list


def averages(
    df: DataFrame,
    avgvars: Union[str, list[str]],
    byvars: Union[str, list[str]],
    wtvar: Optional[str] = None,
    count: Union[str, bool] = False,
    flatten: bool = True,
) -> DataFrame:
    """Equal- and value-weighted within-group means
    (reference: pd_utils/transform.py:110-164).

    Output: one row per group with ``byvars``, the equal-weighted means
    (same column names), optionally ``<count>_count`` (non-missing count
    of that column, as double — the reference takes a group mean of a
    broadcast count), and ``<var>_wavg`` value-weighted means.

    Value-weighted semantics replicate the reference exactly
    (pd_utils/transform.py:150-157): the denominator is the group total
    of ``wtvar`` over ALL rows — rows where the avgvar is null still
    contribute weight — so ``wavg = sum(w*x) / sum(w)``.

    Rows with a null group key are dropped (pandas groupby drops NaN
    keys). ``flatten`` is accepted for API parity (Spark output is always
    flat).

    Plan: a single ``groupBy(byvars).agg(...)`` — map-side partial
    aggregation + one shuffle on the group keys; scales linearly.
    """
    avgvars = to_list(avgvars)
    byvars = to_list(byvars)

    base = df
    for b in byvars:
        base = base.filter(F.col(b).isNotNull())

    aggs = [F.avg(v).alias(v) for v in avgvars]
    if count and isinstance(count, str):
        aggs.append(F.count(count).cast("double").alias(f"{count}_count"))
    if wtvar is not None:
        for v in avgvars:
            aggs.append(
                (F.sum(F.col(v) * F.col(wtvar)) / F.sum(wtvar)).alias(f"{v}_wavg")
            )
        if count and isinstance(count, str):
            # the reference value-weights the broadcast count column too;
            # the count is constant within the group, so its weighted
            # average is just the count itself
            aggs.append(F.count(count).cast("double").alias(f"{count}_count_wavg"))
    return base.groupBy(*byvars).agg(*aggs)


def winsorize(
    df: DataFrame,
    pct: Union[float, tuple],
    subset: Optional[Union[str, list[str]]] = None,
    byvars: Optional[Union[str, list[str]]] = None,
    bot: bool = True,
    top: bool = True,
    exact: bool = True,
) -> DataFrame:
    """Clip values at (group) quantiles (reference:
    pd_utils/transform.py:167-232).

    ``pct`` float -> clip below the ``pct`` and above the ``1-pct``
    quantile; tuple ``(a, b)`` -> below ``a`` and above ``1-b``. Exact
    ``percentile`` (linear interpolation, same as pandas
    ``Series.quantile``) — NOT ``percentile_approx``, which would break
    oracle equality. Nulls stay null.

    Clipping is sequential like the reference kernel
    (pd_utils/transform.py:221-232): the top quantile is computed on the
    raw values and applied, then the bottom quantile is computed on the
    top-clipped values. Both quantiles share one window partitioning, so
    it is still a single shuffle.

    Per-group (``byvars``): one window aggregate per clipped column —
    single shuffle on byvars; the exact percentile buffers each
    partition, acceptable when groups fit in an executor. Global: a
    tiny one-row aggregate broadcast-cross-joined back — no driver
    round trip.

    ``exact=False`` is the extreme-scale knob: ``percentile_approx``
    (t-digest, accuracy 10000) replaces ``percentile`` — constant
    memory per group instead of buffering every value, at the cost of
    approximate cut points (reference/oracle parity requires
    ``exact=True``, the default; SCALE.md round 4 has the measured
    trade).
    """
    assert bot or top
    pfn = "percentile" if exact else "percentile_approx"
    if isinstance(pct, float):
        bot_pct, top_pct = pct, 1 - pct
    else:
        bot_pct, top_pct = pct[0], 1 - pct[1]

    byvars_l = to_list(byvars)
    if subset is None:
        cols = numeric_cols(df, exclude=byvars_l)
    else:
        cols = to_list(subset)

    if byvars_l:
        w = Window.partitionBy(*byvars_l)
        out = df
        # ALL columns' top percentiles share one window spec, so they
        # evaluate in a single WindowExec buffer pass; the top-clipped
        # projections land together; then all bottom percentiles run as
        # a second single pass. 2 partition buffers total for any
        # column count (the per-column interleaving this replaces paid
        # 2 WindowExecs PER column). Still one Exchange.
        if top:
            out = out.select(
                "*",
                *[
                    F.expr(f"{pfn}({quote(c)}, {top_pct})")
                    .over(w)
                    .alias("__hi_" + c)
                    for c in cols
                ],
            )
            out = out.select(
                "*",
                *[
                    F.when(
                        F.col(c).cast("double") > F.col("__hi_" + c),
                        F.col("__hi_" + c),
                    )
                    .otherwise(F.col(c).cast("double"))
                    .alias("__tc_" + c)
                    for c in cols
                ],
            )
        if bot:
            src = {c: ("__tc_" + c) if top else c for c in cols}
            out = out.select(
                "*",
                *[
                    F.expr(f"{pfn}(cast({quote(src[c])} as double), {bot_pct})")
                    .over(w)
                    .alias("__lo_" + c)
                    for c in cols
                ],
            )
        final = []
        for c in cols:
            cc = F.col("__tc_" + c) if top else F.col(c).cast("double")
            if bot:
                cc = F.when(cc < F.col("__lo_" + c), F.col("__lo_" + c)).otherwise(cc)
            final.append(cc.alias("__w_" + c))
        out = out.select(*df.columns, *final)
        out = out.select(*[("__w_" + c) if c in cols else c for c in df.columns])
        for c in cols:
            out = out.withColumnRenamed("__w_" + c, c)
        return out
    # global: tiny aggregate rows broadcast-cross-joined back — no
    # driver round trip, no single giant window partition
    out = df
    if top:
        hi_row = df.agg(
            *[F.expr(f"{pfn}({quote(c)}, {top_pct})").alias("__hi_" + c) for c in cols]
        )
        out = out.crossJoin(F.broadcast(hi_row))
        for c in cols:
            cc = F.col(c).cast("double")
            out = out.withColumn(
                "__tc_" + c, F.when(cc > F.col("__hi_" + c), F.col("__hi_" + c)).otherwise(cc)
            )
        src = {c: "__tc_" + c for c in cols}
    else:
        src = {c: c for c in cols}
    if bot:
        lo_row = out.agg(
            *[
                F.expr(f"{pfn}(cast({quote(src[c])} as double), {bot_pct})").alias("__lo_" + c)
                for c in cols
            ]
        )
        out = out.crossJoin(F.broadcast(lo_row))
        for c in cols:
            cc = F.col(src[c]).cast("double")
            out = out.withColumn(
                "__w_" + c, F.when(cc < F.col("__lo_" + c), F.col("__lo_" + c)).otherwise(cc)
            )
    else:
        for c in cols:
            out = out.withColumn("__w_" + c, F.col(src[c]).cast("double"))
    out = out.select(*[("__w_" + c) if c in cols else c for c in df.columns])
    for c in cols:
        out = out.withColumnRenamed("__w_" + c, c)
    return out


def var_change_by_groups(
    df: DataFrame,
    var: Union[str, list[str]],
    byvars: Union[str, list[str]],
    datevar: str = "Date",
    numlags: int = 1,
) -> DataFrame:
    """Per-group lag difference ``x - lag(x, numlags)`` joined back on
    (datevar, byvars) as ``<var>_change``
    (reference: pd_utils/transform.py:260-292).

    The reference relies on pre-sorted input ("sort before calling");
    Spark DataFrames are unordered, so the in-group order is an explicit
    ``orderBy(datevar)`` — the only sensible order for a lag over time.

    Plan: dedup the (var, byvars, datevar) projection, one window lag
    (shuffle on byvars), then an equi join back on (datevar, byvars).
    """
    var_l, byvars_l, datevar_l = to_list(var), to_list(byvars), to_list(datevar)

    short = df.select(*(var_l + byvars_l + datevar_l))
    for b in byvars_l:
        short = short.filter(F.col(b).isNotNull())
    short = short.dropDuplicates()

    w = Window.partitionBy(*byvars_l).orderBy(*[F.col(d) for d in datevar_l])
    for v in var_l:
        short = short.withColumn(f"{v}_change", F.col(v) - F.lag(v, numlags).over(w))
    short = short.drop(*var_l)
    out = df.join(short, on=datevar_l + byvars_l, how="left")
    return out.select(*df.columns, *[f"{v}_change" for v in var_l])


def long_to_wide(
    df: DataFrame,
    groupvars: Union[str, list[str]],
    values: Union[str, list[str]],
    colindex: Optional[Union[str, list[str]]] = None,
    colindex_only: bool = False,
    ordervar: Optional[str] = None,
    max_columns: int = 10_000,
    aggfunc: str = "first",
) -> DataFrame:
    """Long -> wide pivot (reference: pd_utils/transform.py:11-107).

    One output row per ``groupvars`` combination; one output column per
    distinct ``colindex`` value and ``values`` entry, named
    ``<value><colindex>`` (or the bare colindex when ``colindex_only``).
    Multi-column ``colindex`` values are concatenated with ``_`` (with a
    leading ``_``, matching the reference). When ``colindex`` is None the
    within-group ordinal is used — order given by ``ordervar`` (the
    reference uses physical row order; Spark needs it explicit).

    Exact duplicate rows are dropped first with a warning, like the
    reference. Implemented as one ``groupBy(groupvars)`` with a
    conditional aggregate ``first(when(colindex = v, value))`` per
    output column — a SINGLE shuffle for any number of ``values``
    (Spark's native ``pivot`` pays an extra internal Exchange, and a
    pivot-per-value would pay V of everything); the pivot column set
    is computed in one prior pass.

    ``aggfunc`` extends the reference's ``first`` to pandas
    ``pivot_table`` aggregations (sum/mean/min/max/count) with no plan
    change — still the single conditional aggregation.

    ``max_columns`` guards the pivot width: the distinct colindex
    values become driver-side column metadata (as in Spark's own
    pivot), so hostile cardinality would OOM the driver — exceeding
    the cap raises with the observed cardinality instead.
    """
    groupvars = to_list(groupvars)
    values = to_list(values)
    if colindex_only and len(values) > 1:
        raise NotImplementedError("set colindex_only to False when passing more than one value")

    df = df.dropDuplicates()

    other = [c for c in df.columns if c not in values]
    idx_col = "__idx__"
    if colindex is None:
        order = [F.col(ordervar)] if ordervar else [F.lit(1)]
        w = Window.partitionBy(*groupvars).orderBy(*order)
        df = df.withColumn(idx_col, (F.row_number().over(w) - 1).cast("string"))
        drop_idx = []
    elif isinstance(colindex, list):
        df = df.withColumn(
            idx_col, F.concat(*[F.concat(F.lit("_"), F.col(c).cast("string")) for c in colindex])
        )
        drop_idx = colindex
    else:
        df = df.withColumn(idx_col, F.col(colindex).cast("string"))
        drop_idx = [colindex]

    # columns carried through (everything but values and the colindex cols)
    carry = [c for c in other if c not in drop_idx and c != idx_col]

    pivot_vals = [
        r[0] for r in df.select(idx_col).distinct().limit(max_columns + 1).collect()
    ]
    if len(pivot_vals) > max_columns:
        raise ValueError(
            f"long_to_wide would create more than max_columns={max_columns} "
            f"pivot columns (colindex cardinality > {max_columns}); widen "
            "max_columns explicitly or aggregate the colindex first"
        )
    pivot_vals = sorted(v for v in pivot_vals if v is not None)

    # ONE aggregation for ALL (value, colindex) output columns, as
    # conditional aggregates `first(when(idx = pv, value))` — a single
    # partial-agg + Exchange + final-agg, already in the target
    # `<value><colindex>` names. (Spark's native `pivot` internally
    # runs TWO aggregations — an extra Exchange — and the earlier
    # one-pivot-per-value form paid V pivots + V joins on top; at
    # sf0.1 this form is ~3x faster for 2 values.)
    agg_fns = {
        "first": lambda c: F.first(c, ignorenulls=True),
        "sum": F.sum,
        "mean": F.avg,
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
        "count": F.count,
    }
    if aggfunc not in agg_fns:
        raise ValueError(f"aggfunc must be one of {sorted(agg_fns)}: {aggfunc!r}")
    fn = agg_fns[aggfunc]
    aggs = []
    for value in values:
        for pv in pivot_vals:
            name = str(pv).strip("_") if colindex_only else f"{value}{pv}"
            aggs.append(
                fn(F.when(F.col(idx_col) == F.lit(pv), F.col(value))).alias(name)
            )
    wide = df.groupBy(*groupvars).agg(*aggs)

    carry = [c for c in carry if c not in groupvars]
    if not carry:
        # the aggregate is already one unique row per group — no join,
        # no dropDuplicates needed
        return wide
    base = df.select(*[c for c in df.columns if c in carry or c in groupvars])
    return base.join(wide, on=groupvars, how="left").dropDuplicates()


def wide_to_long(
    df: DataFrame,
    id_vars: Union[str, list[str]],
    value_vars: Optional[Union[str, list[str]]] = None,
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide -> long melt, the inverse of :func:`long_to_wide` (pandas
    ``melt``; the reference ships only the wide direction). One row
    per (id row, value column); ``value_vars`` defaults to every
    non-id column. Implemented on Spark's native ``unpivot`` — a
    zero-shuffle Expand over the scan (each input row fans out to
    ``len(value_vars)`` output rows map-side; nothing is exchanged).

    Value columns are cast to a common type by ``unpivot``; mixing
    incompatible types (string + numeric) raises — cast explicitly
    first, as pandas users do with ``astype``.
    """
    id_l = to_list(id_vars)
    val_l = to_list(value_vars) if value_vars is not None else [
        c for c in df.columns if c not in id_l
    ]
    if not val_l:
        raise ValueError("no value_vars to melt")
    # names go through quote(): unpivot parses bare strings as (maybe
    # nested) attribute paths, so a pivot-generated column like
    # "ret1.5" would otherwise resolve as field `5` of column `ret1`
    # and fail — found by the pivot/melt round-trip property test
    melted = df.unpivot(
        [F.col(quote(c)) for c in id_l],
        [F.col(quote(c)) for c in val_l],
        var_name,
        value_name,
    )
    return melted


def group_rank(
    df: DataFrame,
    col: str,
    byvars: Optional[Union[str, list[str]]] = None,
    method: str = "average",
    pct: bool = False,
    ascending: bool = True,
    out: Optional[str] = None,
) -> DataFrame:
    """Per-group rank transform of ``col`` (pandas ``Series.rank``
    semantics): ``method`` in ``average`` (ties share the mean of
    their min/max ranks), ``min``, ``max``, ``dense``; ``pct=True``
    divides by the group's non-null count (pandas' percentage rank).
    Null values receive null ranks and do not consume rank positions.
    Adds ``<col>_rank`` (or ``out``).

    One window sharing a single hash-partition exchange on ``byvars``
    (the tie-count runs over the (byvars, col) sub-partition of the
    same exchange — no second shuffle). The feature-engineering
    staple: rank/quantile-normalize a signal within each date or
    group before cross-sectional use.
    """
    by = to_list(byvars)
    v = F.col(col)
    order = v.asc_nulls_last() if ascending else v.desc_nulls_last()
    wg = Window.partitionBy(*by).orderBy(order)
    wt = Window.partitionBy(*(by + [col]))
    ties = F.count(v).over(wt)
    if method == "average":
        r = F.rank().over(wg) + (ties - 1) / 2
    elif method == "min":
        r = F.rank().over(wg).cast("double")
    elif method == "max":
        r = (F.rank().over(wg) + ties - 1).cast("double")
    elif method == "dense":
        r = F.dense_rank().over(wg).cast("double")
    else:
        raise ValueError(f"method must be average/min/max/dense: {method!r}")
    if pct:
        wb = Window.partitionBy(*by)
        if method == "dense":
            # pandas divides dense ranks by the DISTINCT value count
            n = F.size(F.collect_set(v).over(wb))
        else:
            n = F.count(v).over(wb)
        r = r / n
    name = out or f"{col}_rank"
    return df.withColumn(name, F.when(v.isNotNull(), r))


_STATES_TO_ABBREV = {
    "Alabama": "AL", "Montana": "MT", "Alaska": "AK", "Nebraska": "NE",
    "Arizona": "AZ", "Nevada": "NV", "Arkansas": "AR", "New Hampshire": "NH",
    "California": "CA", "New Jersey": "NJ", "Colorado": "CO", "New Mexico": "NM",
    "Connecticut": "CT", "New York": "NY", "Delaware": "DE", "North Carolina": "NC",
    "Florida": "FL", "North Dakota": "ND", "Georgia": "GA", "Ohio": "OH",
    "Hawaii": "HI", "Oklahoma": "OK", "Idaho": "ID", "Oregon": "OR",
    "Illinois": "IL", "Pennsylvania": "PA", "Indiana": "IN", "Rhode Island": "RI",
    "Iowa": "IA", "South Carolina": "SC", "Kansas": "KS", "South Dakota": "SD",
    "Kentucky": "KY", "Tennessee": "TN", "Louisiana": "LA", "Texas": "TX",
    "Maine": "ME", "Utah": "UT", "Maryland": "MD", "Vermont": "VT",
    "Massachusetts": "MA", "Virginia": "VA", "Michigan": "MI", "Washington": "WA",
    "Minnesota": "MN", "West Virginia": "WV", "Mississippi": "MS", "Wisconsin": "WI",
    "Missouri": "MO", "Wyoming": "WY",
}


def state_abbrev(df: DataFrame, col: str, toabbrev: bool = False) -> DataFrame:
    """US state name <-> abbreviation map on a column; unmatched values
    pass through (reference: pd_utils/transform.py:295-364).

    Implemented as a literal ``create_map`` lookup + ``coalesce`` —
    stays inside whole-stage codegen; no join, no UDF.
    """
    mapping = _STATES_TO_ABBREV if toabbrev else {v: k for k, v in _STATES_TO_ABBREV.items()}
    pairs = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v)]
    m = F.create_map(*pairs)
    return df.withColumn(col, F.coalesce(m[F.col(col)], F.col(col)))


def join_col_strings(df: DataFrame, cols: Union[str, list[str]], out_col: str = "joined") -> DataFrame:
    """Concatenate stringified columns with ``_`` into ``out_col``
    (reference: pd_utils/transform.py:372-388; returns a Series there —
    here a new column, the Spark-native shape). Null values stringify as
    ``'nan'`` to match ``str(np.nan)``.
    """
    cols = to_list(cols)
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("nan")) for c in cols]
    return df.withColumn(out_col, F.concat_ws("_", *parts))


def flag_outliers(
    df: DataFrame,
    subset: Optional[Union[str, list[str]]] = None,
    byvars: Optional[Union[str, list[str]]] = None,
    method: str = "zscore",
    threshold: float = 3.0,
    suffix: str = "_outlier",
) -> DataFrame:
    """Per-(group) outlier flags — the detection sibling of
    ``winsorize`` (which clips): adds ``<col><suffix>`` boolean columns
    without changing any value.

    Methods (``threshold`` is the multiplier in each rule):

    - ``'zscore'``: ``|x - mean| > threshold * stddev`` (sample stddev)
    - ``'mad'``: ``|x - median| > threshold * 1.4826 * MAD`` where MAD
      is the median absolute deviation (1.4826 makes MAD a consistent
      sigma estimator for normal data — the robust z-score)
    - ``'iqr'``: outside ``[q1 - threshold*iqr, q3 + threshold*iqr]``
      (pass ``threshold=1.5`` for the Tukey fence)

    Quantiles are exact ``percentile`` (linear interpolation) for
    oracle equality, like ``winsorize``. Null inputs and undefined
    scales (single-row groups have null stddev/zero MAD information)
    propagate as null flags — both engines agree on this naturally.

    Plan: grouped = window aggregates sharing ONE hash-partition
    exchange on ``byvars`` (the mad/iqr second pass reuses the same
    partitioning, so still a single shuffle); global = one-row
    aggregates broadcast-cross-joined back, never a single-partition
    window and never a driver round trip.
    """
    if method not in ("zscore", "mad", "iqr"):
        raise ValueError(f"method must be zscore/mad/iqr: {method!r}")
    byvars_l = to_list(byvars)
    cols = to_list(subset) if subset is not None else numeric_cols(df, exclude=byvars_l)

    def zscore_stats(c):
        return {
            "center": F.avg(F.col(c).cast("double")),
            "scale": F.stddev_samp(F.col(c).cast("double")),
        }

    out = df
    if byvars_l:
        w = Window.partitionBy(*byvars_l)
        for c in cols:
            x = F.col(c).cast("double")
            if method == "zscore":
                flag = F.abs(x - F.avg(x).over(w)) > threshold * F.stddev_samp(x).over(w)
            elif method == "mad":
                med = F.expr(f"percentile(cast({quote(c)} as double), 0.5)").over(w)
                out = out.withColumn("__med_" + c, med)
                dev = F.abs(x - F.col("__med_" + c))
                out = out.withColumn("__dev_" + c, dev)
                mad = F.expr(f"percentile(__dev_{c}, 0.5)").over(w)
                flag = F.col("__dev_" + c) > threshold * 1.4826 * mad
            else:  # iqr
                q1 = F.expr(f"percentile(cast({quote(c)} as double), 0.25)").over(w)
                q3 = F.expr(f"percentile(cast({quote(c)} as double), 0.75)").over(w)
                out = out.withColumn("__q1_" + c, q1).withColumn("__q3_" + c, q3)
                iqr = F.col("__q3_" + c) - F.col("__q1_" + c)
                flag = (x < F.col("__q1_" + c) - threshold * iqr) | (
                    x > F.col("__q3_" + c) + threshold * iqr
                )
            out = out.withColumn(c + suffix, flag)
        return out.select(*df.columns, *[c + suffix for c in cols])

    # global: one-row aggregate(s), broadcast cross join — no
    # single-partition window, no driver action
    if method == "zscore":
        aggs = []
        for c in cols:
            x = F.col(c).cast("double")
            aggs += [F.avg(x).alias("__ctr_" + c), F.stddev_samp(x).alias("__scl_" + c)]
        out = df.crossJoin(F.broadcast(df.agg(*aggs)))
        for c in cols:
            x = F.col(c).cast("double")
            out = out.withColumn(
                c + suffix,
                F.abs(x - F.col("__ctr_" + c)) > threshold * F.col("__scl_" + c),
            )
    elif method == "mad":
        meds = df.agg(
            *[
                F.expr(f"percentile(cast({quote(c)} as double), 0.5)").alias("__med_" + c)
                for c in cols
            ]
        )
        out = df.crossJoin(F.broadcast(meds))
        mads = out.agg(
            *[
                F.expr(
                    f"percentile(abs(cast({quote(c)} as double) - __med_{c}), 0.5)"
                ).alias("__mad_" + c)
                for c in cols
            ]
        )
        out = out.crossJoin(F.broadcast(mads))
        for c in cols:
            x = F.col(c).cast("double")
            out = out.withColumn(
                c + suffix,
                F.abs(x - F.col("__med_" + c))
                > threshold * 1.4826 * F.col("__mad_" + c),
            )
    else:  # iqr
        # ONE array-percentile buffer per column (percentile is an
        # ObjectHashAggregate that holds every value — two scalar
        # percentile calls would buffer and merge the column twice)
        qs = df.agg(
            *[
                F.expr(
                    f"percentile(cast({quote(c)} as double), array(0.25, 0.75))"
                ).alias("__q_" + c)
                for c in cols
            ]
        )
        out = df.crossJoin(F.broadcast(qs))
        for c in cols:
            x = F.col(c).cast("double")
            q1 = F.element_at(F.col("__q_" + c), 1)
            q3 = F.element_at(F.col("__q_" + c), 2)
            iqr = q3 - q1
            out = out.withColumn(
                c + suffix,
                (x < q1 - threshold * iqr) | (x > q3 + threshold * iqr),
            )
        out = out.drop(*["__q_" + c for c in cols])
    return out.select(*df.columns, *[c + suffix for c in cols])


def trimmed_mean(
    df: DataFrame,
    cols: Union[str, list[str]],
    byvars: Optional[Union[str, list[str]]] = None,
    pct: float = 0.1,
) -> DataFrame:
    """Per-group trimmed means: for each column in ``cols``, the mean
    of the values STRICTLY inside the [pct, 1-pct] exact-quantile
    band — one output row per group with ``{col}_tmean`` columns,
    plus ``{col}_n_used``. The robust companion to ``winsorize``
    (which CLAMPS tail values and keeps every row; trimming DROPS
    them from the estimate — the textbook trade: winsorizing keeps
    sample size, trimming kills tail influence entirely).

    Boundary semantics: values equal to either quantile are kept
    (trim only what lies strictly outside), so pct=0 degrades to the
    plain mean and ties at the cut never flap with partitioning.

    Scale shape: ONE window pass computes both exact quantiles per
    group for every column (shared partitioning), then ONE
    conditional aggregation — two shuffles total regardless of
    len(cols). Exact percentiles buffer one group per task like
    ``winsorize``; use percentile_approx upstream at extreme group
    sizes.
    """
    from pyspark.sql import Window

    from pd_utils_spark.utils import to_list

    if not 0.0 <= pct < 0.5:
        raise ValueError(f"pct must be in [0, 0.5): {pct}")
    cols_l = to_list(cols)
    by = to_list(byvars) if byvars is not None else []
    w = Window.partitionBy(*[F.col(b) for b in by])
    cur = df
    for c in cols_l:
        v = F.col(c).cast("double")
        cur = cur.withColumn(
            f"__lo_{c}__", F.percentile(v, float(pct)).over(w)
        ).withColumn(
            f"__hi_{c}__", F.percentile(v, float(1.0 - pct)).over(w)
        )
    aggs = []
    for c in cols_l:
        v = F.col(c).cast("double")
        keep = v.isNotNull() & (v >= F.col(f"__lo_{c}__")) & (
            v <= F.col(f"__hi_{c}__")
        )
        aggs.append(F.avg(F.when(keep, v)).alias(f"{c}_tmean"))
        aggs.append(F.sum(keep.cast("long")).alias(f"{c}_n_used"))
    return cur.groupBy(*by).agg(*aggs)


def gaps_and_islands(
    df: DataFrame,
    idcol: str,
    byvars: Optional[Union[str, list[str]]] = None,
) -> DataFrame:
    """Contiguous integer runs ("islands") of ``idcol`` per group:
    one row per island ``(byvars..., island_start, island_end, n)``.
    The classic sequence-completeness audit — missing event ids,
    broken page ranges, gapped batch numbers: the GAPS are exactly
    the spaces between consecutive islands, so a single-island result
    certifies an unbroken sequence. Duplicated ids within a group are
    collapsed first (a duplicate is not a gap).

    Scale shape: one distinct, then the standard dense-rank trick —
    ``id - row_number`` is constant within a run — as ONE window over
    the group partitioning, then one hash agg keyed by the run
    constant. Shuffle volume is O(distinct ids); nothing quadratic,
    no self-join.
    """
    from pyspark.sql import Window

    from pd_utils_spark.utils import to_list

    by = to_list(byvars) if byvars is not None else []
    ids = (
        df.filter(F.col(idcol).isNotNull())
        .select(*by, F.col(idcol).cast("long").alias("__i__"))
        .distinct()
    )
    w = Window.partitionBy(*by).orderBy("__i__")
    runs = ids.withColumn(
        "__k__", F.col("__i__") - F.row_number().over(w)
    )
    return (
        runs.groupBy(*by, "__k__")
        .agg(
            F.min("__i__").alias("island_start"),
            F.max("__i__").alias("island_end"),
            F.count(F.lit(1)).alias("n"),
        )
        .drop("__k__")
    )


def mode_by_groups(
    df: DataFrame,
    col: str,
    byvars: Optional[Union[str, list[str]]] = None,
    out: Optional[str] = None,
) -> DataFrame:
    """Most frequent value of ``col`` per group, one row per group
    ``(byvars..., <out>, n_modal, n_total)`` — ties broken by the
    SMALLEST value so the answer is deterministic under any
    partitioning (pandas ``mode()`` returns all tied values; a
    pipeline needs one). Nulls are excluded from candidacy but
    counted in ``n_total``; all-null groups yield a null mode. The
    categorical imputation / canonical-label primitive next to
    ``fillna_by_groups`` (which fills with a per-group statistic) —
    this EXPOSES the statistic.

    Scale shape: one hash agg to (group, value) counts — the
    compression step, map-side combined — then a rank-1 row_number
    over the per-group distinct values and one total join. Shuffle
    volume is O(distinct (group, value)); never a sort of raw rows.
    """
    from pyspark.sql import Window

    from pd_utils_spark.utils import to_list

    by = to_list(byvars) if byvars is not None else []
    out = out or f"{col}_mode"
    cells = (
        df.groupBy(*by, F.col(col).alias("__v__"))
        .agg(F.count(F.lit(1)).alias("__n__"))
    )
    totals = cells.groupBy(*by).agg(F.sum("__n__").alias("n_total"))
    w = Window.partitionBy(*by).orderBy(
        F.desc("__n__"), F.asc("__v__")
    )
    best = (
        cells.filter(F.col("__v__").isNotNull())
        .withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") == 1)
        .select(
            *by,
            F.col("__v__").alias(out),
            F.col("__n__").alias("n_modal"),
        )
    )
    if by:
        return totals.join(best, by, "left").select(
            *by, out, "n_modal", "n_total"
        )
    # no groups: both frames are one row
    return totals.join(best, F.lit(True), "left").select(
        out, "n_modal", "n_total"
    )
