"""Dataset profiling for large-scale pipelines: numeric histograms,
per-column summary profiles, and token-length histograms (the input
to sequence-packing batch-shape planning).

Scale shape: every operator is one (or two chained) aggregation
passes with map-side partial aggregation — shuffle volume is
O(buckets) or O(columns), never O(rows). Range bounds needed by the
histogram are computed as a one-row aggregate cross-joined back into
the plan (no ``.collect()`` round trip, mirroring the portfolio
cutoff design in ``operators/port.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pd_utils_spark.extensions.text import _token_count
from pd_utils_spark.utils import materialize


def numeric_histogram(
    df: DataFrame,
    col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
    include_empty: bool = True,
) -> DataFrame:
    """Equi-width histogram of a numeric column: one row per bucket
    with ``bucket`` (0-based), ``bucket_lo``/``bucket_hi`` bounds and
    ``count``. Values at the upper edge land in the last bucket (the
    classic closed-last-bucket rule); nulls and NaNs are excluded.

    ``lo``/``hi`` default to the observed min/max (computed as a
    one-row aggregate joined back — no driver action). With
    ``include_empty`` every bucket appears even at count 0 (broadcast
    join against ``spark.range(bins)``).
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1: {bins}")
    c = F.col(col).cast("double")
    base = df.filter(c.isNotNull() & ~F.isnan(c))
    if lo is None or hi is None:
        bounds = base.agg(
            F.min(c).alias("__lo__"), F.max(c).alias("__hi__")
        )
        if lo is not None:
            bounds = bounds.withColumn("__lo__", F.lit(float(lo)))
        if hi is not None:
            bounds = bounds.withColumn("__hi__", F.lit(float(hi)))
        base = base.crossJoin(F.broadcast(bounds))
    else:
        base = base.withColumn("__lo__", F.lit(float(lo))).withColumn(
            "__hi__", F.lit(float(hi))
        )
    width_frac = (c - F.col("__lo__")) / (F.col("__hi__") - F.col("__lo__"))
    bucket = F.when(
        F.col("__hi__") == F.col("__lo__"), F.lit(0)
    ).otherwise(
        F.least(F.lit(bins - 1), F.floor(width_frac * bins).cast("int"))
    )
    counted = (
        base.filter(c.between(F.col("__lo__"), F.col("__hi__")))
        .withColumn("__b__", bucket)
        .groupBy("__b__")
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.first("__lo__").alias("__lo__"),
            F.first("__hi__").alias("__hi__"),
        )
    )
    if include_empty:
        spark = df.sparkSession
        allb = F.broadcast(spark.range(bins).select(F.col("id").cast("int").alias("bucket")))
        onerow = F.broadcast(
            base.agg(F.first("__lo__").alias("__lo__"), F.first("__hi__").alias("__hi__"))
        )
        counted = allb.crossJoin(onerow).join(
            counted.withColumnRenamed("__b__", "bucket").drop("__lo__", "__hi__"),
            "bucket",
            "left",
        ).withColumn("count", F.coalesce("count", F.lit(0)))
    else:
        counted = counted.withColumnRenamed("__b__", "bucket")
    w = (F.col("__hi__") - F.col("__lo__")) / bins
    return counted.select(
        "bucket",
        (F.col("__lo__") + F.col("bucket") * w).alias("bucket_lo"),
        (F.col("__lo__") + (F.col("bucket") + 1) * w).alias("bucket_hi"),
        "count",
    )


def column_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Long-format per-column profile: (column, n, n_null, n_distinct,
    min, max, mean, std) — a distributed ``describe`` over all columns
    (column-count rows out). Numeric stats are null for non-numeric
    columns; min/max are casted-to-string for portability.

    Runs as TWO single-row aggregation passes over the column-pruned
    scan, broadcast-cross-joined: plain stats in one, the exact
    ``countDistinct`` set in the other. Mixing them in one ``agg``
    makes Catalyst rewrite via Expand — every input row is replicated
    (k_distinct + 1)× through the first shuffle and every plain
    aggregate re-evaluates over the expanded rows (measured ~4× slower
    at sf0.1 than the two separate passes, and at 100 TB the Expand
    turns a 100 TB scan into a 400 TB shuffle input). Two pruned scans
    are strictly cheaper; the distinct pass still gets partial-agg on
    (gid, value)."""
    numeric = {
        name for name, dtype in df.dtypes
        if name in cols
        and (
            dtype in ("tinyint", "smallint", "int", "bigint", "float", "double")
            or dtype.startswith("decimal")
        )
    }
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}__"),
            F.sum(col.isNull().cast("long")).alias(f"__nn_{c}__"),
            F.min(col).cast("string").alias(f"__min_{c}__"),
            F.max(col).cast("string").alias(f"__max_{c}__"),
        ]
        if c in numeric:
            aggs += [
                F.avg(col.cast("double")).alias(f"__mean_{c}__"),
                F.stddev_samp(col.cast("double")).alias(f"__std_{c}__"),
            ]
    distincts = df.agg(
        *[F.countDistinct(F.col(c)).alias(f"__nd_{c}__") for c in cols]
    )
    one = df.agg(*aggs).crossJoin(F.broadcast(distincts))
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__n_{c}__").alias("n"),
            F.col(f"__nn_{c}__").alias("n_null"),
            F.col(f"__nd_{c}__").alias("n_distinct"),
            F.col(f"__min_{c}__").alias("min"),
            F.col(f"__max_{c}__").alias("max"),
            (F.col(f"__mean_{c}__") if c in numeric else F.lit(None).cast("double")).alias("mean"),
            (F.col(f"__std_{c}__") if c in numeric else F.lit(None).cast("double")).alias("std"),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def corr_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Long-format pairwise Pearson correlation of ``cols``:
    (col_a, col_b, corr) for every unordered pair a < b, computed as
    ONE aggregation pass (k*(k-1)/2 ``F.corr`` aggregates share the
    single scan — no per-pair jobs, nothing collected). The
    distributed, composable cousin of the reference's presentation-
    oriented ``formatted_corr_df`` (which collects a k×k display
    frame); use this one inside pipelines at scale.
    """
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError(f"need at least 2 columns, got {cols}")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    one = df.agg(
        *[
            F.corr(F.col(a).cast("double"), F.col(b).cast("double")).alias(
                f"__c_{i}__"
            )
            for i, (a, b) in enumerate(pairs)
        ]
    )
    rows = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col(f"__c_{i}__").alias("corr"),
        )
        for i, (a, b) in enumerate(pairs)
    ]
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def group_quantiles(
    df: DataFrame,
    valuecol: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    byvars: str | Sequence[str] | None = None,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantiles in long format: one row per (group, prob)
    with the linearly-interpolated quantile ``value`` (ANSI
    ``percentile_cont`` semantics — matches DuckDB's
    ``quantile_cont``, so results are oracle-checkable bit-for-bit).

    ``approx=True`` switches to ``percentile_approx`` (t-digest-style
    bounded-memory sketch, ``accuracy`` controls the error bound) —
    the 100 TB default, since exact percentiles buffer each group's
    values; the exact path is right for bounded group sizes or when
    the number matters more than the memory. Either way ONE
    aggregation pass computes every requested prob (the multi-prob
    array form), not one pass per prob.
    """
    from pd_utils_spark.utils import to_list

    if not probs or any(not 0.0 <= p <= 1.0 for p in probs):
        raise ValueError(f"probs must be non-empty fractions in [0, 1]: {probs}")
    by = to_list(byvars)
    v = F.col(valuecol).cast("double")
    prob_arr = F.array(*[F.lit(float(p)) for p in probs])
    if approx:
        q = F.percentile_approx(v, [float(p) for p in probs], accuracy)
    else:
        q = F.percentile(v, prob_arr)
    agg = df.groupBy(*by).agg(q.alias("__qs__"))
    return (
        agg.select(*by, F.posexplode("__qs__").alias("__i__", "value"))
        .withColumn("prob", F.element_at(prob_arr, F.col("__i__") + 1))
        .select(*by, "prob", "value")
    )


def token_length_histogram(
    df: DataFrame,
    textcol: str = "text",
    bucket_size: int = 100,
) -> DataFrame:
    """Documents and total tokens per token-count bucket
    (``bucket_lo`` = inclusive lower edge, multiples of
    ``bucket_size``) — the planning input for sequence packing: how
    many sequences of each length class a corpus yields, and where
    the token mass sits."""
    if bucket_size < 1:
        raise ValueError(f"bucket_size must be >= 1: {bucket_size}")
    n = _token_count(F.col(textcol))
    return (
        df.withColumn(
            "bucket_lo",
            (F.floor(n / bucket_size) * bucket_size).cast("bigint"),
        )
        .withColumn("__n__", n)
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n__").alias("n_tokens_total"),
        )
    )


def benford_test(
    df: DataFrame,
    col: str,
) -> DataFrame:
    """First-significant-digit audit against Benford's law — the
    classic fabricated-data / unit-mixup screen for naturally
    spanning-orders-of-magnitude quantities (transaction amounts,
    populations, file sizes). Returns one row per digit 1-9:
    ``n_obs``, observed ``share``, Benford's expected share
    ``log10(1 + 1/d)``, and the chi-square contribution
    ``(obs - exp)^2 / exp`` (sum them for the test statistic; ~15.5
    is the 0.05 critical value at 8 df).

    The first significant digit comes from the decimal string form
    (first ``[1-9]`` match), which is immune to the classic
    ``floor(log10(v))`` pitfall where log10 of an exact power of 10
    lands a hair below an integer. Zero/null values are excluded.
    One scan, one 9-row aggregation — counts are exact.
    """
    d = F.regexp_extract(F.col(col).cast("string"), "[1-9]", 0)
    counts = (
        df.filter(F.col(col).isNotNull() & (F.col(col) != 0))
        .select(d.cast("int").alias("digit"))
        .filter(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    # complete to all 9 digits (a missing digit is the loudest signal)
    spark = df.sparkSession
    digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    total = counts.agg(F.sum("n_obs").alias("__n__"))
    out = (
        digits.join(counts, "digit", "left")
        .na.fill({"n_obs": 0})
        .crossJoin(F.broadcast(total))
    )
    expected = F.log10(1 + 1 / F.col("digit"))
    exp_n = F.col("__n__") * expected
    return out.select(
        "digit",
        "n_obs",
        (F.col("n_obs") / F.col("__n__")).alias("share"),
        expected.alias("benford_share"),
        ((F.col("n_obs") - exp_n) * (F.col("n_obs") - exp_n) / exp_n).alias(
            "chi2_contrib"
        ),
    ).orderBy("digit")


def crosstab_chi2(
    df: DataFrame,
    rowcol: str,
    colcol: str,
) -> DataFrame:
    """Contingency-table independence audit for two categorical
    columns: one output row per observed (row, col) cell with the
    observed count, the independence-expected count ``row_total *
    col_total / N``, and the chi-square contribution
    ``(n - expected)^2 / expected``. Sum the contributions for the
    test statistic (df = (R-1)(C-1)); big contributions localize
    WHICH cells break independence — the drill-down a single p-value
    can't give (label leakage across sources, template/language
    coupling, stratification bugs).

    Null categories participate as their own level (nulls pairing
    non-randomly is exactly the kind of structure this should catch).
    Plan: one (row, col) count aggregation, two tiny marginal
    re-aggregations of it, broadcast back — the input is scanned
    once.
    """
    cells = df.groupBy(rowcol, colcol).agg(F.count(F.lit(1)).alias("n"))
    # null-safe marginal joins: a null category is a real level and
    # must still pick up its marginal (plain equi-joins drop it)
    row_tot = cells.groupBy(rowcol).agg(F.sum("n").alias("__rt__")).withColumnRenamed(
        rowcol, "__rk__"
    )
    col_tot = cells.groupBy(colcol).agg(F.sum("n").alias("__ct__")).withColumnRenamed(
        colcol, "__ck__"
    )
    grand = cells.agg(F.sum("n").alias("__N__"))
    expected = F.col("__rt__") * F.col("__ct__") / F.col("__N__")
    return (
        cells.join(F.broadcast(row_tot), F.col(rowcol).eqNullSafe(F.col("__rk__")))
        .join(F.broadcast(col_tot), F.col(colcol).eqNullSafe(F.col("__ck__")))
        .crossJoin(F.broadcast(grand))
        .select(
            rowcol,
            colcol,
            "n",
            expected.alias("expected"),
            ((F.col("n") - expected) * (F.col("n") - expected) / expected).alias(
                "chi2_contrib"
            ),
        )
    )


def mutual_information(
    df: DataFrame,
    xcol: str,
    ycol: str,
) -> DataFrame:
    """Mutual information between two categorical columns — the
    model-free association strength for feature screening and leakage
    audits (an MI near min(H(X), H(Y)) says one column nearly
    determines the other; chi-square localizes WHERE association
    lives, MI says HOW MUCH in bits-equivalent nats): one row
    ``(n, h_x, h_y, h_xy, mi, nmi)`` with
    ``mi = H(X) + H(Y) - H(X,Y)`` (plug-in estimate, nats) and
    ``nmi = mi / min(h_x, h_y)`` (0..1; null when either marginal
    entropy is 0). Null categories count as real levels (eqNullSafe
    grouping — consistent with ``crosstab_chi2``).

    Scale shape: ONE (x, y) aggregation compresses the data; both
    marginals and all three entropies re-aggregate that O(cells)
    frame — the raw rows shuffle once, everything downstream is
    cell-level arithmetic. Entropies computed as
    ``ln N - sum(c ln c) / N`` so every term is exact-integer input.
    """
    cells = materialize(
        df.groupBy(
            F.col(xcol).alias("__x__"), F.col(ycol).alias("__y__")
        ).agg(F.count(F.lit(1)).alias("__c__"))
    )
    xm = cells.groupBy("__x__").agg(F.sum("__c__").alias("__cx__"))
    ym = cells.groupBy("__y__").agg(F.sum("__c__").alias("__cy__"))

    def _ent(frame: DataFrame, ccol: str) -> DataFrame:
        c = F.col(ccol).cast("double")
        return frame.agg(
            F.sum(ccol).alias("__n__"),
            F.sum(c * F.log(c)).alias("__clc__"),
        ).select(
            "__n__",
            (
                F.log(F.col("__n__").cast("double"))
                - F.col("__clc__") / F.col("__n__")
            ).alias("__h__"),
        )

    hx = _ent(xm, "__cx__").select(F.col("__h__").alias("h_x"))
    hy = _ent(ym, "__cy__").select(F.col("__h__").alias("h_y"))
    hxy = _ent(cells, "__c__").select(
        F.col("__n__").alias("n"), F.col("__h__").alias("h_xy")
    )
    out = (
        hxy.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            "n", "h_x", "h_y", "h_xy",
            (F.col("h_x") + F.col("h_y") - F.col("h_xy")).alias("mi"),
        )
    )
    return out.withColumn(
        "nmi",
        F.when(
            F.least("h_x", "h_y") > 0,
            F.col("mi") / F.least("h_x", "h_y"),
        ),
    )


def weighted_quantiles(
    df: DataFrame,
    valuecol: str,
    weightcol: str,
    probs: Sequence[float] = (0.5,),
    byvars: str | Sequence[str] | None = None,
) -> DataFrame:
    """Exact weighted quantiles per group, long format: one row per
    (group, prob) with the LOWER weighted quantile — the smallest
    value whose cumulative weight reaches ``prob * total_weight``
    (inverse-CDF / type-1; no interpolation, so the result is always
    an observed value and bit-portable across engines). The
    size-weighted summary every mixture pipeline needs: median
    document length weighted by token count, median price weighted by
    quantity, latency percentiles weighted by traffic.

    Rows with null value or null/non-positive weight are dropped.

    Scale shape: weights are first aggregated per DISTINCT value
    (one hash agg — also what makes intra-tie weight order
    irrelevant), then ONE cumulative-sum window ordered by value
    within each group and ONE final min-per-prob aggregate; shuffle
    volume is O(distinct values), every requested prob shares the
    same two passes. The within-group running sum sorts each group on
    one task — group cardinality is distinct VALUES, the compressed
    domain, not rows (the same bound the exact tests in
    ``extensions.stats`` rely on).
    """
    from pd_utils_spark.utils import to_list

    if not probs or any(not 0.0 < p <= 1.0 for p in probs):
        raise ValueError(
            f"probs must be non-empty fractions in (0, 1]: {probs}"
        )
    from pyspark.sql import Window

    by = to_list(byvars) if byvars is not None else []
    v = F.col(valuecol).cast("double")
    w = F.col(weightcol).cast("double")
    cells = (
        df.filter(v.isNotNull() & w.isNotNull() & (w > 0))
        .groupBy(*by, v.alias("__v__"))
        .agg(F.sum(w).alias("__w__"))
    )
    win_cum = (
        Window.partitionBy(*by)
        .orderBy("__v__")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    win_all = Window.partitionBy(*by)
    scored = cells.withColumn(
        "__cw__", F.sum("__w__").over(win_cum)
    ).withColumn("__tw__", F.sum("__w__").over(win_all))
    picks = scored.groupBy(*by).agg(
        *[
            F.min(
                F.when(
                    F.col("__cw__") >= F.lit(float(p)) * F.col("__tw__"),
                    F.col("__v__"),
                )
            ).alias(f"__q{i}__")
            for i, p in enumerate(probs)
        ]
    )
    per_prob = F.array(
        *[
            F.struct(
                F.lit(float(p)).alias("prob"),
                F.col(f"__q{i}__").alias("value"),
            )
            for i, p in enumerate(probs)
        ]
    )
    return picks.select(*by, F.explode(per_prob).alias("__r__")).select(
        *by, "__r__.prob", "__r__.value"
    )


def cramers_v(
    df: DataFrame,
    rowcol: str,
    colcol: str,
) -> DataFrame:
    """Cramér's V association strength between two categoricals: one
    row ``(n, n_rows, n_cols, chi2, v)`` with
    ``V = sqrt(chi2 / (n * (min(R, C) - 1)))`` in [0, 1] — the
    effect-size companion to :func:`crosstab_chi2` (whose statistic
    grows with n even for trivial dependence; V is the comparable-
    across-tables number governance thresholds are written against).
    Null when either column has a single level (V undefined).

    Scale shape: rides crosstab_chi2's single (row, col) cell
    aggregation, then one tiny aggregate over the O(cells) frame.
    crosstab_chi2 emits OBSERVED cells only; a zero cell's chi-square
    contribution is exactly its expected count, and the expected
    counts over ALL cells sum to N — so the unobserved-cell mass is
    recovered in closed form as ``N - sum(observed expected)``, no
    dense grid ever materialized.
    """
    cells = crosstab_chi2(df, rowcol, colcol)
    agg = cells.groupBy().agg(
        F.sum("n").alias("n"),
        F.count_distinct(F.col(rowcol)).alias("n_rows"),
        F.count_distinct(F.col(colcol)).alias("n_cols"),
        (
            F.sum("chi2_contrib")
            + (F.sum("n").cast("double") - F.sum("expected"))
        ).alias("chi2"),
    )
    k = F.least(F.col("n_rows"), F.col("n_cols")).cast("double") - 1.0
    v = F.when(
        k > 0,
        F.sqrt(
            F.col("chi2") / (F.col("n").cast("double") * k)
        ),
    )
    return agg.select("n", "n_rows", "n_cols", "chi2", v.alias("v"))
