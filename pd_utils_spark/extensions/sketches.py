"""Mergeable sketch COLUMNS — distinct-count and frequency state you
can store, roll up, and union incrementally.

``approx.py`` answers one-shot approximate questions
(``approx_count_distinct`` collapses to a number inside a single
query). This module is the INCREMENTAL form the 100 TB pipeline
actually needs: materialize a fixed-size sketch per fine-grained
group (per day, per source, per shard), persist it like any other
column, and answer coarser questions later by UNIONING sketches —
never rescanning the corpus. Backed by Spark-native Apache
DataSketches HLL (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``, Spark >= 3.5) — JVM-side, map-side
combinable, O(2^lgk) bytes per group regardless of row count.

What the incremental pattern can and cannot promise — MEASURED on
orders at sf0.01, because the naive claim is false in this engine:
union(fine sketches) does NOT estimate bit-identically to a sketch
built directly at the coarse grain, and two different fine
batchings of the same data differ too (1286 vs 1292 vs 1302 against
exact 1297 — a direct sketch estimates with the insertion-order HIP
accumulator, a union result with the composite estimator, and the
sparse→dense promotion point depends on the batching). All observed
divergence is well inside the configured RSE (~1.04/sqrt(2^lgk));
at small cardinalities (sparse/coupon mode) every path is EXACT.
So the contract this module states — and ``distinct_rollup_audit``
certifies per group on live data — is the ACCURACY BOUND of both
the incremental path and the full recompute against an exact
distinct count, not bit-identity between them. Persisting sketch
state and unioning increments stays safe because the bound, not the
byte layout, is what downstream consumers size against.

Count-min sketches (``count_min_sketch`` aggregate) follow the same
shape for FREQUENCY state: fixed-size, mergeable by cell-wise
addition, one-sided error (never undercounts; overcounts by at most
``eps * N`` with probability ``confidence``). Spark ships no SQL
function to QUERY a CMS, so probing goes through the JVM sketch
class on the driver (``cms_estimate`` — the sketch is a few KiB; the
DATA never moves)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pd_utils_spark.utils import to_list

__all__ = [
    "hll_sketch_by",
    "hll_rollup",
    "hll_estimate",
    "distinct_rollup",
    "distinct_rollup_audit",
    "cms_sketch",
    "cms_merge",
    "cms_estimate",
    "topk_sketch_by",
    "topk_rollup",
    "topk_estimate",
    "bottomk_sketch_by",
    "bottomk_array",
    "bottomk_rollup",
    "kmv_estimate",
    "kmv_pair_ops",
    "sample_sketch_by",
    "weighted_sample_sketch_by",
    "quantile_estimate",
    "quantile_rollup",
]


def hll_sketch_by(
    df: DataFrame,
    byvars: str | Sequence[str],
    col: str,
    lgk: int = 12,
    out: str | None = None,
) -> DataFrame:
    """One HLL sketch per group over ``col``: ``byvars +
    [out or f"{col}_hll"]`` with a BINARY sketch column of at most
    ~2^lgk bytes. ``lgk`` trades size for error (relative standard
    error ~= 1.04 / sqrt(2^lgk); lgk=12 ~= 1.6%). Map-side partials
    merge, so shuffle volume is O(groups x sketch), independent of
    row count — this is the frame to PERSIST for incremental
    pipelines. Nulls in ``col`` are ignored (not a distinct value)."""
    byvars_l = to_list(byvars)
    name = out or f"{col}_hll"
    return df.groupBy(*byvars_l).agg(
        F.hll_sketch_agg(col, F.lit(lgk)).alias(name)
    )


def hll_rollup(
    sketches: DataFrame,
    byvars: str | Sequence[str],
    sketch_col: str,
    out: str | None = None,
) -> DataFrame:
    """Union fine-grained sketches up to coarser keys — the
    incremental rollup: ``byvars + [out or sketch_col]``. Unioning is
    register-wise max, commutative and associative, so any grouping
    of the same inputs (per-day then per-month, or straight to
    per-month) yields the IDENTICAL sketch state. Pass ``byvars=[]``
    for a grand-total sketch."""
    byvars_l = to_list(byvars)
    name = out or sketch_col
    agg = F.hll_union_agg(sketch_col, F.lit(True)).alias(name)
    if byvars_l:
        return sketches.groupBy(*byvars_l).agg(agg)
    return sketches.agg(agg)


def hll_estimate(df: DataFrame, sketch_cols: str | Sequence[str]) -> DataFrame:
    """Replace each binary sketch column with its BIGINT cardinality
    estimate (``<col>_estimate``). Estimation is a pure map — run it
    on the tiny rolled-up frame, not the corpus."""
    out = df
    for c in to_list(sketch_cols):
        out = out.withColumn(
            f"{c}_estimate", F.hll_sketch_estimate(c).cast("bigint")
        ).drop(c)
    return out


def distinct_rollup(
    df: DataFrame,
    fine: str | Sequence[str],
    coarse: str | Sequence[str],
    col: str,
    lgk: int = 12,
) -> DataFrame:
    """Convenience composition: sketch per ``fine`` group, union up to
    ``coarse``, estimate — ``coarse + [f"{col}_hll_estimate"]``. The
    fine sketch frame is the reusable artifact; materialize it once
    and every coarser rollup is a cheap union over sketches."""
    sk = hll_sketch_by(df, fine, col, lgk=lgk)
    up = hll_rollup(sk, coarse, f"{col}_hll")
    return hll_estimate(up, f"{col}_hll")


def distinct_rollup_audit(
    df: DataFrame,
    fine: str | Sequence[str],
    coarse: str | Sequence[str],
    col: str,
    lgk: int = 12,
    rel_tol: float = 0.05,
) -> DataFrame:
    """Certify the accuracy contract the incremental pattern rests
    on, per ``coarse`` group, against an EXACT distinct count:

    - ``rollup_within_tol``: the INCREMENTAL path (union of fine
      sketches) lands within ``rel_tol`` of exact.
    - ``direct_within_tol``: the FULL-RECOMPUTE path (one sketch at
      coarse grain) lands within ``rel_tol`` of exact.

    Bit-identity between the two paths is deliberately NOT asserted —
    it does not hold in this engine (HIP vs composite estimator,
    batching-dependent sparse→dense promotion; divergence measured
    under 1.3% at lgk=12, see module docstring). The bound is the
    contract. Returns ``coarse + [exact_distinct, rollup_within_tol,
    direct_within_tol]``. The exact count is one extra shuffle — this
    is the audit you run on a sample, not the production path."""
    fine_l, coarse_l = to_list(fine), to_list(coarse)
    skcol = f"{col}_hll"
    rolled = hll_estimate(
        hll_rollup(hll_sketch_by(df, fine_l, col, lgk=lgk), coarse_l, skcol),
        skcol,
    ).withColumnRenamed(f"{skcol}_estimate", "__rolled__")
    direct = hll_estimate(
        hll_sketch_by(df, coarse_l, col, lgk=lgk), skcol
    ).withColumnRenamed(f"{skcol}_estimate", "__direct__")
    exact = df.groupBy(*coarse_l).agg(
        F.count_distinct(F.col(col)).alias("exact_distinct")
    )

    def _ok(c: str):
        return F.abs(F.col(c) - F.col("exact_distinct")) <= F.lit(rel_tol) * F.col(
            "exact_distinct"
        )

    return (
        exact.join(rolled, coarse_l)
        .join(direct, coarse_l)
        .select(
            *coarse_l,
            "exact_distinct",
            _ok("__rolled__").alias("rollup_within_tol"),
            _ok("__direct__").alias("direct_within_tol"),
        )
    )


def topk_sketch_by(
    df: DataFrame,
    byvars: str | Sequence[str],
    col: str,
    max_items: int = 64,
    out: str | None = None,
) -> DataFrame:
    """One DataSketches frequent-items sketch per group over ``col``
    (``approx_top_k_accumulate``, Spark 4.x): the mergeable TOP-K
    state — persist per-day/per-source sketches, union increments,
    ask for heavy hitters later. ``max_items`` bounds both state size
    and accuracy: while a group's DISTINCT count stays <=
    ``max_items`` the tracked counts are EXACT; past it, counts carry
    a bounded overestimate and items below the epsilon*N floor may
    evict (the standard frequent-items guarantee: true heavy hitters
    are never lost)."""
    byvars_l = to_list(byvars)
    name = out or f"{col}_topk"
    agg = F.expr(f"approx_top_k_accumulate({col}, {int(max_items)})").alias(name)
    if byvars_l:
        return df.groupBy(*byvars_l).agg(agg)
    return df.agg(agg)


def topk_rollup(
    sketches: DataFrame,
    byvars: str | Sequence[str],
    sketch_col: str,
    max_items: int = 64,
    out: str | None = None,
) -> DataFrame:
    """Combine fine-grained top-k sketches up to coarser keys
    (``approx_top_k_combine``) — the incremental rollup for frequency
    state, same shape as :func:`hll_rollup`."""
    byvars_l = to_list(byvars)
    name = out or sketch_col
    agg = F.expr(f"approx_top_k_combine({sketch_col}, {int(max_items)})").alias(name)
    if byvars_l:
        return sketches.groupBy(*byvars_l).agg(agg)
    return sketches.agg(agg)


def topk_estimate(
    df: DataFrame, sketch_col: str, k: int, drop_sketch: bool = True
) -> DataFrame:
    """Explode each sketch into its top-``k`` rows: the group columns
    plus ``item`` and ``count``. Ask for ``k`` >= the true distinct
    count to read the sketch in its EXACT regime (no rank-boundary
    tie arbitration — the property the oracle row leans on)."""
    out = df.withColumn(
        "__tk__", F.explode(F.expr(f"approx_top_k_estimate({sketch_col}, {int(k)})"))
    ).select(
        *[c for c in df.columns if c != sketch_col or not drop_sketch],
        F.col("__tk__.item").alias("item"),
        F.col("__tk__.count").alias("count"),
    )
    return out


def cms_sketch(
    df: DataFrame,
    col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
    out: str | None = None,
) -> DataFrame:
    """One-row frame holding a count-min frequency sketch of ``col``
    (BINARY, ~``e/eps * ln(1/(1-confidence))`` counters). Same seed +
    same inputs => identical sketch bytes on any partitioning (merge
    is cell-wise addition). Overcounts only: estimate >= true count
    always; <= true + eps*N with probability ``confidence``."""
    name = out or f"{col}_cms"
    return df.agg(
        F.count_min_sketch(
            col, F.lit(float(eps)), F.lit(float(confidence)), F.lit(seed)
        ).alias(name)
    )


def cms_merge(sketches: DataFrame, sketch_col: str) -> bytes:
    """Merge every sketch in ``sketch_col`` into one (driver-side —
    sketches are KiB-sized; built for unioning a handful of
    per-batch/per-day sketches). Returns the merged sketch bytes."""
    rows = sketches.select(sketch_col).collect()
    if not rows:
        raise ValueError("no sketches to merge")
    spark = sketches.sparkSession
    jcls = spark._jvm.org.apache.spark.util.sketch.CountMinSketch
    merged = jcls.readFrom(bytes(rows[0][0]))
    for r in rows[1:]:
        merged.mergeInPlace(jcls.readFrom(bytes(r[0])))
    out = spark._jvm.java.io.ByteArrayOutputStream()
    merged.writeTo(out)
    return bytes(out.toByteArray())


def cms_estimate(
    df_or_bytes: DataFrame | bytes, items: Sequence, sketch_col: str | None = None
) -> dict:
    """Probe a count-min sketch for ``items`` -> {item: estimate}.
    Accepts the one-row frame from ``cms_sketch`` (pass
    ``sketch_col``) or raw sketch bytes from ``cms_merge``. Driver
    JVM round-trip on a KiB-sized object — the corpus never moves.
    Longs must be probed as ints and strings as strings (the sketch
    hashes the JVM type that was aggregated)."""
    if isinstance(df_or_bytes, DataFrame):
        col = sketch_col or next(
            c for c, t in df_or_bytes.dtypes if t == "binary"
        )
        row = df_or_bytes.select(col).first()
        data = bytes(row[0])
        spark = df_or_bytes.sparkSession
    else:
        data = df_or_bytes
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError("no active SparkSession to reach the JVM sketch class")
    sk = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(data)
    return {it: int(sk.estimateCount(it)) for it in items}


# --------------------------------------------------------------------------
# Bottom-k (KMV) sketches: the DETERMINISTIC mergeable family.
#
# A bottom-k sketch is the k smallest xxhash64 values of a column's
# distinct values (sorted ascending). Unlike HLL it is a pure function
# of the value SET — any partitioning, any grouping of increments, and
# the rollup-vs-direct paths all produce BIT-IDENTICAL state — and it
# supports SET OPERATIONS: the combined bottom-k of two sketches is a
# uniform sample of the union, so intersection/Jaccard estimates fall
# out of array_intersect (HLL cannot intersect). Estimator: with the
# k-th smallest normalized hash u_k, distinct ~= (k-1)/u_k (RSE
# ~1/sqrt(k-2)); below k distinct the sketch IS the value set (exact).
#
# Scale posture: the naive build collects every distinct hash per
# group before truncating — O(distinct) state. `prefilter=True` (the
# default) bounds it: pass 1 estimates each group's cardinality
# (approx_count_distinct, tiny state), pass 2 keeps only hashes below
# margin*k/est of the hash space before collecting, so expected
# collected state is ~margin*k per group regardless of cardinality.
# Hashes are uniform, so the filter never changes the RESULT (the k
# smallest are below any cutoff >= u_k) unless the cutoff undershoots
# — with margin=8 that needs the bottom quantile to be 8x sparser
# than expected (P < e^-k by Chernoff); a guard raises rather than
# returning a silently-wrong sketch. (The guard needs at least one
# surviving hash to anchor a group row; a group losing EVERY hash to
# the cutoff — P < e^-margin*k — would drop from the output instead.
# At the default margin*k >= 1024 both modes are beyond-astronomical;
# degenerate margins near 0 are where the distinction shows.) Cost:
# two corpus passes; `prefilter=False` is one pass, unbounded state.
# --------------------------------------------------------------------------

_HASH_SPAN = 2.0**64


def _u01(h):
    """Signed xxhash64 -> uniform double in [0, 1)."""
    return (h.cast("double") / F.lit(_HASH_SPAN)) + F.lit(0.5)


def _bounded_bottomk(
    df: DataFrame,
    byvars_l: list,
    elem,
    size_agg,
    k: int,
    name: str,
    prefilter: bool,
    margin: float,
):
    """Shared build: bottom-k of `elem` (a hash-leading column) per
    group, with the adaptive hash-threshold prefilter bounding
    collected state to ~margin*k when `prefilter`. `size_agg` is the
    per-group population aggregate the cutoff is sized against
    (approx distinct for value sketches, row count for samples)."""
    base = df.select(*byvars_l, elem.alias("__e__"))
    sketch_agg = F.slice(
        F.array_sort(F.collect_set("__e__")), 1, k
    ).alias(name)
    if not prefilter:
        g = base.groupBy(*byvars_l).agg(sketch_agg)
        return g
    cut = F.least(
        F.lit(1.0), F.lit(float(margin) * k) / F.greatest(F.col("__n__"), F.lit(1))
    ).alias("__cut__")
    if byvars_l:
        sizes = df.groupBy(*byvars_l).agg(size_agg.alias("__n__")).select(
            *byvars_l, cut, "__n__"
        )
        joined = base.join(sizes, byvars_l)
    else:
        sizes = df.agg(size_agg.alias("__n__")).select(cut, "__n__")
        joined = base.crossJoin(F.broadcast(sizes))
    hashcol = F.col("__e__")
    if "struct" in dict(base.dtypes)["__e__"]:
        hashcol = F.col("__e__.h")
    kept = joined.filter(_u01(hashcol) < F.col("__cut__"))
    g = kept.groupBy(*byvars_l).agg(sketch_agg, F.max("__n__").alias("__n__"))
    undershoot = (F.size(F.col(name)) < k) & (F.col("__n__") >= 2 * k)
    guarded = F.when(
        undershoot,
        F.raise_error(
            F.lit(
                f"bottom-k prefilter undershoot: fewer than k={k} hashes "
                f"survived the margin={margin} cutoff in a group whose "
                "population says k exist — rebuild with a larger margin "
                "or prefilter=False"
            )
        ),
    ).otherwise(F.col(name))
    return g.select(*byvars_l, guarded.alias(name))


def bottomk_sketch_by(
    df: DataFrame,
    byvars: str | Sequence[str],
    col: str,
    k: int = 256,
    prefilter: bool = True,
    margin: float = 8.0,
    out: str | None = None,
) -> DataFrame:
    """One bottom-k (KMV) sketch per group over ``col``: ``byvars +
    [out or f"{col}_kmv"]`` with a sorted ``array<bigint>`` of at most
    ``k`` hashes. Deterministic: same value set => identical bytes on
    any partitioning, and :func:`bottomk_rollup` of fine sketches ==
    the direct coarse sketch BIT-FOR-BIT (the property HLL lacks; a
    pytest pins it). RSE of the distinct estimate ~1/sqrt(k-2); below
    ``k`` distinct the sketch is exact. ``prefilter`` (default) adds a
    cardinality pre-pass and keeps per-group collected state at
    ~``margin*k`` hashes regardless of group size — two corpus passes
    instead of one, the trade that holds at 100 TB (see module
    comment). Nulls in ``col`` are ignored."""
    byvars_l = to_list(byvars)
    name = out or f"{col}_kmv"
    nn = df.filter(F.col(col).isNotNull())
    return _bounded_bottomk(
        nn,
        byvars_l,
        F.xxhash64(col),
        F.approx_count_distinct(col),
        int(k),
        name,
        prefilter,
        margin,
    )


def bottomk_rollup(
    sketches: DataFrame,
    byvars: str | Sequence[str],
    sketch_col: str,
    k: int,
    out: str | None = None,
) -> DataFrame:
    """Merge fine-grained bottom-k sketches up to coarser keys:
    distinct-union the arrays, re-sort, keep the k smallest. Works
    for both value sketches (:func:`bottomk_sketch_by`) and sample
    sketches (:func:`sample_sketch_by` — struct elements sort on
    their leading hash field). Commutative, associative, and
    deterministic: any grouping of the same increments yields
    IDENTICAL state. State per group is O(inputs * k) pre-truncation
    within one agg buffer — bounded because both factors are. Pass
    ``byvars=[]`` for a grand-total sketch.

    The distinct-union is sort-then-adjacent-dedup, NOT
    ``array_distinct`` (r11, guide §1.2 "per-task work"):
    ``array_distinct`` over STRUCT elements (the sample sketches)
    falls back to O(n^2) interpreted equality scans — profiled at
    8.5 s for five groups of two 4096-struct sketches inside
    ``streaming_sample_quantiles`` — while equal elements are
    adjacent after ``array_sort``, so one indexed ``filter`` pass
    dedups in O(n). Same element set, same order, bit-identical
    output (null-safe ``<=>`` matches array_distinct's NaN/null
    equality)."""
    byvars_l = to_list(byvars)
    name = out or sketch_col
    agg = F.array_sort(F.flatten(F.collect_list(sketch_col))).alias("__srt__")
    g = (
        sketches.groupBy(*byvars_l).agg(agg) if byvars_l else sketches.agg(agg)
    )
    dedup = F.expr(
        "filter(__srt__, (x, i) -> i = 0 OR NOT (x <=> __srt__[i - 1]))"
    )
    return g.select(*byvars_l, F.slice(dedup, 1, int(k)).alias(name))


def kmv_estimate(
    df: DataFrame, sketch_cols: str | Sequence[str], k: int
) -> DataFrame:
    """Replace each bottom-k sketch column with its BIGINT distinct
    estimate (``<col>_estimate``): exact ``size`` when the sketch
    holds fewer than ``k`` hashes, else ``(k-1)/u_k``. Pure map — run
    on the rolled-up frame, not the corpus."""
    out = df
    for c in to_list(sketch_cols):
        n = F.size(F.col(c))
        u_k = F.greatest(_u01(F.element_at(F.col(c), int(k))), F.lit(1e-18))
        est = F.when(n < int(k), n.cast("double")).otherwise(F.lit(k - 1) / u_k)
        out = out.withColumn(
            f"{c}_estimate", F.round(est).cast("bigint")
        ).drop(c)
    return out


def kmv_pair_ops(
    df: DataFrame,
    sketch_a: str,
    sketch_b: str,
    k: int,
    prefix: str = "",
) -> DataFrame:
    """Set-operation estimates from two bottom-k sketch columns on the
    same row — the query HLL cannot answer. The k smallest of the
    merged arrays is itself the union's bottom-k sketch AND a uniform
    k-sample of the union, so: ``union_est`` = KMV estimate of the
    merged sketch; ``jaccard_est`` = fraction of that sample present
    in BOTH inputs; ``intersect_est`` = round(jaccard * union). All
    three are exact when the true union fits in ``k``. Also emits
    ``containment_est`` = intersection / |A| (the asymmetric overlap
    ``extensions/dedup.py containment_join_prefix`` computes exactly
    — this is its sketch-approximate twin for corpus-scale pair
    screening). Pure map on the sketch frame (rows = group pairs,
    not corpus rows)."""
    L = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col(sketch_a), F.col(sketch_b)))),
        1,
        int(k),
    )
    m = F.size(L)
    u_k = F.greatest(_u01(F.element_at(L, int(k))), F.lit(1e-18))
    union_est = F.when(m < int(k), m.cast("double")).otherwise(F.lit(k - 1) / u_k)
    shared = F.size(
        F.array_intersect(F.array_intersect(L, F.col(sketch_a)), F.col(sketch_b))
    )
    jac = F.when(m > 0, shared.cast("double") / m).otherwise(F.lit(0.0))
    n_a = F.size(F.col(sketch_a))
    u_a = F.greatest(_u01(F.element_at(F.col(sketch_a), int(k))), F.lit(1e-18))
    a_est = F.when(n_a < int(k), n_a.cast("double")).otherwise(
        F.lit(k - 1) / u_a
    )
    cont = F.when(a_est > 0, jac * union_est / a_est).otherwise(F.lit(0.0))
    return (
        df.withColumn(f"{prefix}union_est", F.round(union_est).cast("bigint"))
        .withColumn(f"{prefix}jaccard_est", jac)
        .withColumn(
            f"{prefix}intersect_est",
            F.round(jac * union_est).cast("bigint"),
        )
        .withColumn(f"{prefix}containment_est", F.least(cont, F.lit(1.0)))
    )


def bottomk_array(col, k: int):
    """MAP-ONLY bottom-k sketch of a per-row array column (e.g. one
    document's shingle set): ``slice(array_sort(array_distinct(
    transform(col, xxhash64))), 1, k)``. Bit-identical to running
    :func:`bottomk_sketch_by` over the exploded elements grouped by
    row id (pytest pins it) with ZERO shuffle — when the set already
    lives in one row, per-row sketching is a pure column expression,
    the shape per-document dedup screening wants at 100 TB. Feed the
    results to :func:`kmv_estimate` / :func:`kmv_pair_ops` /
    :func:`bottomk_rollup` exactly like agg-built sketches.

    Null elements are filtered BEFORE hashing: ``xxhash64(NULL)``
    returns the seed (42), a tiny hash that would otherwise inject a
    phantom element likely to survive the bottom-k cut, breaking the
    pinned equivalence with :func:`bottomk_sketch_by` (whose groupBy
    build drops nulls)."""
    base = col if not isinstance(col, str) else F.col(col)
    return F.slice(
        F.array_sort(
            F.array_distinct(
                F.transform(
                    F.filter(base, lambda x: x.isNotNull()),
                    lambda x: F.xxhash64(x),
                )
            )
        ),
        1,
        int(k),
    )


def sample_sketch_by(
    df: DataFrame,
    byvars: str | Sequence[str],
    col: str,
    id_cols: str | Sequence[str],
    k: int = 256,
    prefilter: bool = True,
    margin: float = 8.0,
    out: str | None = None,
) -> DataFrame:
    """Mergeable uniform ROW sample per group: the ``k`` rows whose
    ``xxhash64(col, *id_cols)`` is smallest, stored as a sorted
    ``array<struct<h:bigint, v:double>>`` (``out or f"{col}_sample"``).
    ``id_cols`` must uniquely identify rows so every row gets an
    independent hash — sampling is by row, not by value. Deterministic
    and mergeable exactly like :func:`bottomk_sketch_by` (same
    sort-truncate on the leading hash; merge with
    :func:`bottomk_rollup`), which makes it the mergeable state for
    QUANTILE estimation: a uniform k-sample answers any quantile to
    rank error ~sqrt(q(1-q)/k) (:func:`quantile_estimate`). The
    prefilter bounds collected state against the group ROW count.
    Null ``col`` rows are ignored."""
    byvars_l = to_list(byvars)
    name = out or f"{col}_sample"
    id_l = to_list(id_cols)
    nn = df.filter(F.col(col).isNotNull())
    elem = F.struct(
        F.xxhash64(col, *id_l).alias("h"), F.col(col).cast("double").alias("v")
    )
    return _bounded_bottomk(
        nn, byvars_l, elem, F.count(F.lit(1)), int(k), name, prefilter, margin
    )


def quantile_estimate(
    df: DataFrame,
    sketch_col: str,
    qs: Sequence[float],
    drop_sketch: bool = True,
) -> DataFrame:
    """Read quantile estimates off a sample sketch: for each ``q`` in
    ``qs``, the ceil(q*m)-th smallest sampled VALUE (column
    ``q<percent>``, e.g. ``q50``). Rank error ~sqrt(q(1-q)/k) with
    the sketch's ``k``; exact when the group's rows all fit in the
    sketch. Pure map on the sketch frame."""
    vals = F.array_sort(F.transform(F.col(sketch_col), lambda x: x["v"]))
    m = F.size(vals)
    out = df
    for q in qs:
        idx = F.greatest(F.lit(1), F.ceil(F.lit(float(q)) * m).cast("int"))
        pct = int(round(q * 100))
        out = out.withColumn(f"q{pct}", F.element_at(vals, idx))
    if drop_sketch:
        out = out.drop(sketch_col)
    return out


def quantile_rollup(
    df: DataFrame,
    fine: str | Sequence[str],
    coarse: str | Sequence[str],
    col: str,
    id_cols: str | Sequence[str],
    qs: Sequence[float] = (0.25, 0.5, 0.75),
    k: int = 256,
) -> DataFrame:
    """Convenience composition mirroring :func:`distinct_rollup` for
    QUANTILES: sample-sketch per ``fine`` group, merge up to
    ``coarse`` with the deterministic bottom-k rollup, read the
    requested quantiles — ``coarse + [q<pct>...]``. The fine sample
    frame is the reusable artifact: materialize it once per
    day/source/shard and every coarser quantile question is a cheap
    sketch merge, never a corpus rescan."""
    fine_l, coarse_l = to_list(fine), to_list(coarse)
    name = f"{col}_sample"
    sm = sample_sketch_by(df, fine_l, col, id_cols=id_cols, k=k)
    up = bottomk_rollup(sm, coarse_l, name, k=k)
    return quantile_estimate(up, name, list(qs))


def weighted_sample_sketch_by(
    df: DataFrame,
    byvars: str | Sequence[str],
    col: str,
    weight_col: str,
    id_cols: str | Sequence[str],
    k: int = 256,
    salt: int = 0,
    prefilter: bool = False,
    margin: float = 8.0,
    out: str | None = None,
) -> DataFrame:
    """Mergeable WEIGHTED row sample per group (Efraimidis–Spirakis
    A-ES, exponential-key form): every row draws the key
    ``E = -ln(u)/w`` with ``u`` uniform from
    ``xxhash64(col, *id_cols, salt)`` and ``w`` its weight; the ``k``
    smallest keys are a weight-proportional sample WITHOUT
    replacement, stored sorted as ``array<struct<e:double,
    v:double>>``. Deterministic in (data, salt) and mergeable with
    :func:`bottomk_rollup` exactly like the uniform
    :func:`sample_sketch_by` (same sort-truncate on the leading key)
    — per-shard weighted samples union into the corpus-level weighted
    sample without re-scanning, the importance-weighted subsampling
    state a mixture pipeline persists. The ``k=1`` special case is an
    EXACT softmax draw: P(row i has the min key) = w_i / sum(w) (the
    exponential argmin theorem) — the `weighted_pick_audit` query
    measures this on live data across salts. Rows with null/
    non-positive weight are excluded (A-ES is undefined there), as in
    ``sampling.weighted_sample``.

    ``prefilter`` is OPT-IN here, unlike the uniform sketches, and
    its contract is weaker — stated precisely because the difference
    is load-bearing: keys are EXPONENTIAL (unbounded), so a cutoff at
    ``c = margin*k/W`` (W = group total weight) bounds EXPECTED
    collected state at ``margin*k`` (sum_i P(E_i <= c) <= c*W) but
    has NO distribution-free lower bound on how many keys land below
    it — one row holding most of W shrinks ``c`` until the light rows
    almost never pass, and the guard raises. Use it when weights are
    within a couple orders of magnitude of each other (the common
    per-source mixing-weight case); leave it off (default) for
    skewed weights — the unfiltered build collects O(group rows)
    state, exactly like a groupBy collect_list. Groups whose row
    count fits in ``k`` always bypass the cutoff (the sample must BE
    the group there), and an undershoot raises rather than returning
    a silently short sketch."""
    byvars_l = to_list(byvars)
    id_l = to_list(id_cols)
    name = out or f"{col}_wsample"
    # NB per-row weight is __wrow__, total is __wtot__: Spark resolves
    # names CASE-INSENSITIVELY by default, so __w__/__W__ collide
    w = F.col(weight_col).cast("double")
    nn = df.filter(F.col(col).isNotNull() & w.isNotNull() & (w > 0))
    u = F.greatest(
        _u01(F.xxhash64(col, *id_l, F.lit(int(salt)))), F.lit(1e-18)
    )
    e_key = -F.log(u) / w
    elem = F.struct(e_key.alias("e"), F.col(col).cast("double").alias("v"))
    sketch_agg = F.slice(F.array_sort(F.collect_set("__e__")), 1, int(k)).alias(
        name
    )
    base = nn.select(*byvars_l, elem.alias("__e__"), w.alias("__wrow__"))
    if not prefilter:
        return base.groupBy(*byvars_l).agg(sketch_agg)
    cut = (
        F.lit(float(margin) * k) / F.greatest(F.col("__wtot__"), F.lit(1e-300))
    ).alias("__cut__")
    size_aggs = [
        F.sum(w).alias("__wtot__"),
        F.count(F.lit(1)).alias("__ng__"),
    ]
    if byvars_l:
        sizes = (
            nn.groupBy(*byvars_l)
            .agg(*size_aggs)
            .select(*byvars_l, cut, "__ng__")
        )
        joined = base.join(sizes, byvars_l)
    else:
        sizes = nn.agg(*size_aggs).select(cut, "__ng__")
        joined = base.crossJoin(F.broadcast(sizes))
    # groups that fit in k keep every row: exponential keys are
    # unbounded, so no cutoff is safe there
    kept = joined.filter(
        (F.col("__e__.e") < F.col("__cut__")) | (F.col("__ng__") <= int(k))
    )
    g = kept.groupBy(*byvars_l).agg(
        sketch_agg,
        F.max("__ng__").alias("__ng__"),
        F.count(F.lit(1)).alias("__nk__"),
    )
    undershoot = (F.size(F.col(name)) < k) & (F.col("__nk__") < F.col("__ng__"))
    guarded = F.when(
        undershoot,
        F.raise_error(
            F.lit(
                f"weighted bottom-k prefilter undershoot: fewer than k={k} "
                f"keys survived the margin={margin} cutoff while rows were "
                "dropped — weights are too skewed for the expected-state "
                "cutoff; rebuild with a larger margin or prefilter=False"
            )
        ),
    ).otherwise(F.col(name))
    return g.select(*byvars_l, guarded.alias(name))
