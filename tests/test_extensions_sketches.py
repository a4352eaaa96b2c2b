from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pd_utils_spark.extensions import sketches as sk


@pytest.fixture(scope="module")
def groups(spark):
    # g in {0,1}, day in {0..3}; value ids overlap across days so the
    # union is genuinely smaller than the sum of the parts
    rows = [(i % 2, (i // 2) % 4, i % 50) for i in range(400)]
    return spark.createDataFrame(rows, ["g", "day", "v"])


def test_hll_exact_on_small_cardinality(spark, groups):
    # sparse-mode HLL is exact at cardinalities far below 2^lgk
    est = sk.distinct_rollup(groups, ["g", "day"], ["g"], "v", lgk=12)
    got = {r["g"]: r["v_hll_estimate"] for r in est.collect()}
    # per g, v covers 25 distinct residues of the 50
    assert got == {0: 25, 1: 25}


def test_audit_both_paths_within_tol(spark, groups):
    audit = sk.distinct_rollup_audit(groups, ["g", "day"], ["g"], "v", lgk=12)
    rows = audit.collect()
    assert len(rows) == 2
    for r in rows:
        assert r["rollup_within_tol"] is True
        assert r["direct_within_tol"] is True
        assert r["exact_distinct"] == 25


def test_rollup_grouping_agreement_at_sparse_cardinality(spark, groups):
    """At coupon-mode cardinalities every path is exact, so rollup ==
    direct here. (At DENSE cardinalities the two paths legitimately
    diverge inside the configured RSE — HIP vs composite estimator,
    batching-dependent promotion; measured on orders at sf0.01 —
    which is why distinct_rollup_audit asserts the accuracy BOUND of
    each path rather than bit-identity between them.)"""
    fine = sk.hll_sketch_by(groups, ["g", "day"], "v")
    via_pairs = sk.hll_estimate(sk.hll_rollup(fine, ["g"], "v_hll"), "v_hll")
    direct = sk.hll_estimate(sk.hll_sketch_by(groups, ["g"], "v"), "v_hll")
    a = {r["g"]: r["v_hll_estimate"] for r in via_pairs.collect()}
    b = {r["g"]: r["v_hll_estimate"] for r in direct.collect()}
    assert a == b == {0: 25, 1: 25}


def test_partitioning_invariance(spark, groups):
    """The estimate is a pure function of the value SET — repartition
    must not change it (union of partials is commutative)."""
    a = sk.distinct_rollup(groups, ["day"], [], "v")
    b = sk.distinct_rollup(groups.repartition(13, "v"), ["day"], [], "v")
    assert a.first()[0] == b.first()[0] == 50


def test_grand_total_rollup(spark, groups):
    fine = sk.hll_sketch_by(groups, ["g", "day"], "v")
    total = sk.hll_estimate(sk.hll_rollup(fine, [], "v_hll"), "v_hll")
    assert total.first()["v_hll_estimate"] == 50


def test_hll_ignores_nulls(spark):
    df = spark.createDataFrame([(1, None), (1, "a"), (1, "a"), (1, "b")], ["g", "v"])
    est = sk.distinct_rollup(df, ["g"], ["g"], "v")
    assert est.first()["v_hll_estimate"] == 2


def test_cms_overcounts_only_and_within_bound(spark):
    n = 1000
    df = spark.range(n).select((F.col("id") % 10).cast("string").alias("v"))
    cms = sk.cms_sketch(df, "v", eps=0.01, confidence=0.99, seed=7)
    est = sk.cms_estimate(cms, [str(i) for i in range(10)])
    for i in range(10):
        assert est[str(i)] >= 100
        assert est[str(i)] <= 100 + 0.01 * n


def test_cms_merge_equals_whole(spark):
    df = spark.range(1000).select((F.col("id") % 7).cast("string").alias("v"))
    whole = sk.cms_sketch(df, "v", seed=11)
    parts = [
        sk.cms_sketch(df.filter(F.col("id") % 2 == k), "v", seed=11)
        for k in (0, 1)
    ]
    merged = sk.cms_merge(parts[0].unionAll(parts[1]), "v_cms")
    probe = [str(i) for i in range(7)]
    assert sk.cms_estimate(merged, probe) == sk.cms_estimate(whole, probe, "v_cms")


def test_cms_deterministic_across_partitioning(spark):
    df = spark.range(500).select((F.col("id") % 5).cast("string").alias("v"))
    a = sk.cms_sketch(df, "v", seed=3).first()[0]
    b = sk.cms_sketch(df.repartition(9), "v", seed=3).first()[0]
    assert bytes(a) == bytes(b)


def test_sketch_shuffle_is_group_sized(spark, groups):
    """Plan shape: the sketch agg must show a partial aggregation
    before the exchange (map-side combine) — shuffle carries sketches,
    not rows."""
    plan = (
        sk.hll_sketch_by(groups, ["g"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_hll_sketch_agg" in plan


def test_cms_range_column_long_probe(spark):
    # longs are hashed as JVM longs: probe with python ints
    df = spark.range(300).select((F.col("id") % 3).alias("v"))
    cms = sk.cms_sketch(df, "v", seed=5)
    est = sk.cms_estimate(cms, [0, 1, 2])
    assert all(est[i] >= 100 for i in range(3))


def test_topk_exact_regime_equals_groupby(spark, groups):
    # 50 distinct values, max_items 64 -> counts are exact
    sketch = sk.topk_sketch_by(groups, ["g"], "v", max_items=64)
    est = sk.topk_estimate(sketch, "v_topk", k=64)
    # items keep their original type (long here)
    got = {(r["g"], r["item"]): r["count"] for r in est.collect()}
    want = {
        (r["g"], r["v"]): r["c"]
        for r in groups.groupBy("g", "v").agg(F.count("*").alias("c")).collect()
    }
    assert got == want and len(got) == 50


def test_topk_rollup_matches_direct_in_exact_regime(spark, groups):
    fine = sk.topk_sketch_by(groups, ["g", "day"], "v", max_items=64)
    rolled = sk.topk_rollup(fine, ["g"], "v_topk", max_items=64)
    direct = sk.topk_sketch_by(groups, ["g"], "v", max_items=64)
    a = {
        (r["g"], r["item"]): r["count"]
        for r in sk.topk_estimate(rolled, "v_topk", 64).collect()
    }
    b = {
        (r["g"], r["item"]): r["count"]
        for r in sk.topk_estimate(direct, "v_topk", 64).collect()
    }
    assert a == b and len(a) == 50  # 25 residues per g


def test_topk_heavy_hitter_survives_stress(spark):
    # 200 distinct values in a max_items=8 sketch: counts go
    # approximate, but the one true heavy hitter must never be lost
    rows = [(i % 200,) for i in range(400)] + [(999,)] * 300
    df = spark.createDataFrame(rows, ["v"])
    sketch = sk.topk_sketch_by(df, [], "v", max_items=8)
    est = sk.topk_estimate(sketch, "v_topk", k=1)
    top = est.first()
    assert top["item"] == 999
    assert top["count"] >= 300  # frequent-items never undercounts


# ---------------------------------------------------------------- bottom-k


@pytest.fixture(scope="module")
def kmv_groups(spark):
    # g in {0,1}; per g, v covers 400 distinct values with a 200-value
    # overlap between the two groups (ids 200..399 are shared)
    rows = [(0, i) for i in range(400)] + [(1, i + 200) for i in range(400)]
    return spark.createDataFrame(rows * 2, ["g", "v"])  # dup rows too


def test_bottomk_exact_below_k(spark, kmv_groups):
    sk_df = sk.bottomk_sketch_by(kmv_groups, ["g"], "v", k=512)
    est = sk.kmv_estimate(sk_df, "v_kmv", k=512)
    got = {r["g"]: r["v_kmv_estimate"] for r in est.collect()}
    assert got == {0: 400, 1: 400}


def test_bottomk_deterministic_and_rollup_bit_identical(spark, kmv_groups):
    """The property HLL lacks: repartitioned build, prefiltered build,
    and rollup-of-fine all produce IDENTICAL sketch arrays."""
    day = (F.col("v") % 3).alias("day")
    with_day = kmv_groups.select("g", "v", day)
    direct = sk.bottomk_sketch_by(kmv_groups, ["g"], "v", k=64)
    repart = sk.bottomk_sketch_by(
        kmv_groups.repartition(13, "v"), ["g"], "v", k=64
    )
    nofilter = sk.bottomk_sketch_by(
        kmv_groups, ["g"], "v", k=64, prefilter=False
    )
    fine = sk.bottomk_sketch_by(with_day, ["g", "day"], "v", k=64)
    rolled = sk.bottomk_rollup(fine, ["g"], "v_kmv", k=64)
    a = {r["g"]: r["v_kmv"] for r in direct.collect()}
    for other in (repart, nofilter, rolled):
        b = {r["g"]: r["v_kmv"] for r in other.collect()}
        assert a == b
    assert all(len(v) == 64 for v in a.values())


def test_bottomk_estimate_within_rse_above_k(spark):
    # 5000 distinct values, k=256 -> RSE ~ 1/sqrt(254) ~ 6.3%; this
    # fixed seedless dataset is deterministic, so 4*RSE is a stable gate
    df = spark.range(5000).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    est = sk.kmv_estimate(
        sk.bottomk_sketch_by(df, ["g"], "v", k=256), "v_kmv", k=256
    )
    got = est.first()["v_kmv_estimate"]
    assert abs(got - 5000) <= 4 * 5000 / (254**0.5)


def test_bottomk_grand_total_and_nulls(spark):
    df = spark.createDataFrame(
        [(None,), ("a",), ("a",), ("b",)], ["v"]
    )
    sk_df = sk.bottomk_sketch_by(df, [], "v", k=16)
    est = sk.kmv_estimate(sk_df, "v_kmv", k=16)
    assert est.first()["v_kmv_estimate"] == 2


def test_bottomk_prefilter_guard_raises_on_undershoot(spark):
    # margin sized so the cutoff keeps ~50 of 5000 hashes — some
    # survive (the group still exists) but fewer than k: the guard
    # must refuse to return the silently-short sketch
    df = spark.range(5000).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    bad = sk.bottomk_sketch_by(df, ["g"], "v", k=256, margin=0.2)
    with pytest.raises(Exception, match="undershoot"):
        bad.collect()


def test_kmv_pair_ops_exact_when_union_fits(spark, kmv_groups):
    sks = sk.bottomk_sketch_by(kmv_groups, ["g"], "v", k=1024)
    a = sks.filter(F.col("g") == 0).select(F.col("v_kmv").alias("ska"))
    b = sks.filter(F.col("g") == 1).select(F.col("v_kmv").alias("skb"))
    out = sk.kmv_pair_ops(a.crossJoin(b), "ska", "skb", k=1024).first()
    # union 600, intersection 200, jaccard 1/3 — exact in this regime;
    # containment = |A∩B|/|A| = 200/400
    assert out["union_est"] == 600
    assert out["intersect_est"] == 200
    assert abs(out["jaccard_est"] - 200 / 600) < 1e-12
    assert abs(out["containment_est"] - 0.5) < 1e-9


def test_kmv_pair_ops_estimates_above_k(spark):
    # two 4000-value sets sharing 2000; k=512 -> union/intersect carry
    # sampling error; deterministic dataset, generous 5-sigma gates
    rows = [(0, i) for i in range(4000)] + [(1, i + 2000) for i in range(4000)]
    df = spark.createDataFrame(rows, ["g", "v"])
    sks = sk.bottomk_sketch_by(df, ["g"], "v", k=512)
    a = sks.filter(F.col("g") == 0).select(F.col("v_kmv").alias("ska"))
    b = sks.filter(F.col("g") == 1).select(F.col("v_kmv").alias("skb"))
    out = sk.kmv_pair_ops(a.crossJoin(b), "ska", "skb", k=512).first()
    assert abs(out["union_est"] - 6000) <= 5 * 6000 / (510**0.5)
    assert abs(out["jaccard_est"] - 2000 / 6000) <= 5 * ((1 / 3) / 512) ** 0.5 * 3
    assert abs(out["intersect_est"] - 2000) <= 0.25 * 2000


def test_sample_sketch_quantiles_rank_error(spark):
    # uniform 0..9999 per group; k=512 -> rank err ~ sqrt(.25/512) ~ 2.2%
    df = spark.range(10000).select(
        (F.col("id") % 2).alias("g"),
        F.col("id").alias("rid"),
        (F.col("id") / 1.0).alias("x"),
    )
    sm = sk.sample_sketch_by(df, ["g"], "x", id_cols=["rid"], k=512)
    qs = sk.quantile_estimate(sm, "x_sample", [0.25, 0.5, 0.75])
    for r in qs.collect():
        for q, col in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75")):
            # value space == rank space here (uniform grid over ids)
            assert abs(r[col] / 10000 - q) < 0.08


def test_sample_sketch_exact_when_group_fits(spark):
    df = spark.createDataFrame(
        [(0, i, float(v)) for i, v in enumerate([5, 1, 9, 3, 7])],
        ["g", "rid", "x"],
    )
    sm = sk.sample_sketch_by(df, ["g"], "x", id_cols=["rid"], k=16)
    out = sk.quantile_estimate(sm, "x_sample", [0.5]).first()
    assert out["q50"] == 5.0  # exact median of {1,3,5,7,9}


def test_sample_sketch_rollup_bit_identical(spark):
    df = spark.range(3000).select(
        (F.col("id") % 4).alias("day"),
        F.col("id").alias("rid"),
        (F.col("id") * 1.5).alias("x"),
    )
    fine = sk.sample_sketch_by(df, ["day"], "x", id_cols=["rid"], k=128)
    rolled = sk.bottomk_rollup(fine, [], "x_sample", k=128).first()["x_sample"]
    direct = sk.sample_sketch_by(df, [], "x", id_cols=["rid"], k=128).first()[
        "x_sample"
    ]
    assert [tuple(e) for e in rolled] == [tuple(e) for e in direct]


def test_bottomk_prefilter_plan_has_partial_agg(spark, kmv_groups):
    """Shuffle discipline: the collect_set runs with a map-side
    partial (ObjectHashAggregate partial_collect_set) and the cutoff
    pre-pass aggregates with partial approx_count_distinct — both
    shuffles carry group-sized state, never raw rows."""
    plan = (
        sk.bottomk_sketch_by(kmv_groups, ["g"], "v", k=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_collect_set" in plan
    assert "partial_approx_count_distinct" in plan


def test_bottomk_array_bit_identical_to_agg_build(spark):
    """The map-only per-row sketch (bottomk_array) equals the
    exploded groupBy build (bottomk_sketch_by) bit-for-bit."""
    df = spark.createDataFrame(
        [
            (1, ["a", "b", "c", "d", "e", "f"]),
            (2, ["b", "c", "x"]),
            (3, ["z"]),
        ],
        ["doc_id", "t"],
    )
    m1 = {
        r["doc_id"]: r["sk"]
        for r in df.select(
            "doc_id", sk.bottomk_array("t", 4).alias("sk")
        ).collect()
    }
    ex = df.select("doc_id", F.explode("t").alias("s"))
    m2 = {
        r["doc_id"]: r["s_kmv"]
        for r in sk.bottomk_sketch_by(ex, ["doc_id"], "s", k=4).collect()
    }
    assert m1 == m2
    plan = (
        df.select(sk.bottomk_array("t", 4))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # map-only


def test_bottomk_array_skips_null_elements(spark):
    """xxhash64(NULL) returns the seed (42) — a tiny hash that would
    survive the bottom-k cut as a phantom element. bottomk_array must
    filter nulls before hashing so arrays-with-nulls stay bit-identical
    to the agg build (whose explode+groupBy path drops nulls)."""
    df = spark.createDataFrame(
        [(1, ["a", None, "b", None, "c"]), (2, [None, "x"])],
        "doc_id int, t array<string>",
    )
    m1 = {
        r["doc_id"]: r["sk"]
        for r in df.select(
            "doc_id", sk.bottomk_array("t", 4).alias("sk")
        ).collect()
    }
    ex = df.select("doc_id", F.explode("t").alias("s")).where(
        F.col("s").isNotNull()
    )
    m2 = {
        r["doc_id"]: r["s_kmv"]
        for r in sk.bottomk_sketch_by(ex, ["doc_id"], "s", k=4).collect()
    }
    assert m1 == m2
    assert all(42 not in v for v in m1.values())


# ------------------------------------------------------- weighted sampling


def test_weighted_sketch_exact_regime_and_rollup_identical(spark):
    df = spark.range(300).select(
        (F.col("id") % 3).alias("day"),
        F.col("id").alias("rid"),
        (F.col("id") * 1.0).alias("x"),
        (F.col("id") % 5 + 1.0).alias("w"),
    )
    direct = sk.weighted_sample_sketch_by(
        df, [], "x", "w", id_cols=["rid"], k=512
    ).first()["x_wsample"]
    assert len(direct) == 300  # k >= rows: the sample IS the group
    fine = sk.weighted_sample_sketch_by(
        df, ["day"], "x", "w", id_cols=["rid"], k=512
    )
    rolled = sk.bottomk_rollup(fine, [], "x_wsample", k=512).first()["x_wsample"]
    assert [tuple(e) for e in rolled] == [tuple(e) for e in direct]
    nofilter = sk.weighted_sample_sketch_by(
        df, [], "x", "w", id_cols=["rid"], k=512, prefilter=False
    ).first()["x_wsample"]
    assert [tuple(e) for e in nofilter] == [tuple(e) for e in direct]


def test_weighted_pick_probability_tracks_weights(spark):
    """k=1 is an exact softmax draw: P(min key in class B) =
    W_B / W_total (exponential argmin theorem). 24 deterministic
    salts, 20 rows of weight 1 vs 10 rows of weight 9 ->
    P(B) = 90/110; expect >= 13 of 24 picks in B (>3.5 sigma slack,
    deterministic once written)."""
    rows = [(i, 0, 1.0) for i in range(20)] + [
        (100 + i, 1, 9.0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["rid", "cls", "w"])
    picks = []
    for salt in range(24):
        s = sk.weighted_sample_sketch_by(
            df, [], "cls", "w", id_cols=["rid"], k=1, salt=salt,
            prefilter=False,
        ).first()["cls_wsample"]
        picks.append(int(s[0]["v"]))
    assert sum(picks) >= 13


def test_weighted_nonpositive_and_null_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 2.0, 0.0), (3, 3.0, -4.0), (4, 4.0, None)],
        ["rid", "x", "w"],
    )
    s = sk.weighted_sample_sketch_by(
        df, [], "x", "w", id_cols=["rid"], k=8
    ).first()["x_wsample"]
    assert [e["v"] for e in s] == [1.0]


def test_weighted_prefilter_guard_raises_on_undershoot(spark):
    df = spark.range(5000).select(
        F.col("id").alias("rid"), (F.col("id") * 1.0).alias("x"),
        F.lit(1.0).alias("w"),
    )
    bad = sk.weighted_sample_sketch_by(
        df, [], "x", "w", id_cols=["rid"], k=256, prefilter=True,
        margin=0.2,
    )
    with pytest.raises(Exception, match="undershoot"):
        bad.collect()


def test_weighted_prefilter_happy_path_bit_identical(spark):
    """With near-uniform weights (the documented prefilter use case)
    the cutoff keeps the true bottom-k: prefilter on == off."""
    df = spark.range(3000).select(
        F.col("id").alias("rid"),
        (F.col("id") * 1.0).alias("x"),
        (F.col("id") % 3 + 1.0).alias("w"),
    )
    a = sk.weighted_sample_sketch_by(
        df, [], "x", "w", id_cols=["rid"], k=64, prefilter=True
    ).first()["x_wsample"]
    b = sk.weighted_sample_sketch_by(
        df, [], "x", "w", id_cols=["rid"], k=64, prefilter=False
    ).first()["x_wsample"]
    assert [tuple(e) for e in a] == [tuple(e) for e in b]
    assert len(a) == 64

def test_quantile_rollup_composition(spark):
    # fine = per day, coarse = grand total; groups fit in k -> exact
    df = spark.range(1000).select(
        (F.col("id") % 4).alias("day"),
        F.col("id").alias("rid"),
        (F.col("id") * 1.0).alias("x"),
    )
    out = sk.quantile_rollup(
        df, ["day"], [], "x", id_cols=["rid"], qs=(0.5,), k=2048
    ).first()
    # exact median of 0..999 under the ceil(q*m) rule: element 500
    assert out["q50"] == 499.0


def test_rollup_dedups_identical_elements_across_sketches(spark):
    # The r11 sort+adjacent-dedup union must keep array_distinct's
    # semantics: merging a sketch frame with an exact copy of itself
    # is a no-op (same elements, same order, same truncation), and
    # NaN values / null struct fields count as equal to themselves
    # (Spark's array_distinct NaN/null equality, matched via <=>).
    df = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, float("nan")), (0, 3, None), (1, 4, 2.5)],
        ["day", "rid", "x"],
    )
    fine = sk.sample_sketch_by(df, ["day"], "x", id_cols=["rid"], k=16)
    once = sk.bottomk_rollup(fine, [], "x_sample", k=16).first()["x_sample"]
    twice = sk.bottomk_rollup(
        fine.unionByName(fine), [], "x_sample", k=16
    ).first()["x_sample"]
    # repr-compare: tuple equality would fail on nan != nan, but the
    # claim here is bit-identity, which repr captures
    assert [repr(tuple(e)) for e in twice] == [repr(tuple(e)) for e in once]
    # the doubled input must NOT double the sample (dedup is real)
    assert len(twice) == len(once)
