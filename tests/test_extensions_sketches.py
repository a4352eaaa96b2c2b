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
