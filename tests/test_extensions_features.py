"""Tests for the categorical feature encoders
(pd_utils_spark/extensions/features.py) against hand-computed and
pandas references."""

from __future__ import annotations

import pytest

from pd_utils_spark.extensions.features import frequency_encode, target_encode


def test_target_encode_loo_hand_computed(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 6.0), ("b", 4.0), ("c", 10.0)],
        ["cat", "y"],
    )
    got = {
        (r["cat"], r["y"]): r["encoded"]
        for r in target_encode(df, "cat", "y", method="loo").collect()
    }
    assert got[("a", 1.0)] == pytest.approx(4.0)   # (2+6)/2
    assert got[("a", 2.0)] == pytest.approx(3.5)   # (1+6)/2
    assert got[("a", 6.0)] == pytest.approx(1.5)   # (1+2)/2
    assert got[("b", 4.0)] is None                 # singleton
    assert got[("c", 10.0)] is None


def test_target_encode_loo_smoothed_singleton_gets_prior(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0)], ["cat", "y"]
    )
    gm = 3.0
    got = {
        (r["cat"], r["y"]): r["encoded"]
        for r in target_encode(
            df, "cat", "y", method="loo", prior_weight=2.0
        ).collect()
    }
    # (sum - own + w*gm) / (n - 1 + w)
    assert got[("a", 1.0)] == pytest.approx((3.0 + 2 * gm) / 3.0)
    assert got[("b", 5.0)] == pytest.approx(gm)


def test_target_encode_mean_and_null_target(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", 8.0)], ["cat", "y"]
    )
    got = {
        (r["cat"], r["y"]): r["encoded"]
        for r in target_encode(df, "cat", "y", method="mean").collect()
    }
    # null target contributes nothing but keeps its row
    assert got[("a", 1.0)] == pytest.approx(2.0)
    assert got[("a", None)] == pytest.approx(2.0)
    assert got[("b", 8.0)] == pytest.approx(8.0)


def test_target_encode_validation(spark):
    df = spark.createDataFrame([("a", 1.0)], ["cat", "y"])
    with pytest.raises(ValueError, match="method"):
        target_encode(df, "cat", "y", method="woe")
    with pytest.raises(ValueError, match="prior_weight"):
        target_encode(df, "cat", "y", prior_weight=-1)


def test_frequency_encode(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",)], ["cat"]
    )
    rel = {r["cat"]: r["freq"] for r in frequency_encode(df, "cat").collect()}
    assert rel == {"a": pytest.approx(0.75), "b": pytest.approx(0.25)}
    cnt = {
        r["cat"]: r["freq"]
        for r in frequency_encode(df, "cat", relative=False).collect()
    }
    assert cnt == {"a": 3, "b": 1}


# ----------------------------------------------------- quantile_transform

def test_quantile_transform_grouped_matches_pandas(spark):
    import pandas as pd

    from pd_utils_spark.extensions.features import quantile_transform

    pdf = pd.DataFrame(
        {
            "g": ["a"] * 6 + ["b"] * 4,
            "v": [3.0, 1.0, 2.0, 2.0, 5.0, 4.0, 10.0, 10.0, 10.0, 7.0],
        }
    )
    ref = (pdf.groupby("g")["v"].rank(method="average") - 0.5) / pdf.groupby(
        "g"
    )["v"].transform("count")
    df = spark.createDataFrame(pdf)
    got = quantile_transform(df, "v", byvars="g").toPandas()
    got = got.sort_values(["g", "v"]).reset_index(drop=True)
    exp = pdf.assign(q=ref).sort_values(["g", "v"]).reset_index(drop=True)
    for a, b in zip(got["q"], exp["q"]):
        assert a == pytest.approx(b, abs=1e-12)


def test_quantile_transform_global_prefix_path(spark):
    import pandas as pd

    from pd_utils_spark.extensions.features import quantile_transform

    pdf = pd.DataFrame({"v": [5.0, 1.0, 3.0, 3.0, 9.0, None]})
    df = spark.createDataFrame(pdf)
    got = {
        r["v"]: r["q"] for r in quantile_transform(df, "v").collect()
    }
    ref = (pdf["v"].rank(method="average") - 0.5) / pdf["v"].count()
    for v, q in zip(pdf["v"], ref):
        if pd.isna(v):
            assert got[None] is None
        else:
            assert got[v] == pytest.approx(q, abs=1e-12)


# ----------------------------------------------------- linkage_score

def test_linkage_score_fixed_u(spark):
    import math

    from pd_utils_spark.operators.merge import linkage_score

    pairs = spark.createDataFrame(
        [
            ("x", "x", "p", "p"),   # both agree
            ("x", "y", "p", "p"),   # f1 disagrees
            ("x", None, "p", "q"),  # f1 null, f2 disagrees
        ],
        ["f1", "f1_right", "f2", "f2_right"],
    )
    got = [
        r["match_weight"]
        for r in linkage_score(
            pairs, ["f1", "f2"], m=0.9, u=0.1
        ).collect()
    ]
    wa = math.log2(0.9 / 0.1)
    wd = math.log2(0.1 / 0.9)
    assert got[0] == pytest.approx(2 * wa, rel=1e-12)
    assert got[1] == pytest.approx(wd + wa, rel=1e-12)
    # f1 carries no information (null side), f2 disagrees
    assert got[2] == pytest.approx(wd, rel=1e-12)


def test_linkage_score_estimates_u_from_frequencies(spark):
    import math

    from pd_utils_spark.operators.merge import linkage_score

    # field values with known collision probability:
    # 'a' x3, 'b' x1 -> u = (9 + 1) / 16
    base = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",)], ["f1"]
    )
    pairs = spark.createDataFrame(
        [("a", "a"), ("a", "b")], ["f1", "f1_right"]
    )
    got = [
        r["match_weight"]
        for r in linkage_score(
            pairs, ["f1"], m=0.8, freq_from=base
        ).collect()
    ]
    u = 10.0 / 16.0
    assert got[0] == pytest.approx(math.log2(0.8 / u), rel=1e-12)
    assert got[1] == pytest.approx(math.log2(0.2 / (1 - u)), rel=1e-12)


def test_linkage_score_validation(spark):
    from pd_utils_spark.operators.merge import linkage_score

    pairs = spark.createDataFrame([("a", "a")], ["f1", "f1_right"])
    with pytest.raises(ValueError, match="fields"):
        linkage_score(pairs, [])
    with pytest.raises(ValueError, match="m\\["):
        linkage_score(pairs, ["f1"], m=1.5)
    with pytest.raises(ValueError, match="u"):
        linkage_score(pairs, ["f1"], u=None)


class TestWoeIv:
    def test_hand_computed_with_smoothing(self, spark):
        import math

        from pd_utils_spark.extensions.features import woe_iv

        # category A: 3 pos / 1 neg; B: 1 pos / 3 neg
        rows = [("A", 1)] * 3 + [("A", 0)] + [("B", 1)] + [("B", 0)] * 3
        df = spark.createDataFrame(rows, ["f", "y"])
        got = {r.category: r for r in woe_iv(df, "f", "y").collect()}
        tp, tn = 4 + 0.5 * 2, 4 + 0.5 * 2
        ps_a, ns_a = 3.5 / tp, 1.5 / tn
        ps_b, ns_b = 1.5 / tp, 3.5 / tn
        assert got["A"].pos_share == pytest.approx(ps_a)
        assert got["A"].woe == pytest.approx(math.log(ps_a / ns_a))
        assert got["B"].woe == pytest.approx(math.log(ps_b / ns_b))
        iv = (ps_a - ns_a) * math.log(ps_a / ns_a) + (
            ps_b - ns_b
        ) * math.log(ps_b / ns_b)
        assert got["A"].iv == pytest.approx(iv)
        assert got["B"].iv == pytest.approx(iv)
        # symmetric construction -> antisymmetric woe
        assert got["A"].woe == pytest.approx(-got["B"].woe)

    def test_uninformative_feature_near_zero_iv(self, spark):
        from pd_utils_spark.extensions.features import woe_iv

        rows = [(c, y) for c in ("A", "B") for y in (0, 1) for _ in range(10)]
        df = spark.createDataFrame(rows, ["f", "y"])
        out = woe_iv(df, "f", "y").collect()
        assert all(abs(r.iv) < 1e-12 for r in out)
        assert all(abs(r.woe) < 1e-12 for r in out)

    def test_empty_cell_stays_finite_and_null_category(self, spark):
        from pd_utils_spark.extensions.features import woe_iv

        rows = [("A", 1)] * 5 + [(None, 0)] * 3
        df = spark.createDataFrame(rows, ["f", "y"])
        got = {r.category: r for r in woe_iv(df, "f", "y").collect()}
        # A has zero negatives, null-category has zero positives:
        # smoothing keeps both finite
        import math

        assert math.isfinite(got["A"].woe) and math.isfinite(got[None].woe)
        assert got["A"].woe > 0 > got[None].woe

    def test_validation(self, spark):
        from pd_utils_spark.extensions.features import woe_iv

        df = spark.createDataFrame([("A", 1)], ["f", "y"])
        with pytest.raises(ValueError, match="smoothing"):
            woe_iv(df, "f", "y", smoothing=-1.0)


class TestBestSplit:
    def test_finds_perfect_split_and_midpoint(self, spark):
        from pd_utils_spark.extensions.features import best_split

        # y = 1 exactly when v >= 10: best cut between 9 and 10
        rows = [("g", float(v), 1 if v >= 10 else 0) for v in range(20)]
        df = spark.createDataFrame(rows, ["g", "v", "y"])
        r = best_split(df, "v", "y", "g").collect()[0]
        assert r.threshold == 9.5
        assert r.gini_after == pytest.approx(0.0)
        assert r.gain == pytest.approx(0.5)  # balanced -> before = 0.5
        assert r.n == 20 and r.n_left == 10

    def test_matches_brute_force(self, spark):
        import numpy as np

        from pd_utils_spark.extensions.features import best_split

        rng = np.random.RandomState(6)
        v = rng.randint(0, 15, 120).astype(float)
        y = (rng.rand(120) < (v / 20.0)).astype(int)
        df = spark.createDataFrame(
            [("g", float(a), int(b)) for a, b in zip(v, y)], ["g", "v", "y"]
        )
        r = best_split(df, "v", "y", "g").collect()[0]

        def gini(p):
            return 2 * p * (1 - p)

        vals = np.unique(v)
        best = None
        nt, tp = len(v), y.sum()
        for i in range(len(vals) - 1):
            m = v <= vals[i]
            nl, pl = m.sum(), y[m].sum() / m.sum()
            nr, pr = nt - m.sum(), y[~m].sum() / (nt - m.sum())
            after = nl / nt * gini(pl) + nr / nt * gini(pr)
            gain = gini(tp / nt) - after
            thr = (vals[i] + vals[i + 1]) / 2
            if best is None or gain > best[0] + 1e-12:
                best = (gain, thr)
        assert r.threshold == best[1]
        assert r.gain == pytest.approx(best[0], rel=1e-9)

    def test_constant_feature_no_row(self, spark):
        from pd_utils_spark.extensions.features import best_split

        df = spark.createDataFrame(
            [("g", 1.0, i % 2) for i in range(10)], ["g", "v", "y"]
        )
        assert best_split(df, "v", "y", "g").count() == 0
