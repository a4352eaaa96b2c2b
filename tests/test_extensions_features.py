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
