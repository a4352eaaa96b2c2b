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
