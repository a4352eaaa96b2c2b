"""Accuracy-bound tests for approximate aggregates
(pd_utils_spark/extensions/approx.py) against exact values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pd_utils_spark.extensions.approx import approx_group_stats


@pytest.fixture(scope="module")
def li(spark):
    return spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")


class TestApproxStats:
    def test_distinct_within_rsd(self, li):
        out = approx_group_stats(
            li, "l_returnflag", distinct_cols="l_orderkey", rsd=0.05
        ).collect()
        exact = {
            r.l_returnflag: r.d
            for r in li.groupBy("l_returnflag")
            .agg(F.countDistinct("l_orderkey").alias("d"))
            .collect()
        }
        for r in out:
            rel = abs(r.l_orderkey_approx_distinct - exact[r.l_returnflag]) / exact[
                r.l_returnflag
            ]
            assert rel < 0.15  # 3x the declared rsd as a safe bound

    def test_quantiles_close_to_exact(self, li):
        out = approx_group_stats(
            li, "l_returnflag", quantile_cols="l_extendedprice", quantiles=(0.5,)
        ).collect()
        exact = {
            r.l_returnflag: r.m
            for r in li.groupBy("l_returnflag")
            .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("m"))
            .collect()
        }
        for r in out:
            assert r.l_extendedprice_q50 == pytest.approx(
                exact[r.l_returnflag], rel=0.02
            )

    def test_requires_some_columns(self, li):
        with pytest.raises(ValueError, match="distinct_cols"):
            approx_group_stats(li, "l_returnflag")
