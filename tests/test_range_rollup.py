"""Tests for range_join and time_rollup."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

import pd_utils_spark as pus
from pd_utils_spark import streaming as W


@pytest.fixture()
def ev(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1, 2, 3],
                "ts": pd.to_datetime(
                    ["2024-01-01 10:00:00", "2024-01-03 00:00:00", "2024-01-08 00:00:00"]
                ),
            }
        )
    )


@pytest.fixture()
def intervals(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "name": ["w1", "w2"],
                "start": pd.to_datetime(["2024-01-01", "2024-01-08"]),
                "end": pd.to_datetime(["2024-01-08", "2024-01-15"]),
            }
        )
    )


class TestRangeJoin:
    def test_assignment_end_exclusive(self, ev, intervals):
        out = pus.range_join(
            ev, intervals, left_on="ts", right_start="start", right_end="end",
            broadcast_right=True,
        ).toPandas()
        got = dict(zip(out.event_id, out.name))
        assert got == {1: "w1", 2: "w1", 3: "w2"}  # boundary ts -> next interval

    def test_end_inclusive_doubles_boundary(self, ev, intervals):
        out = pus.range_join(
            ev, intervals, left_on="ts", right_start="start", right_end="end",
            end_exclusive=False, broadcast_right=True,
        )
        # event 3 at exactly w1.end now matches BOTH intervals
        assert out.filter(F.col("event_id") == 3).count() == 2

    def test_left_join_keeps_unmatched(self, spark, intervals):
        orphan = spark.createDataFrame(
            pd.DataFrame({"event_id": [9], "ts": pd.to_datetime(["2030-01-01"])})
        )
        out = pus.range_join(
            orphan, intervals, left_on="ts", right_start="start", right_end="end",
            how="left", broadcast_right=True,
        ).collect()
        assert len(out) == 1 and out[0].name is None

    def test_equi_keys_scope_the_join(self, spark):
        left = spark.createDataFrame(
            pd.DataFrame(
                {"k": ["a", "b"], "ts": pd.to_datetime(["2024-01-02", "2024-01-02"])}
            )
        )
        right = spark.createDataFrame(
            pd.DataFrame(
                {
                    "k": ["a", "b"],
                    "start": pd.to_datetime(["2024-01-01", "2024-06-01"]),
                    "end": pd.to_datetime(["2024-02-01", "2024-07-01"]),
                    "tag": ["in-range-a", "out-of-range-b"],
                }
            )
        )
        out = pus.range_join(
            left, right, left_on="ts", right_start="start", right_end="end", on="k"
        ).collect()
        assert len(out) == 1 and out[0].tag == "in-range-a"


class TestTimeRollup:
    def test_granularity_union(self, ev):
        out = W.time_rollup(
            ev.withColumn("value", F.lit(1.0)), "ts", aggs={"value": "sum"},
            granularities=("day", "week"),
        ).toPandas()
        assert set(out.granularity) == {"day", "week"}
        weekly = out[out.granularity == "week"].set_index("bucket").value_sum
        assert weekly[pd.Timestamp("2024-01-01")] == 2.0
        assert weekly[pd.Timestamp("2024-01-08")] == 1.0
