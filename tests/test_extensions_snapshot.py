"""Tests for dataset versioning (extensions/snapshot.py): snapshot
diff statuses/changed-column detection and SCD2 merge semantics."""

from __future__ import annotations

from datetime import date

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pd_utils_spark.extensions import dataset_diff, diff_summary, scd2_merge


class TestDatasetDiff:
    def _snaps(self, spark):
        old = spark.createDataFrame(
            pd.DataFrame(
                {"k": [1, 2, 3, 4], "a": [10, 20, 30, 40], "b": ["x", "y", "z", "w"]}
            )
        )
        new = spark.createDataFrame(
            pd.DataFrame(
                {"k": [2, 3, 4, 5], "a": [20, 31, 40, 50], "b": ["y", "z", "q", "v"]}
            )
        )
        return old, new

    def test_statuses_and_changed_cols(self, spark):
        old, new = self._snaps(spark)
        out = {r.k: r for r in dataset_diff(old, new, "k").collect()}
        assert out[1].diff_status == "removed"
        assert out[2].diff_status == "unchanged" and out[2].changed_cols == []
        assert out[3].diff_status == "changed" and out[3].changed_cols == ["a"]
        assert out[4].diff_status == "changed" and out[4].changed_cols == ["b"]
        assert out[5].diff_status == "added"
        assert out[3].a_old == 30 and out[3].a_new == 31
        assert out[1].a_new is None and out[5].a_old is None

    def test_null_safe_comparison(self, spark):
        old = spark.createDataFrame(
            pd.DataFrame({"k": [1, 2], "a": [None, None], "b": [1.0, 1.0]})
        )
        new = spark.createDataFrame(
            pd.DataFrame({"k": [1, 2], "a": [None, 5.0], "b": [1.0, 1.0]})
        )
        out = {r.k: r.diff_status for r in dataset_diff(old, new, "k").collect()}
        assert out == {1: "unchanged", 2: "changed"}

    def test_summary(self, spark):
        old, new = self._snaps(spark)
        got = {r.diff_status: r.n_keys for r in diff_summary(old, new, "k").collect()}
        assert got == {"removed": 1, "unchanged": 1, "changed": 2, "added": 1}

    def test_duplicate_keys_raise(self, spark):
        old, new = self._snaps(spark)
        dup = old.unionByName(old.limit(1))
        with pytest.raises(ValueError, match="duplicate keys"):
            dataset_diff(dup, new, "k").collect()
        # and the guard can be bypassed when the writer guarantees keys
        dataset_diff(old, new, "k", check_unique=False).collect()


class TestScd2Merge:
    def _dim(self, spark):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "k": [1, 1, 2, 3],
                    "v": [100, 110, 200, 300],
                    "valid_from": [
                        date(2020, 1, 1),
                        date(2022, 1, 1),
                        date(2020, 1, 1),
                        date(2020, 1, 1),
                    ],
                    "valid_to": [date(2022, 1, 1), None, None, None],
                    "is_current": [False, True, True, True],
                }
            )
        )

    def test_merge_semantics(self, spark):
        dim = self._dim(spark)
        updates = spark.createDataFrame(
            # k=1 changed, k=2 unchanged, k=9 new; k=3 absent
            pd.DataFrame({"k": [1, 2, 9], "v": [111, 200, 900]})
        )
        out = scd2_merge(dim, updates, "k", ["v"], date(2024, 6, 1))
        rows = sorted(
            (r.k, r.v, r.valid_from, r.valid_to, r.is_current) for r in out.collect()
        )
        assert rows == [
            (1, 100, date(2020, 1, 1), date(2022, 1, 1), False),   # history
            (1, 110, date(2022, 1, 1), date(2024, 6, 1), False),   # closed
            (1, 111, date(2024, 6, 1), None, True),                # opened
            (2, 200, date(2020, 1, 1), None, True),                # no churn
            (3, 300, date(2020, 1, 1), None, True),                # untouched
            (9, 900, date(2024, 6, 1), None, True),                # new key
        ]

    def test_idempotent_on_reapply(self, spark):
        """Re-applying the same update batch must be a no-op: the
        changed rows are now current with equal tracked values."""
        dim = self._dim(spark)
        updates = spark.createDataFrame(pd.DataFrame({"k": [1, 9], "v": [111, 900]}))
        once = scd2_merge(dim, updates, "k", ["v"], date(2024, 6, 1))
        twice = scd2_merge(once, updates, "k", ["v"], date(2024, 7, 1))
        a = sorted(map(tuple, once.collect()))
        b = sorted(map(tuple, twice.collect()))
        assert a == b

    def test_duplicate_update_keys_raise(self, spark):
        dim = self._dim(spark)
        updates = spark.createDataFrame(pd.DataFrame({"k": [1, 1], "v": [5, 6]}))
        with pytest.raises(ValueError, match="duplicate keys"):
            scd2_merge(dim, updates, "k", ["v"], date(2024, 6, 1))


class TestAggState:
    def test_merge_then_finalize_equals_direct(self, spark):
        import numpy as np
        rng = np.random.default_rng(17)
        pdf = pd.DataFrame(
            {
                "k": rng.integers(0, 5, 300),
                "v": rng.normal(10, 3, 300).round(4),
                "u": rng.normal(-2, 1, 300).round(4),
            }
        )
        df = spark.createDataFrame(pdf)
        from pd_utils_spark.extensions import agg_state, finalize_agg_state, merge_agg_states

        # split into three batches, aggregate each alone, merge
        parts = [df.filter(F.col("v") < 8), df.filter((F.col("v") >= 8) & (F.col("v") < 11)), df.filter(F.col("v") >= 11)]
        states = [agg_state(p, "k", ["v", "u"]) for p in parts]
        merged = merge_agg_states(states, "k")
        got = {r.k: r for r in finalize_agg_state(merged, "k").collect()}
        exp = pdf.groupby("k").agg(
            v_n=("v", "count"), v_mean=("v", "mean"), v_std=("v", "std"),
            v_min=("v", "min"), v_max=("v", "max"),
            u_mean=("u", "mean"), u_std=("u", "std"),
        )
        for k, e in exp.iterrows():
            r = got[k]
            assert r.v_n == e.v_n
            assert r.v_mean == pytest.approx(e.v_mean, rel=1e-9)
            assert r.v_std == pytest.approx(e.v_std, rel=1e-6)
            assert (r.v_min, r.v_max) == (pytest.approx(e.v_min), pytest.approx(e.v_max))
            assert r.u_mean == pytest.approx(e.u_mean, rel=1e-9)
            assert r.u_std == pytest.approx(e.u_std, rel=1e-6)

    def test_single_row_group_std_null(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"k": [1], "v": [5.0]}))
        from pd_utils_spark.extensions import agg_state, finalize_agg_state
        r = finalize_agg_state(agg_state(df, "k", "v"), "k").collect()[0]
        assert r.v_std is None and r.v_mean == 5.0 and r.v_n == 1

    def test_bad_state_column_raises(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"k": [1], "bogus": [1.0]}))
        from pd_utils_spark.extensions import merge_agg_states
        with pytest.raises(ValueError, match="agg_state column"):
            merge_agg_states([df], "k")
