"""Tests for the declarative data-quality suite (extensions/checks.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pd_utils_spark.extensions import assert_checks, run_checks

nan = np.nan


@pytest.fixture(scope="module")
def data(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2, 3, 4, 4],
                "score": [0.5, 1.5, nan, 0.9, 0.1],
                "cat": ["a", "b", "c", "a", "zz"],
                "email": ["x@y.com", "bad", None, "a@b.org", "c@d.io"],
                "fk": [10, 10, 99, None, 20],
            }
        )
    )


@pytest.fixture(scope="module")
def ref(spark):
    return spark.createDataFrame(pd.DataFrame({"rid": [10, 20, 30]}))


class TestRunChecks:
    def test_all_rule_types(self, spark, data, ref):
        res = {
            r["check"]: r
            for r in run_checks(
                data,
                [
                    {"type": "not_null", "column": "score"},
                    {"type": "range", "column": "score", "min": 0.0, "max": 1.0},
                    {"type": "in_set", "column": "cat", "values": ["a", "b", "c"]},
                    {"type": "regex", "column": "email", "pattern": r"^[^@]+@[^@]+\.[^@]+$"},
                    {"type": "custom", "name": "id_positive", "predicate": "id > 0"},
                    {"type": "unique", "columns": ["id"]},
                    {"type": "ref", "column": "fk", "ref": ref, "ref_column": "rid"},
                ],
            ).collect()
        }
        assert res["not_null:score"]["violations"] == 1
        assert res["range:score"]["violations"] == 1  # 1.5; null skipped
        assert res["in_set:cat"]["violations"] == 1  # zz
        assert res["regex:email"]["violations"] == 1  # bad; null skipped
        assert res["id_positive"]["violations"] == 0 and res["id_positive"]["passed"]
        assert res["unique:id"]["violations"] == 2  # both id=4 rows
        assert res["ref:fk"]["violations"] == 1  # 99; null skipped
        assert all(r["total"] == 5 for r in res.values())

    def test_range_one_sided(self, spark, data):
        res = run_checks(data, [{"type": "range", "column": "score", "min": 0.2}]).collect()
        assert res[0]["violations"] == 1  # 0.1

    def test_passing_unique(self, spark, ref):
        res = run_checks(ref, [{"type": "unique", "columns": ["rid"]}]).collect()
        assert res[0]["violations"] == 0 and res[0]["passed"]

    def test_empty_rules(self, spark, data):
        assert run_checks(data, []).count() == 0

    def test_unknown_type_raises(self, spark, data):
        with pytest.raises(ValueError, match="unknown"):
            run_checks(data, [{"type": "bogus", "column": "id"}]).collect()


class TestAssertChecks:
    def test_raises_listing_failures(self, spark, data):
        with pytest.raises(ValueError, match=r"not_null:score \(1 violations\)"):
            assert_checks(
                data,
                [
                    {"type": "not_null", "column": "score"},
                    {"type": "custom", "name": "ok", "predicate": "id > 0"},
                ],
            )

    def test_passes_and_returns_frame(self, spark, data):
        res = assert_checks(data, [{"type": "custom", "name": "ok", "predicate": "id > 0"}])
        assert res.count() == 1


class TestReferentialReport:
    def test_hand_computed(self, spark):
        from pd_utils_spark.extensions.checks import referential_report

        child = spark.createDataFrame(
            [(1,), (1,), (2,), (3,), (None,)], ["fk"]
        )
        parent = spark.createDataFrame(
            [(1,), (2,), (2,), (9,)], ["pk"]
        )
        r = referential_report(child, parent, "fk", "pk").collect()[0]
        assert r.n_child == 5 and r.n_child_null_key == 1
        # key 3 (1 row) has no parent
        assert r.n_orphan_rows == 1 and r.n_orphan_keys == 1
        assert r.orphan_frac == pytest.approx(1 / 4)
        assert r.n_child_keys == 3
        assert r.n_parent == 4 and r.n_parent_keys == 3
        assert r.n_parent_dup_keys == 1  # pk=2 twice
        assert r.n_unreferenced_parent_keys == 1  # pk=9

    def test_clean_fk_all_zero(self, spark):
        from pd_utils_spark.extensions.checks import referential_report

        child = spark.createDataFrame([(i % 3,) for i in range(9)], ["fk"])
        parent = spark.createDataFrame([(0,), (1,), (2,)], ["pk"])
        r = referential_report(child, parent, "fk", "pk").collect()[0]
        assert r.n_orphan_rows == 0 and r.orphan_frac == 0.0
        assert r.n_parent_dup_keys == 0
        assert r.n_unreferenced_parent_keys == 0

    def test_composite_keys_and_validation(self, spark):
        from pd_utils_spark.extensions.checks import referential_report

        child = spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 1)], ["k1", "k2"]
        )
        parent = spark.createDataFrame(
            [("a", 1), ("b", 1)], ["p1", "p2"]
        )
        r = referential_report(
            child, parent, ["k1", "k2"], ["p1", "p2"]
        ).collect()[0]
        assert r.n_orphan_rows == 1  # ('a', 2)
        with pytest.raises(ValueError, match="arity"):
            referential_report(child, parent, ["k1"], ["p1", "p2"])
