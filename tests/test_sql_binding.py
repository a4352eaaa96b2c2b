"""Tests for the SQL escape hatch's positional table binding
(reference contract: regex extraction of FROM/JOIN names)."""

from __future__ import annotations

import pandas as pd

import pd_utils_spark as pus
from pd_utils_spark.query import _extract_table_names_from_sql


class TestNameExtraction:
    def test_from_and_join(self):
        q = "SELECT * FROM a JOIN b ON a.x = b.x LEFT JOIN c ON b.y = c.y"
        assert _extract_table_names_from_sql(q) == ["a", "b", "c"]

    def test_comma_separated_from(self):
        assert _extract_table_names_from_sql("SELECT * FROM t1, t2 WHERE 1=1") == [
            "t1",
            "t2",
        ]

    def test_repeated_names_deduped_first_appearance(self):
        q = "SELECT * FROM x JOIN y ON 1=1 JOIN x ON 1=1"
        assert _extract_table_names_from_sql(q) == ["x", "y"]

    def test_case_insensitive(self):
        assert _extract_table_names_from_sql("select * from Foo join BAR on 1=1") == [
            "Foo",
            "BAR",
        ]

    def test_subquery_parens_not_captured(self):
        q = "SELECT * FROM (SELECT 1) t"
        # parenthesized subquery is not a bindable name; the alias block
        # inside is what the regex sees first
        names = _extract_table_names_from_sql(q)
        assert "(" not in "".join(names)


class TestPositionalBinding:
    def test_three_frames_bind_in_order(self, spark):
        a = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "va": ["x", "y"]}))
        b = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "vb": [10.0, 20.0]}))
        c = spark.createDataFrame(pd.DataFrame({"k": [1], "vc": [100]}))
        out = pus.sql(
            [a, b, c],
            """
            SELECT ta.k, ta.va, tb.vb, tc.vc
            FROM ta JOIN tb ON ta.k = tb.k LEFT JOIN tc ON ta.k = tc.k
            """,
        ).toPandas().sort_values("k")
        assert out.va.tolist() == ["x", "y"]
        assert out.vb.tolist() == [10.0, 20.0]
        assert out.vc.fillna(-1).tolist() == [100, -1]
