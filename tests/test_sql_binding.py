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

    def test_comma_join_aliases_do_not_bind_use_cross_join(self):
        """Contract note discovered in round 5 (TPC-H Q2/Q9 work):
        names AFTER a comma are only extracted when the list has no
        aliases — `FROM a_t a, b_t b` yields just a_t (the regex's
        comma continuation stops at the alias). Comma-join SQL must be
        written with explicit JOIN / CROSS JOIN for every frame to
        bind; this test pins the limitation so a future regex change
        is a conscious one."""
        from pd_utils_spark.query import _extract_table_names_from_sql

        aliased = _extract_table_names_from_sql(
            "SELECT * FROM a_t a, b_t b WHERE a.k = b.k"
        )
        assert aliased == ["a_t"]  # b_t invisible to binding
        crossed = _extract_table_names_from_sql(
            "SELECT * FROM a_t a CROSS JOIN b_t b WHERE a.k = b.k"
        )
        assert crossed == ["a_t", "b_t"]

    def test_cte_names_consume_binding_slots_but_are_shadowed(self, spark):
        """A CTE name appearing in FROM occupies a positional slot
        (pass a placeholder frame for it — TPC-H Q20's pattern); the
        CTE definition shadows whatever temp view lands on the name."""
        li = spark.createDataFrame(pd.DataFrame({"k": [1, 1, 2], "v": [1.0, 2.0, 5.0]}))
        other = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "w": ["a", "b"]}))
        out = pus.sql(
            [li, other, li],  # 3rd frame fills the shadowed `agg` slot
            """
            WITH agg AS (SELECT k, sum(v) AS sv FROM li_t GROUP BY k)
            SELECT o.k, o.w, agg.sv
            FROM o_t o JOIN agg ON agg.k = o.k
            """,
        ).toPandas().sort_values("k")
        assert out.sv.tolist() == [3.0, 5.0]
        assert out.w.tolist() == ["a", "b"]
