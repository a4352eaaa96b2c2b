"""SQL escape hatch and column-condition filters.

Spark-native re-expression of the reference's query module
(reference: pd_utils/query.py). Spark SQL replaces the reference's
pandasql/SQLite round-trip: no data copies, no dtype repair, full
Catalyst optimization.
"""

from __future__ import annotations

import re
from functools import reduce
from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pd_utils_spark.utils import quote, to_list


def select_rows_by_condition_on_columns(
    df: DataFrame, cols: List[str], condition: str = "== 1", logic: str = "or"
) -> DataFrame:
    """Keep rows where ANY ('or') or ALL ('and') of ``cols`` satisfy the
    fixed right-hand-side ``condition`` (reference: pd_utils/query.py:8-41).

    Spark expression names are backtick-quoted, so the reference's
    space/dot renaming dance is unnecessary; column names are untouched.
    The predicate stays a native Catalyst filter (pushed down to the
    scan where possible).
    """
    conds = [F.expr(f"{quote(c)} {condition}") for c in cols]
    op = (lambda a, b: a | b) if logic == "or" else (lambda a, b: a & b)
    return df.filter(reduce(op, conds))


def _extract_table_names_from_sql(query: str) -> list[str]:
    """Table names from FROM/JOIN clauses, in first-appearance order
    (same regex contract as the reference, pd_utils/query.py:80-87)."""
    tables_blocks = re.findall(
        r"(?:FROM|JOIN)\s+(\w+(?:\s*,\s*\w+)*)", query, re.IGNORECASE
    )
    tables = [tbl for block in tables_blocks for tbl in re.findall(r"\w+", block)]
    return list(dict.fromkeys(tables).keys())


def sql(df_list: List[DataFrame], query: str) -> DataFrame:
    """Run a SQL query over a list of DataFrames, binding them
    positionally to the table names appearing in FROM/JOIN clauses
    (reference: pd_utils/query.py:44-77).

    Each frame becomes a temp view; ``spark.sql`` plans the query on
    Catalyst. No datetime repair needed — types survive.
    """
    df_list = to_list(df_list) if not isinstance(df_list, list) else df_list
    names = _extract_table_names_from_sql(query)
    spark = df_list[0].sparkSession
    for name, frame in zip(names, df_list):
        frame.createOrReplaceTempView(name)
    return spark.sql(query)
