"""Shared helpers for pd_utils_spark operators."""

from __future__ import annotations

from pyspark.sql import DataFrame

NUMERIC_SPARK_TYPES = {
    "tinyint",
    "smallint",
    "int",
    "bigint",
    "float",
    "double",
}


def to_list(v) -> list:
    """str -> [str]; None -> []; list/tuple passed through as list."""
    if v is None:
        return []
    if isinstance(v, str):
        return [v]
    return list(v)


def numeric_cols(df: DataFrame, exclude: list[str] | None = None) -> list[str]:
    """Names of numeric (int/float family) columns, preserving df order."""
    exclude = exclude or []
    out = []
    for name, dtype in df.dtypes:
        base = dtype.split("(")[0]
        if base in NUMERIC_SPARK_TYPES or base == "decimal":
            if name not in exclude:
                out.append(name)
    return out


def quote(col: str) -> str:
    """Backtick-quote a column name for use in SQL expressions."""
    return "`" + col.replace("`", "``") + "`"
