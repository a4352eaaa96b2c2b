"""Sources and storage utilities.

Spark-native re-expression of the reference's load / optimize modules
(reference: pd_utils/load.py, pd_utils/optimize/).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EXT_READERS = {
    ".csv": lambda spark, path, **kw: spark.read.csv(
        path, header=kw.pop("header", True), inferSchema=kw.pop("inferSchema", True), **kw
    ),
    ".parquet": lambda spark, path, **kw: spark.read.parquet(path),
    ".json": lambda spark, path, **kw: spark.read.json(path, **kw),
    ".orc": lambda spark, path, **kw: spark.read.orc(path),
    ".tsv": lambda spark, path, **kw: spark.read.csv(
        path, sep="\t", header=kw.pop("header", True), inferSchema=kw.pop("inferSchema", True), **kw
    ),
    ".txt": lambda spark, path, **kw: spark.read.text(path, **kw),
    ".jsonl": lambda spark, path, **kw: spark.read.json(path, **kw),
}

#: transparent-compression suffixes: Spark's text-based readers
#: decompress these per file, so dispatch keys on the inner extension
_COMPRESSION_SUFFIXES = (".gz", ".bz2", ".zst", ".lz4", ".deflate", ".snappy")


def read_file(spark: SparkSession, filepath: str, **kwargs) -> DataFrame:
    """Extension-dispatched loader (reference:
    pd_utils/optimize/load/__init__.py:6-22 — CSV only there; parquet /
    json / jsonl / orc / tsv / txt added as the natural Spark surface).
    Compressed text files (``.csv.gz``, ``.jsonl.zst``, ...) dispatch
    on the inner extension — Spark's readers decompress transparently."""
    name = filepath.lower()
    for suffix in _COMPRESSION_SUFFIXES:
        if name.endswith(suffix):
            name = name[: -len(suffix)]
            break
    ext = os.path.splitext(name)[1]
    if ext not in _EXT_READERS:
        raise NotImplementedError(f"no reader registered for extension {ext!r}")
    return _EXT_READERS[ext](spark, filepath, **kwargs)


def load_sas(
    spark: SparkSession, filepath: str, csv: bool = True, cache_dir: Optional[str] = None
) -> DataFrame:
    """SAS sas7bdat loader with a write-through parquet cache
    (reference: pd_utils/load.py:7-42 — there a CSV cache, invalidated
    by mtime; parquet is the Spark-era equivalent, ~columnar + typed).

    The sas7bdat read itself needs either the ``spark-sas7bdat``
    datasource on the classpath or pandas' ``read_sas`` for a one-time
    driver-side conversion of modest files. Neither ships in this
    environment, so the cold path raises unless a cache already exists.
    """
    cache_path = (cache_dir or os.path.dirname(filepath)) + "/" + (
        os.path.splitext(os.path.basename(filepath))[0] + ".parquet"
    )
    if csv and os.path.exists(cache_path) and os.path.getmtime(cache_path) >= os.path.getmtime(
        filepath
    ):
        return spark.read.parquet(cache_path)
    try:
        import pandas as pd

        pdf = pd.read_sas(filepath, encoding="utf-8")
    except UnicodeDecodeError:
        import pandas as pd

        pdf = pd.read_sas(filepath, encoding="cp1252")
    sdf = spark.createDataFrame(pdf)
    if csv:
        sdf.write.mode("overwrite").parquet(cache_path)
        return spark.read.parquet(cache_path)
    return sdf


def optimized_df(df: DataFrame) -> DataFrame:
    """Narrow numeric storage types where LOSSLESS: bigint -> int only
    when every value fits, double -> float only when every value
    round-trips exactly (reference: pd_utils/optimize/dftypes.py:7-36,
    whose pandas ``downcast`` checks the same; object->category there
    is parquet dictionary encoding here). One aggregation pass checks
    all candidate columns at once; columns that would lose data keep
    their type."""
    int_cols = [n for n, t in df.dtypes if t == "bigint"]
    dbl_cols = [n for n, t in df.dtypes if t == "double"]
    if not int_cols and not dbl_cols:
        return df

    checks = []
    for c in int_cols:
        checks.append(F.min(c).alias(f"__min_{c}__"))
        checks.append(F.max(c).alias(f"__max_{c}__"))
    for c in dbl_cols:
        # exact float32 round-trip: max absolute representation error
        checks.append(
            F.max(
                F.abs(F.col(c) - F.col(c).cast("float").cast("double"))
            ).alias(f"__err_{c}__")
        )
    row = df.agg(*checks).collect()[0]

    out = df
    for c in int_cols:
        lo, hi = row[f"__min_{c}__"], row[f"__max_{c}__"]
        if lo is not None and -(2**31) <= lo and hi <= 2**31 - 1:
            out = out.withColumn(c, F.col(c).cast("int"))
    for c in dbl_cols:
        if row[f"__err_{c}__"] is None or row[f"__err_{c}__"] == 0.0:
            out = out.withColumn(c, F.col(c).cast("float"))
    return out


def df_types_dict(df: DataFrame, remove_dates: bool = True) -> dict:
    """Schema introspection -> {column: dtype string}, optionally
    excluding date/timestamp columns (reference:
    pd_utils/optimize/dftypes.py:39-52)."""
    out = {}
    for name, dtype in df.dtypes:
        if remove_dates and dtype in ("date", "timestamp", "timestamp_ntz"):
            continue
        out[name] = dtype
    return out


def to_copy_paste(df: DataFrame, index: bool = False, column_names: bool = True, limit: int = 1000) -> str:
    """Print/return a DataFrame as a ``pd.DataFrame(...)`` constructor
    literal for test authoring (reference: pd_utils/testing.py:4-28).
    Dev tool: collects up to ``limit`` rows."""
    rows = df.limit(limit).collect()
    lines = ["pd.DataFrame(data = ["]
    for r in rows:
        lines.append(f"    {tuple(r)},")
    lines.append("]")
    if column_names:
        lines.append(",columns = " + repr(list(df.columns)))
    lines.append(")")
    out = "\n".join(lines)
    print(out)
    return out
