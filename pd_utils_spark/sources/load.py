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
}


def read_file(spark: SparkSession, filepath: str, **kwargs) -> DataFrame:
    """Extension-dispatched loader (reference:
    pd_utils/optimize/load/__init__.py:6-22 — CSV only there; parquet /
    json / orc / tsv added as the natural Spark surface)."""
    ext = os.path.splitext(filepath)[1].lower()
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
    """Narrow numeric storage types where lossless: bigint -> int when
    values fit (reference: pd_utils/optimize/dftypes.py:7-36 —
    object->category there is parquet dictionary encoding here, and
    Tungsten already packs rows; this survives mostly as an explicit
    cast utility for wire/size-sensitive sinks)."""
    out = df
    for name, dtype in df.dtypes:
        if dtype == "double":
            out = out.withColumn(name, F.col(name).cast("float"))
        elif dtype == "bigint":
            out = out.withColumn(name, F.col(name).cast("int"))
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
