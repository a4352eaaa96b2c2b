"""Sinks: partitioned / compacted output layouts.

The write-side counterpart of ``plans.skew.write_bucketed`` (bucketed
tables for zero-shuffle joins). These helpers encode the two layout
decisions every 100 TB pipeline output has to make:

- **Partition pruning**: ``write_partitioned`` lays data out as
  ``col=value/`` directories so downstream readers scan only the
  partitions their filters touch (Spark/DuckDB/Trino/Hive all prune
  this layout at plan time).
- **File sizing**: small-file floods (one file per task per partition)
  destroy scan throughput at scale; ``maxRecordsPerFile`` bounds the
  top end and ``compact_small_files`` repairs an existing layout's
  bottom end by rewriting to ~target-sized files.

No reference counterpart (nickderobertis/pd-utils writes with bare
``DataFrame.to_csv``); this is engine-extension scope.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | Sequence[str],
    sort_by: Optional[str | Sequence[str]] = None,
    file_format: str = "parquet",
    mode: str = "overwrite",
    max_records_per_file: Optional[int] = None,
    tasks_per_partition: int = 1,
) -> None:
    """Write ``df`` as a ``partition_by``-directory layout, optionally
    sorting rows within each task partition (``sort_by``) so that
    min/max column statistics in the footers are tight and downstream
    range filters skip whole row groups.

    The write shuffles on ``partition_by`` first (``repartition``) so
    each output partition directory is produced by one task — without
    this, every task writes a sliver into every directory and the
    output is a small-file flood (tasks × partitions files).
    ``max_records_per_file`` caps file size from above; AQE coalescing
    handles the small end of the shuffle.

    At 100 TB a hot partition value (e.g. today's date, the dominant
    language) would serialize through ONE task; set
    ``tasks_per_partition`` > 1 to salt the shuffle so each partition
    directory is written by up to that many tasks (files per directory
    scale with it — the small-file/parallelism dial). The salt only
    spreads rows across writer tasks; it never appears in the output.
    """
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    if tasks_per_partition < 1:
        raise ValueError(f"tasks_per_partition must be >= 1: {tasks_per_partition}")
    if tasks_per_partition == 1:
        out = df.repartition(*parts)
    else:
        from pyspark.sql import functions as F

        # Round-robin salt, not a row-content hash: duplicate-heavy hot
        # partitions (the pre-dedup case this dial exists for) would
        # hash identical rows to one salt value and still serialize
        # through a single task. File-to-task assignment is allowed to
        # vary run-to-run; file CONTENTS (the rows) do not.
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(tasks_per_partition))
        out = df.repartition(*[F.col(p) for p in parts], salt)
    if sort_by is not None:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        out = out.sortWithinPartitions(*parts, *sorts)
    writer = out.write.mode(mode).partitionBy(*parts)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.format(file_format).save(path)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith((".", "_")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _partition_columns(path: str) -> list[str]:
    """Hive-style partition columns of a layout, from the directory
    names (``col=value``), outermost first."""
    cols: list[str] = []
    cur = path
    while True:
        subdirs = [
            d
            for d in os.listdir(cur)
            if os.path.isdir(os.path.join(cur, d)) and "=" in d and not d.startswith(".")
        ]
        if not subdirs:
            return cols
        name = subdirs[0].split("=", 1)[0]
        if not name or name in cols:
            return cols
        cols.append(name)
        cur = os.path.join(cur, subdirs[0])


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 256,
    file_format: str = "parquet",
) -> DataFrame:
    """Rewrite a (possibly small-file-flooded) dataset into
    ~``target_file_mb``-sized files and return the compacted frame.
    Reads the whole layout once and writes to ``path + '.compact'``
    (callers swap directories atomically — never compact in place: a
    mid-rewrite failure must not destroy the source).

    A Hive-partitioned layout (``col=value/`` directories) keeps its
    partitioning: the partition columns are re-applied on the rewrite,
    so downstream partition pruning survives compaction — flattening
    the layout would silently turn pruned scans into full scans.

    Local-filesystem byte accounting; on object stores substitute the
    store's listing API for ``_dir_bytes`` (the Spark plan is
    identical).
    """
    if target_file_mb <= 0:
        raise ValueError(f"target_file_mb must be positive: {target_file_mb}")
    df = spark.read.format(file_format).load(path)
    total = _dir_bytes(path)
    n_files = max(1, -(-total // (target_file_mb * 1024 * 1024)))
    out_path = path.rstrip("/") + ".compact"
    part_cols = _partition_columns(path)
    if part_cols:
        from pyspark.sql import functions as F

        salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_files))
        writer = (
            df.repartition(*[F.col(c) for c in part_cols], salt)
            .write.mode("overwrite")
            .partitionBy(*part_cols)
        )
    else:
        writer = df.coalesce(n_files).write.mode("overwrite")
    writer.format(file_format).save(out_path)
    return spark.read.format(file_format).load(out_path)
