"""Physical-layout operators: multi-dimensional Z-order (Morton)
clustering for data-skipping.

Parquet readers prune row groups with min/max statistics, but the
stats only help when each file covers a NARROW range of the filter
column. Sorting by one column gives perfect pruning on that column
and none on others; interleaving the bits of several columns' ranks
(the Z-order curve) gives every clustered column locality at once, so
a selective filter on ANY of them skips most files. This is the same
layout trick Delta/Iceberg expose as OPTIMIZE ZORDER BY, built here
from plain DataFrame expressions (engine extension; the reference
pandas library has no storage-layout surface).

Scale shape: one tiny min/max aggregate broadcast back onto the frame
(no driver action, no collect), one pure-integer projection for the
key, and one range repartition + in-partition sort for the write —
the single full shuffle any clustering write must pay.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pd_utils_spark.utils import to_list


def _quantize(col: Column, cmin: Column, cmax: Column, levels: int) -> Column:
    """Linear map of ``col`` into [0, levels-1] given broadcast
    min/max bounds; degenerate (min == max) and null values land in
    bucket 0 so every row keeps a defined key."""
    span = cmax - cmin
    q = F.floor((col - cmin) / span * levels).cast("bigint")
    q = F.least(F.greatest(q, F.lit(0)), F.lit(levels - 1))
    return F.coalesce(F.when(span > 0, q), F.lit(0))


def zorder_key(
    df: DataFrame,
    cols: str | Sequence[str],
    bits: int = 8,
    out: str = "zorder",
) -> DataFrame:
    """Add a Morton (Z-order) key interleaving the bit patterns of the
    given numeric columns' quantized ranks: column i contributes bit b
    of its ``bits``-wide bucket index to output bit ``b * ncols + i``.
    Rows close in the key are close in EVERY clustered dimension.

    Bounds come from one min/max aggregate joined back via a broadcast
    single-row cross join — no driver action; the whole key is a lazy
    integer projection, so it composes into write pipelines.
    """
    cols_l = to_list(cols)
    if not cols_l:
        raise ValueError("cols must be non-empty")
    if bits < 1 or bits * len(cols_l) > 62:
        raise ValueError(
            f"bits * len(cols) must fit a signed 64-bit key, got "
            f"{bits} * {len(cols_l)}"
        )
    levels = 1 << bits
    aggs = []
    for c in cols_l:
        cd = F.col(c).cast("double")
        aggs += [
            F.min(cd).alias(f"__zmin_{c}__"),
            F.max(cd).alias(f"__zmax_{c}__"),
        ]
    bounds = df.agg(*aggs)
    with_bounds = df.crossJoin(F.broadcast(bounds))
    key = F.lit(0).cast("bigint")
    n = len(cols_l)
    for i, c in enumerate(cols_l):
        q = _quantize(
            F.col(c).cast("double"),
            F.col(f"__zmin_{c}__"),
            F.col(f"__zmax_{c}__"),
            levels,
        )
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return with_bounds.withColumn(out, key).drop(
        *[f"__zmin_{c}__" for c in cols_l], *[f"__zmax_{c}__" for c in cols_l]
    )


def zorder_by(
    df: DataFrame,
    cols: str | Sequence[str],
    bits: int = 8,
    num_files: int | None = None,
) -> DataFrame:
    """Cluster the frame along the Z-order curve of ``cols``: range
    repartition on the Morton key (``num_files`` output partitions)
    and sort within each partition, so a subsequent parquet write
    emits files whose min/max spans are narrow in every clustered
    column. Returns the clustered frame ready for ``.write``.
    """
    keyed = zorder_key(df, cols, bits)
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(parts, F.col("zorder"))
        .sortWithinPartitions("zorder")
        .drop("zorder")
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: str | Sequence[str],
    bits: int = 8,
    num_files: int | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
    **options,
) -> None:
    """Write ``df`` Z-order-clustered on ``cols`` — the storage half
    of the layout module (the OPTIMIZE ZORDER BY write path): range
    repartition on the Morton key into ``num_files`` files, sort
    within each, write. Each output file then covers a narrow
    min/max span in EVERY clustered column, so parquet footer
    statistics let any reader (Spark row-group pruning, DuckDB,
    Trino) skip most files on a selective filter over any of them —
    ``tests/test_plans_layout.py`` proves the skip rate on footer
    stats directly. One full shuffle (the minimum any clustering
    write pays); no driver action.
    """
    zorder_by(df, cols, bits, num_files).write.format(format).mode(mode).options(
        **options
    ).save(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | Sequence[str],
    files_per_partition: int = 1,
    mode: str = "overwrite",
    format: str = "parquet",
    **options,
) -> None:
    """Hive-partitioned write WITHOUT the small-files explosion: the
    naive ``df.write.partitionBy(cols)`` makes every TASK write one
    file into every partition directory it holds rows for — at 100 TB
    with 10k tasks x 1k partition values that is up to 10M tiny
    files, the classic lake-killer. Here rows are first repartitioned
    BY the partition columns (plus a bounded salt when
    ``files_per_partition > 1``), so each partition directory receives
    exactly ``files_per_partition`` files regardless of upstream
    parallelism.

    One shuffle on the partition keys — the minimum any clustered
    write pays — then a map-side write. Skewed partition values get
    ``files_per_partition`` writers instead of one (the salt), which
    is also the knob for partitions too big for a single file.
    """
    cols = to_list(partition_by)
    keys = [F.col(c) for c in cols]
    if files_per_partition > 1:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(files_per_partition),
        )
        out = df.repartition(*(keys + [salt]))
    else:
        out = df.repartition(*keys)
    out.write.format(format).mode(mode).partitionBy(*cols).options(
        **options
    ).save(path)
