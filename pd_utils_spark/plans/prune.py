"""Semi-join reduction — cut the probe side of a big join BEFORE its
shuffle. The classic 100 TB pattern: a selective dimension filter
should shrink the fact scan's shuffle, not just the join output.
Spark's own runtime Bloom filter (InjectRuntimeFilter,
``spark.sql.optimizer.runtime.bloomFilter.enabled``) applies the same
idea automatically but only under its creation-side heuristics; these
operators make the reduction explicit and tunable.

Two tools, same contract (the pruned join equals the plain join —
Bloom false positives only travel to the join and drop there; false
negatives are impossible):

- :func:`semi_prune_join` — broadcast the build side's DISTINCT keys
  and left-semi-filter the probe side. Exact pruning; right choice
  while the distinct key set broadcasts comfortably.
- :func:`bloom_prune_join` — when the key set is too large to
  broadcast as rows, compress it to an m-bit Bloom filter built with
  ONE column-pruned aggregation (per-word ``bit_or`` of hash masks),
  collected bounded (m/64 longs, e.g. 2 MiB for m=2^24), and probed
  by a pure whole-stage-codegen expression on the fact side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pd_utils_spark.utils import to_list


def semi_prune_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Exact semi-join reduction: broadcast the right side's distinct
    join keys, left-semi-filter ``left`` down to rows that can match,
    then run the real join on the reduced side. Semantically identical
    to ``left.join(right, on, how)`` for inner joins (the semi filter
    drops only rows the join would drop) — the win is that the dropped
    rows never enter the join's shuffle.

    Use when the build side's distinct key count is broadcast-sized
    (roughly < 10M keys); above that, :func:`bloom_prune_join`
    compresses the key set instead of shipping it.
    """
    if how not in ("inner",):
        raise ValueError(
            f"semi_prune_join supports how='inner' only, got {how!r} "
            "(pruning the left side would drop left-outer rows)"
        )
    on_l = to_list(on)
    keys = F.broadcast(right.select(*on_l).distinct())
    return left.join(keys, on_l, "left_semi").join(right, on_l, how)


def _bloom_positions(cols: list, num_bits: int, num_hashes: int):
    """k independent bit positions per row: xxhash64 seeded by the
    hash index, folded into [0, num_bits)."""
    return [
        F.pmod(F.xxhash64(*cols, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_prune_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    num_bits: int = 1 << 23,
    num_hashes: int = 3,
) -> DataFrame:
    """Bloom-filter semi-join reduction, built and probed entirely
    with DataFrame operations (Spark's ``bloom_filter_agg`` is not in
    the public function registry, so the filter is assembled from
    first principles):

    1. **Build** (one column-pruned pass over ``right``): each key row
       contributes ``num_hashes`` bit positions; positions group by
       64-bit word index and ``bit_or`` their masks — a map-side
       partial-aggregating shuffle of at most ``num_bits/64`` rows.
    2. **Ship**: the set words land in a driver-assembled long array
       (bounded at ``num_bits/64`` entries — 1 MiB for the default
       2^23 bits — independent of right's row count) carried by a
       broadcast one-row frame.
    3. **Probe**: ``left`` rows test all ``num_hashes`` bits with
       ``element_at(words, pos div 64) & mask`` — a pure column
       expression inside whole-stage codegen, BEFORE the join
       shuffle. Survivors take the normal join.

    The result is exactly ``left.join(right, on, how='inner')``:
    false positives are eliminated by the join itself. With the
    defaults, ~10 bits/key up to ~800k distinct keys gives a
    false-positive rate under ~2% — size ``num_bits`` at roughly
    10x the expected distinct key count.
    """
    if how not in ("inner",):
        raise ValueError(
            f"bloom_prune_join supports how='inner' only, got {how!r} "
            "(pruning the left side would drop left-outer rows)"
        )
    if num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    on_l = to_list(on)
    key_cols = [F.col(c) for c in on_l]

    pos = _bloom_positions(key_cols, num_bits, num_hashes)
    words = (
        right.select(F.explode(F.array(*pos)).alias("__pos__"))
        .select(
            F.expr("CAST(__pos__ DIV 64 AS INT)").alias("__w__"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos__ % 64 AS INT))").alias(
                "__m__"
            ),
        )
        .groupBy("__w__")
        .agg(F.bit_or("__m__").alias("__m__"))
        .collect()
    )
    arr = [0] * (num_bits // 64)
    for r in words:
        arr[r["__w__"]] = r["__m__"]
    bloom = F.broadcast(
        left.sparkSession.createDataFrame([(arr,)], "__bloom__ array<bigint>")
    )

    probe = left.crossJoin(bloom)
    hit = None
    for i, p in enumerate(_bloom_positions(key_cols, num_bits, num_hashes)):
        probe = probe.withColumn(f"__bp{i}__", p)
        test = F.expr(
            f"(element_at(__bloom__, CAST(__bp{i}__ DIV 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(__bp{i}__ % 64 AS INT))) != 0"
        )
        hit = test if hit is None else (hit & test)
    pruned = probe.filter(hit).drop(
        "__bloom__", *[f"__bp{i}__" for i in range(num_hashes)]
    )
    return pruned.join(right, on_l, how)
