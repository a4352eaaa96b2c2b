"""Event-time window operators, written once to run in BOTH batch and
Structured Streaming mode (the reference, nickderobertis/pd-utils, is
batch-only — SURVEY.md §2.10; this module is the engine extension for
the ``events`` stream shape).

Design rules:

- Operators take and return DataFrames; whether the input came from
  ``spark.read`` or ``spark.readStream`` decides the execution mode.
  Under streaming, set ``watermark=`` so state for closed windows is
  dropped (unbounded state otherwise — the classic streaming OOM).
- Aggregations are expressed with built-in window functions
  (``F.window`` / ``F.session_window``), which Spark executes with
  incremental state stores under streaming and plain hash aggregation
  in batch — one code path, two physical strategies.
- At 100 TB / high-rate streams, per-key state is partitioned by the
  grouping keys; skewed keys (one hot user) are the scale risk —
  compose with salting or pre-aggregation upstream where needed.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pd_utils_spark.utils import to_list


def _agg_exprs(aggs: Mapping[str, str] | Sequence[Column]) -> list[Column]:
    """``{'value': 'sum'}``-style maps become ``F.sum('value').alias
    ('value_sum')``; alternatively pass Column expressions directly."""
    if isinstance(aggs, Mapping):
        out = []
        for col, func in aggs.items():
            if func == "count":
                out.append(F.count(col).alias(f"{col}_count"))
            else:
                out.append(getattr(F, func)(col).alias(f"{col}_{func}"))
        return out
    return list(aggs)


def with_watermark(df: DataFrame, tscol: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Declare event-time lateness tolerance; required for streaming
    window aggregations to bound state. No-op on batch DataFrames'
    results (Spark accepts and ignores it in batch plans)."""
    return df.withWatermark(tscol, delay)


def tumbling_window_agg(
    df: DataFrame,
    tscol: str = "ts",
    duration: str = "1 hour",
    keys: str | Sequence[str] | None = None,
    aggs: Mapping[str, str] | Sequence[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Fixed non-overlapping event-time windows; output has
    ``window_start``/``window_end`` plus keys and aggregates.
    Runs under batch and streaming unchanged."""
    if watermark is not None:
        df = df.withWatermark(tscol, watermark)
    aggs = aggs if aggs is not None else {tscol: "count"}
    keys_l = to_list(keys)
    grouped = df.groupBy(F.window(tscol, duration).alias("__w__"), *keys_l)
    out = grouped.agg(*_agg_exprs(aggs))
    return out.select(
        F.col("__w__.start").alias("window_start"),
        F.col("__w__.end").alias("window_end"),
        *keys_l,
        *[c for c in out.columns if c not in ("__w__", *keys_l)],
    )


def sliding_window_agg(
    df: DataFrame,
    tscol: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    keys: str | Sequence[str] | None = None,
    aggs: Mapping[str, str] | Sequence[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping event-time windows (each event lands in
    duration/slide windows)."""
    if watermark is not None:
        df = df.withWatermark(tscol, watermark)
    aggs = aggs if aggs is not None else {tscol: "count"}
    keys_l = to_list(keys)
    grouped = df.groupBy(F.window(tscol, duration, slide).alias("__w__"), *keys_l)
    out = grouped.agg(*_agg_exprs(aggs))
    return out.select(
        F.col("__w__.start").alias("window_start"),
        F.col("__w__.end").alias("window_end"),
        *keys_l,
        *[c for c in out.columns if c not in ("__w__", *keys_l)],
    )


def session_window_agg(
    df: DataFrame,
    tscol: str = "ts",
    gap: str = "30 minutes",
    keys: str | Sequence[str] | None = None,
    aggs: Mapping[str, str] | Sequence[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Data-driven session windows: a session extends while successive
    events arrive within ``gap``; ``session_end`` = last event + gap
    (Spark's session_window contract). Streaming requires a
    watermark."""
    if watermark is not None:
        df = df.withWatermark(tscol, watermark)
    aggs = aggs if aggs is not None else {tscol: "count"}
    keys_l = to_list(keys)
    grouped = df.groupBy(F.session_window(tscol, gap).alias("__w__"), *keys_l)
    out = grouped.agg(*_agg_exprs(aggs))
    return out.select(
        F.col("__w__.start").alias("session_start"),
        F.col("__w__.end").alias("session_end"),
        *keys_l,
        *[c for c in out.columns if c not in ("__w__", *keys_l)],
    )


def time_rollup(
    df: DataFrame,
    tscol: str = "ts",
    keys: str | Sequence[str] | None = None,
    aggs: Mapping[str, str] | Sequence[Column] | None = None,
    granularities: Sequence[str] = ("hour", "day", "week"),
) -> DataFrame:
    """Hypertable-style multi-granularity rollup: the same aggregates
    computed at each time granularity, unioned with a ``granularity``
    label and the truncated ``bucket`` timestamp. The continuous-
    aggregate pattern of time-series stores expressed as plain
    grouped aggregation — each granularity is one partially-aggregated
    pass; Catalyst shares the scan across the union branches.

    At very large inputs, roll up hierarchically instead (aggregate
    finest first, re-aggregate coarser levels from it) when the
    aggregates are re-aggregable (sum/count/min/max — not avg).
    """
    aggs = aggs if aggs is not None else {tscol: "count"}
    keys_l = to_list(keys)
    out = None
    for g in granularities:
        rolled = (
            df.groupBy(F.date_trunc(g, F.col(tscol)).alias("bucket"), *keys_l)
            .agg(*_agg_exprs(aggs))
            .withColumn("granularity", F.lit(g))
        )
        out = rolled if out is None else out.unionByName(rolled)
    return out


def extract_json_props(
    df: DataFrame,
    propscol: str = "props",
    fields: Mapping[str, str] | None = None,
) -> DataFrame:
    """Pull typed fields out of a JSON-string column:
    ``fields={'k': 'int'}`` adds column ``k`` as int. Uses
    ``get_json_object`` (JVM-side, streaming-safe); for deeply nested
    fixed schemas prefer ``F.from_json`` with an explicit schema."""
    fields = fields or {"k": "int"}
    out = df
    for name, dtype in fields.items():
        out = out.withColumn(
            name, F.get_json_object(F.col(propscol), f"$.{name}").cast(dtype)
        )
    return out


def read_event_stream(
    spark,
    path: str,
    schema,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream reader (the standard test/replay harness for
    event pipelines; swap for kafka in production — same downstream
    operators)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: str | Sequence[str] = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    lower: str = "0 seconds",
    upper: str = "1 hour",
    left_watermark: str = "10 minutes",
    right_watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join — the attribution
    pattern (every right event within ``[left_ts + lower, left_ts +
    upper]`` of a matching-key left event, e.g. clicks within an hour
    of a view). Works identically on batch frames (watermarks are
    accepted and ignored in batch plans), so the batch run IS the
    correctness oracle for the streaming run.

    The two timestamp columns must be named differently and the
    non-key columns must be disjoint (raise early instead of emitting
    ambiguous duplicate names — rename upstream). Under streaming,
    BOTH watermarks plus the two-sided time bound are what let Spark
    evict join state: each side buffers only rows younger than
    (watermark + interval width). Without the upper bound the state
    store grows unboundedly — this API makes the bound mandatory.

    ``how``: 'inner' (default) or the outer variants Spark supports
    for stream-stream joins ('left_outer', 'right_outer',
    'full_outer'); outer rows emit only once the watermark closes
    their interval.
    """
    key_list = to_list(keys)
    if left_ts == right_ts:
        raise ValueError(
            f"left_ts and right_ts must differ, both are {left_ts!r}: "
            "rename one side (the join output carries both)"
        )
    shared = (set(left.columns) & set(right.columns)) - set(key_list)
    if shared:
        raise ValueError(
            f"non-key columns shared by both sides: {sorted(shared)}; "
            "rename them upstream so the joined schema is unambiguous"
        )
    l = left.withWatermark(left_ts, left_watermark)
    r = right.withWatermark(right_ts, right_watermark)
    # name-based key disambiguation: frame-qualified refs (l[k]/r[k])
    # resolve unreliably through streaming watermark nodes, so the
    # right keys are RENAMED before the join and coalesced back after
    # (coalesce, not drop, so outer rows keep their key)
    for k in key_list:
        r = r.withColumnRenamed(k, f"__rk_{k}__")
    cond = None
    for k in key_list:
        c = F.col(k) == F.col(f"__rk_{k}__")
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    out = l.join(r, cond, how)
    for k in key_list:
        out = out.withColumn(
            k, F.coalesce(F.col(k), F.col(f"__rk_{k}__"))
        ).drop(f"__rk_{k}__")
    return out


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    keys: str | Sequence[str],
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static enrichment join — the dimension-lookup pattern
    (attach user segment / device class / domain reputation to every
    event as it arrives). The static side is re-read per micro-batch
    by Spark, needs no watermark, and keeps NO join state — unlike a
    stream-stream join this is stateless and safe at any stream rate,
    which is why enrichment should always be stream-static when the
    dimension fits that shape.

    ``broadcast=True`` (default) hints the dimension onto every
    executor so each micro-batch pays zero shuffle — the right call
    for classic dimensions; disable for a dimension too large to
    broadcast (the join then shuffles each micro-batch on ``keys``).
    Non-key column collisions raise early, same contract as
    :func:`stream_interval_join`. Works identically on batch frames,
    so the batch run is the correctness oracle for the streaming run.
    """
    from pyspark.sql import functions as F

    key_list = to_list(keys)
    shared = (set(stream.columns) & set(dim.columns)) - set(key_list)
    if shared:
        raise ValueError(
            f"non-key columns shared by both sides: {sorted(shared)}; "
            "rename them upstream so the joined schema is unambiguous"
        )
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, key_list, how)
