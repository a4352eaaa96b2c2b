"""Dataset versioning — snapshot diff and SCD2 merge.

Incremental pipelines at 100 TB live and die by "what changed since
the last run": a full-outer key diff to audit a new snapshot against
the released one, and a slowly-changing-dimension (type 2) merge to
maintain history without rewriting it. Both are single co-partitioned
joins plus column expressions — no Python in the row path.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pd_utils_spark.utils import to_list

ADDED = "added"
REMOVED = "removed"
CHANGED = "changed"
UNCHANGED = "unchanged"


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    keys: str | Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
    check_unique: bool = True,
) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``keys``: one output
    row per key with ``diff_status`` in added / removed / changed /
    unchanged and ``changed_cols`` (the names of the compare columns
    whose values differ, null-safely; empty for non-changed rows).
    Old and new values of each compare column come back as
    ``<col>_old`` / ``<col>_new``.

    ``compare_cols`` defaults to every shared non-key column. Keys
    must be unique per snapshot (it's a key diff, not a multiset
    diff) — duplicate keys raise rather than silently multiplying
    rows through the join.

    Plan: ONE full-outer shuffle join on the keys; status and
    changed-column detection are pure column expressions
    (``eqNullSafe`` per compare column, array_compact of names).
    """
    keys_l = to_list(keys)
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keys_l
        ]
    cmp_l = list(compare_cols)

    for side, df in ((("old", old), ("new", new)) if check_unique else ()):
        # one extra column-pruned pass per side; disable via
        # check_unique=False when the writer already guarantees keys
        dup = df.groupBy(*keys_l).count().filter(F.col("count") > 1).limit(1)
        if dup.count() > 0:
            raise ValueError(
                f"{side} snapshot has duplicate keys on {keys_l}; "
                "dataset_diff requires unique keys per snapshot"
            )

    o = old.select(
        *keys_l,
        F.lit(True).alias("__in_old__"),
        *[F.col(c).alias(f"{c}_old") for c in cmp_l],
    )
    n = new.select(
        *keys_l,
        F.lit(True).alias("__in_new__"),
        *[F.col(c).alias(f"{c}_new") for c in cmp_l],
    )
    j = o.join(n, keys_l, "full_outer")

    diffs = [
        F.when(
            ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new")), F.lit(c)
        )
        for c in cmp_l
    ]
    changed_cols = (
        F.array_compact(F.array(*diffs)) if diffs else F.array().cast("array<string>")
    )
    status = (
        F.when(F.col("__in_old__").isNull(), F.lit(ADDED))
        .when(F.col("__in_new__").isNull(), F.lit(REMOVED))
        .when(F.size("__changed_cols__") > 0, F.lit(CHANGED))
        .otherwise(F.lit(UNCHANGED))
    )
    return (
        j.withColumn("__changed_cols__", changed_cols)
        .withColumn("diff_status", status)
        .withColumnRenamed("__changed_cols__", "changed_cols")
        .drop("__in_old__", "__in_new__")
        .select(
            *keys_l,
            "diff_status",
            "changed_cols",
            *[f"{c}_old" for c in cmp_l],
            *[f"{c}_new" for c in cmp_l],
        )
    )


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: str | Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Per-status key counts of :func:`dataset_diff` — the one-line
    release gate ("this run would remove 40% of the table" should
    fail loudly before the overwrite, not after)."""
    return (
        dataset_diff(old, new, keys, compare_cols)
        .groupBy("diff_status")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    keys: str | Sequence[str],
    tracked: Sequence[str],
    effective_ts,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
    check_unique: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension **type 2** merge: apply ``updates``
    (one row per key — the latest observed attribute values) to a
    versioned dimension, closing out rows whose tracked attributes
    changed and appending the new versions, while history rows pass
    through untouched.

    ``dim`` carries ``keys + tracked + valid_from + valid_to +
    current_flag`` (current rows: ``valid_to`` null, flag true).
    ``effective_ts`` (a Python value or Column) stamps both the close
    (old row's ``valid_to``) and the open (new row's ``valid_from``).

    Semantics per update key, with null-safe attribute comparison:

    - key not in current dim  -> new current row (insert)
    - tracked values differ   -> current row closed + new current row
    - tracked values equal    -> no-op (no churn versions)

    Keys present in dim but absent from updates are left current
    (absence is not a delete — deletions need an explicit tombstone
    feed, which composes as an update with a deleted flag column).

    Plan: updates join current-slice on keys (one shuffle; broadcast
    it yourself if the update batch is small), then three
    column-pruned branches unioned with history. Update keys must be
    unique — duplicates raise.
    """
    keys_l = to_list(keys)
    tracked_l = list(tracked)
    out_cols = keys_l + tracked_l + [valid_from, valid_to, current_flag]
    ts = effective_ts if isinstance(effective_ts, Column) else F.lit(effective_ts)

    if check_unique:
        dup = updates.groupBy(*keys_l).count().filter(F.col("count") > 1).limit(1)
        if dup.count() > 0:
            raise ValueError(
                f"updates have duplicate keys on {keys_l}; scd2_merge "
                "applies one version per key per batch — pre-aggregate to "
                "the latest"
            )

    history = dim.filter(~F.col(current_flag)).select(*out_cols)
    current = dim.filter(F.col(current_flag)).select(*out_cols)

    u = updates.select(
        *keys_l, *[F.col(c).alias(f"__u_{c}__") for c in tracked_l]
    )
    same = None
    for c in tracked_l:
        eq = F.col(c).eqNullSafe(F.col(f"__u_{c}__"))
        same = eq if same is None else (same & eq)
    # explicit presence flags: tracked values may legitimately be null,
    # so null-ness of a tracked column cannot mark side membership
    j = (
        current.withColumn("__in_cur__", F.lit(True))
        .join(u.withColumn("__in_upd__", F.lit(True)), keys_l, "full_outer")
    )
    changed = F.col("__in_cur__").isNotNull() & F.col("__in_upd__").isNotNull() & ~same
    new_key = F.col("__in_cur__").isNull()
    untouched = F.col("__in_upd__").isNull() | (
        F.col("__in_cur__").isNotNull() & F.col("__in_upd__").isNotNull() & same
    )

    kept_current = j.filter(untouched).select(*out_cols)
    closed = (
        j.filter(changed)
        .withColumn(valid_to, ts)
        .withColumn(current_flag, F.lit(False))
        .select(*out_cols)
    )
    opened = (
        j.filter(changed | new_key)
        .select(
            *keys_l,
            *[F.col(f"__u_{c}__").alias(c) for c in tracked_l],
            ts.alias(valid_from),
            F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
            F.lit(True).alias(current_flag),
        )
    )
    return history.unionByName(kept_current).unionByName(closed).unionByName(opened)


def agg_state(
    df: DataFrame,
    keys: str | Sequence[str],
    cols: str | Sequence[str],
) -> DataFrame:
    """Map-side-mergeable aggregation STATE per key: for each value
    column, ``{c}_n / {c}_sum / {c}_sumsq / {c}_min / {c}_max``. The
    incremental-pipeline primitive — aggregate each new batch alone,
    :func:`merge_agg_states` with the stored state, land the merged
    state, and :func:`finalize_agg_state` whenever someone needs
    mean/std/min/max/count. A 100 TB history is never re-scanned:
    per-batch cost is one partial-agg shuffle over the batch, merge
    cost is proportional to the STATE (|keys|), not the data.

    The moments are algebraic (the same decomposition Spark itself
    uses for map-side combine), so merge-then-finalize equals
    finalize-over-everything exactly in exact arithmetic; in floats
    the usual accumulation-order caveat applies (see SCALE.md).
    """
    keys_l = to_list(keys)
    cols_l = to_list(cols)
    aggs = []
    for c in cols_l:
        v = F.col(c).cast("double")
        aggs += [
            F.count(v).alias(f"{c}_n"),
            F.sum(v).alias(f"{c}_sum"),
            F.sum(v * v).alias(f"{c}_sumsq"),
            F.min(v).alias(f"{c}_min"),
            F.max(v).alias(f"{c}_max"),
        ]
    return df.groupBy(*keys_l).agg(*aggs)


def merge_agg_states(
    states: Sequence[DataFrame],
    keys: str | Sequence[str],
) -> DataFrame:
    """Combine :func:`agg_state` frames (history + new batches) into
    one state: counts/sums/sumsqs add, mins min, maxes max. Union +
    one partial-agg shuffle over state rows only."""
    if not states:
        raise ValueError("need at least one state frame")
    keys_l = to_list(keys)
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    aggs = []
    for c in merged.columns:
        if c in keys_l:
            continue
        if c.endswith(("_n", "_sum", "_sumsq")):
            aggs.append(F.sum(c).alias(c))
        elif c.endswith("_min"):
            aggs.append(F.min(c).alias(c))
        elif c.endswith("_max"):
            aggs.append(F.max(c).alias(c))
        else:
            raise ValueError(f"{c!r} is not an agg_state column")
    return merged.groupBy(*keys_l).agg(*aggs)


def finalize_agg_state(
    state: DataFrame,
    keys: str | Sequence[str],
    ddof: int = 1,
) -> DataFrame:
    """Turn a (merged) state into the user-facing aggregates: per
    value column ``{c}_n / {c}_mean / {c}_std / {c}_min / {c}_max``.
    Pure column expressions over state rows — no scan of the data.
    ``std`` uses the textbook sufficient-statistics form
    ``sqrt((sumsq - sum^2/n) / (n - ddof))``; null when ``n <=
    ddof``."""
    keys_l = to_list(keys)
    base_cols = sorted(
        {c[: -len("_sum")] for c in state.columns if c.endswith("_sum")
         and not c.endswith("_sumsq")}
    )
    out_cols = list(keys_l)
    for c in base_cols:
        n = F.col(f"{c}_n")
        s = F.col(f"{c}_sum")
        ss = F.col(f"{c}_sumsq")
        var = (ss - s * s / n) / (n - ddof)
        out_cols += [
            n.alias(f"{c}_n"),
            (s / n).alias(f"{c}_mean"),
            F.when(n > ddof, F.sqrt(F.greatest(var, F.lit(0.0)))).alias(f"{c}_std"),
            F.col(f"{c}_min").alias(f"{c}_min"),
            F.col(f"{c}_max").alias(f"{c}_max"),
        ]
    return state.select(*out_cols)
