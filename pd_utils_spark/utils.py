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


def materialize(df: DataFrame, eager: bool = False) -> DataFrame:
    """Compute-once materialization of ``df`` for multiply-referenced
    subtrees (e.g. both sides of a self-join, where ReuseExchange
    cannot dedupe the separate subtrees and the upstream pipeline
    would otherwise execute once PER reference).

    Fault-tolerance-aware choice of mechanism:

    - If the SparkContext has a **reliable checkpoint dir** configured
      (``sparkContext.setCheckpointDir``), uses ``persist`` THEN
      ``df.checkpoint()`` — data lands on the (replicated) checkpoint
      store, so an executor loss mid-job does not lose the materialized
      blocks. This is the right mode for 100 TB runs with dynamic
      allocation. The persist matters: a lazy checkpoint alone writes
      its data only after the first job completes (recomputing the
      subtree to do so), so the first action — typically the self-join
      this call guards — would still execute the subtree once per join
      side plus once for the checkpoint write. With the persist
      underneath, the first action computes the subtree exactly once;
      the checkpoint write then reads cached blocks.
    - Otherwise ``persist(MEMORY_AND_DISK)`` — lazily cached, computed
      once at first action and shared by every reference; on executor
      loss the lost blocks are *recomputed from lineage* (slower, but
      never job-fatal, unlike ``localCheckpoint`` whose truncated
      lineage makes lost blocks unrecoverable).

    ``eager=False`` (default) keeps plan construction free — building
    the DataFrame (or calling ``.explain``) runs no job; the first
    action pays the materialization. Set ``eager=True`` only when a
    driver-side loop needs the result pinned before iterating.
    """
    from pyspark import StorageLevel

    sc = df.sparkSession.sparkContext
    try:
        has_ckpt_dir = sc.getCheckpointDir() is not None
    except Exception:
        has_ckpt_dir = False
    if has_ckpt_dir:
        # persist first so the first action computes the subtree once
        # (see docstring); the checkpoint write then reads the cache.
        df.persist(StorageLevel.MEMORY_AND_DISK)
        out = df.checkpoint(eager=eager)
        if eager:
            # the checkpoint files now supersede the cache; drop it so
            # repeated materialize() calls don't pin redundant copies
            # for the rest of the session
            df.unpersist()
        # lazy: the cache must survive until the caller's first action
        # materializes the checkpoint; callers doing many lazy
        # checkpoints should unpersist the source afterwards (or
        # spark.catalog.clearCache()) to reclaim the superseded blocks
        return out
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    if eager:
        out.count()
    return out


#: Module-level registry of operator-persisted intermediates, keyed by
#: operator label. The ``_pus_persisted`` attribute on a result frame
#: does NOT survive downstream transformations (``select``/``filter``/
#: ``cache`` return new DataFrames without it), so operators ALSO
#: register here — ``release_registered()`` works no matter what the
#: caller did to the result frame in between.
_PERSIST_REGISTRY: dict[str, list[DataFrame]] = {}


def register_persisted(label: str, frames: list[DataFrame]) -> None:
    """Record ``frames`` (already persisted by an operator) under
    ``label`` so :func:`release_registered` can unpersist them later
    even if the caller no longer holds the operator's exact result
    frame. Repeated calls with the same label APPEND (an operator run
    twice in a session has two generations of intermediates alive
    until released)."""
    _PERSIST_REGISTRY.setdefault(label, []).extend(frames)


def release_registered(label: str | None = None, blocking: bool = False) -> int:
    """Unpersist every operator-registered intermediate under
    ``label`` (or ALL labels when ``None``) and drop them from the
    registry. Returns the number of frames released. This is the
    derived-frame-safe counterpart of :func:`release_cached`: it works
    regardless of what transformations the caller applied to the
    operator's result."""
    labels = [label] if label is not None else list(_PERSIST_REGISTRY)
    n = 0
    for key in labels:
        for f in _PERSIST_REGISTRY.pop(key, []):
            f.unpersist(blocking)
            n += 1
    return n


def release_cached(df: DataFrame, blocking: bool = False) -> int:
    """Unpersist every frame an operator registered on ``df`` via the
    ``_pus_persisted`` handle (operators that persist intermediate
    frames for multi-consumer reuse — e.g.
    :func:`~pd_utils_spark.extensions.dedup.jaccard_join_prefix` —
    attach the persisted frames to their RESULT so callers can release
    them after the first action without nuking the whole session cache
    with ``spark.catalog.clearCache()``). Returns the number of frames
    released; a frame with no handle is a no-op (0).

    .. warning:: The handle lives on the EXACT frame the operator
       returned — any downstream transformation (``select``,
       ``filter``, even ``cache``) returns a new DataFrame without it,
       making this call a silent no-op (returns 0). If you transformed
       the result before releasing, use :func:`release_registered`
       with the operator's label instead (operators register their
       persists in a module-level registry as well)."""
    frames = getattr(df, "_pus_persisted", None) or []
    for f in frames:
        f.unpersist(blocking)
    if frames:
        df._pus_persisted = []
        # the registry holds the same frames; drop them there too so a
        # later release_registered() doesn't double-unpersist (harmless
        # but miscounts)
        released = {id(f) for f in frames}
        for key, reg in list(_PERSIST_REGISTRY.items()):
            kept = [f for f in reg if id(f) not in released]
            if kept:
                _PERSIST_REGISTRY[key] = kept
            else:
                _PERSIST_REGISTRY.pop(key)
    return len(frames)


def observed_metrics(df: DataFrame) -> dict[str, dict]:
    """Observed metrics of ``df``'s LAST executed action, as
    ``{metric_name: {field: value}}`` — the reader side of
    ``DataFrame.observe(name, ...)`` (which the flood caps and plan
    barriers emit). Metrics exist only AFTER an action has run on this
    exact DataFrame; an un-executed frame returns ``{}``.

    CAVEAT (r8, measured): only actions that execute the frame's OWN
    QueryExecution populate it — ``df.collect()`` does;
    ``df.count()`` and ``df.write...`` build a NEW execution around
    the plan and leave this frame's metrics at their zero defaults.
    Read metrics after a ``collect()``, or use an ``Observation``
    object / QueryExecutionListener when the action must be a write.

    This is how callers audit what a ``max_bucket`` cap dropped
    without paying a separate count job: collect the result, then read
    ``observed_metrics(result)["lsh_bucket_cap_1"]["dropped_rows"]``.
    """
    out: dict[str, dict] = {}
    it = df._jdf.queryExecution().observedMetrics().iterator()
    while it.hasNext():
        entry = it.next()
        row = entry._2()
        schema = row.schema()
        fields = {
            schema.fields()[i].name(): row.get(i)
            for i in range(row.length())
        }
        out[entry._1()] = fields
    return out


_BARRIER_COUNT = [0]


def plan_barrier(df: DataFrame, name: str | None = None) -> DataFrame:
    """Optimizer barrier: force the columns of ``df`` to be computed in
    their own projection instead of being inlined into the consumer.

    Catalyst's CollapseProject folds adjacent projections, so an
    expensive array expression consumed by ``explode`` becomes the
    Generate operator's inline child — and Generate re-evaluates an
    inline collection far more expensively than it reads a bound
    attribute (measured 17.5 s vs 1.9 s on the winnowing fingerprint
    explode at sf0.01; same pathology SCALE.md documents for the
    shingle family). Inserting a ``CollectMetrics`` node (via
    ``DataFrame.observe`` with a trivial count) blocks the collapse at
    zero runtime cost: no shuffle, no caching, constant memory — unlike
    a ``persist``, nothing must be evicted later.

    Use between building an expensive array column and exploding it,
    when the array is consumed exactly once (use ``persist`` instead
    when several stages share the computed frame).
    """
    from pyspark.sql import functions as F

    _BARRIER_COUNT[0] += 1
    label = name or f"__plan_barrier_{_BARRIER_COUNT[0]}__"
    return df.observe(label, F.count(F.lit(1)))


def group_block_stream(byvars: list[str], block_fn):
    """Build a ``mapInPandas`` iterator function that re-chunks sorted
    Arrow batches into blocks of COMPLETE groups and yields
    ``block_fn(block)`` for each.

    The contract: the input DataFrame must already be
    ``repartition(*byvars).sortWithinPartitions(*byvars, *order)`` so
    every group is contiguous within its partition. Arrow batch
    boundaries land mid-group, so the trailing (possibly incomplete)
    group of each batch is carried forward and prepended to the next;
    ``block_fn`` therefore always sees whole groups, in order, and may
    rely on vectorized key-change detection to find boundaries.

    This is the scale-safe alternative to ``groupBy().applyInPandas``
    for high-cardinality keys: one shuffle, Python/Arrow overhead per
    BATCH instead of per GROUP (measured ~20x on ~150k tiny groups —
    see ``_groupby_transform``), while a group larger than a batch is
    still buffered and seen whole, exactly like the grouped form.
    """
    import numpy as np
    import pandas as pd

    def _key_eq(pdf: "pd.DataFrame", row: "pd.Series"):
        # null-safe vector equality of each row's byvars to a key row
        eq = np.ones(len(pdf), dtype=bool)
        for b in byvars:
            col = pdf[b]
            v = row[b]
            if pd.isna(v):
                eq &= col.isna().to_numpy()
            else:
                eq &= (col == v).fillna(False).to_numpy()
        return eq

    def process(batches):
        tail_parts: list[pd.DataFrame] = []  # trailing group, may span batches
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if tail_parts:
                prev_last = tail_parts[-1].iloc[-1]
                eq_head = _key_eq(pdf, prev_last)
                # contiguous head run continuing the previous group
                n_head = len(pdf) if eq_head.all() else int(eq_head.argmin())
                if n_head > 0:
                    tail_parts.append(pdf.iloc[:n_head])
                    pdf = pdf.iloc[n_head:]
                if len(pdf) == 0:
                    continue
                yield block_fn(pd.concat(tail_parts, ignore_index=True))
                tail_parts = []
            last = pdf.iloc[-1]
            eq_tail = _key_eq(pdf, last)
            # sorted input => rows equal to the last key form the tail run
            n_tail = int(eq_tail.sum())
            split = len(pdf) - n_tail
            if split > 0:
                yield block_fn(pdf.iloc[:split].copy())
            tail_parts = [pdf.iloc[split:]]
        if tail_parts:
            yield block_fn(pd.concat(tail_parts, ignore_index=True))

    return process


def group_boundaries(pdf, byvars: list[str]):
    """(starts, ends) positional group slices of a block already sorted
    by ``byvars`` — vectorized key-change detection, null-safe (two
    adjacent nulls in a key column do NOT start a new group)."""
    import numpy as np

    n = len(pdf)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for b in byvars:
        col = pdf[b]
        arr = col.to_numpy()
        na = col.isna().to_numpy()
        diff = arr[1:] != arr[:-1]
        both_na = na[1:] & na[:-1]
        change[1:] |= np.asarray(diff, dtype=bool) & ~both_na
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    return starts, ends
