"""Declarative data-quality checks — a deequ-style validation suite.

A 100 TB ingest without machine-checkable expectations fails silently:
the null fraction creeps up, a join key stops being unique, an enum
picks up a new raw value, and the bad batch is live before anyone
looks. ``run_checks`` turns a list of declared rules into ONE result
frame of (check, column, violations, total, passed) rows.

Cost model, by rule type:

- ``not_null`` / ``range`` / ``in_set`` / ``regex`` / ``custom``:
  row-local predicates — ALL of them fold into a single conditional
  aggregation over one scan, however many there are.
- ``unique``: one partial-agg shuffle on the checked columns.
- ``ref`` (referential integrity): one join against the (broadcast if
  small) reference keys.

Results are data, not exceptions: gate the pipeline with
``assert_checks`` where a violation should stop the run, or land the
frame next to the dataset as an audit artifact.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pd_utils_spark.utils import to_list

_RESULT_COLS = ["check", "check_type", "column", "violations", "total", "passed"]


def _row_violation(df: DataFrame, rule: Mapping) -> Column:
    """Boolean column that is True where the row VIOLATES the rule."""
    kind = rule["type"]
    col = F.col(rule["column"]) if "column" in rule else None
    if kind == "not_null":
        return col.isNull()
    if kind == "range":
        ok = F.lit(True)
        if "min" in rule:
            ok = ok & (col >= F.lit(rule["min"]))
        if "max" in rule:
            ok = ok & (col <= F.lit(rule["max"]))
        # null is a range violation only if not_null says so — skip it
        return col.isNotNull() & ~ok
    if kind == "in_set":
        return col.isNotNull() & ~col.isin(list(rule["values"]))
    if kind == "regex":
        return col.isNotNull() & ~col.rlike(rule["pattern"])
    if kind == "custom":
        # rule['predicate'] is a SQL boolean expression that must HOLD
        return ~F.expr(rule["predicate"])
    raise ValueError(f"unknown row-local check type {kind!r}")


def run_checks(df: DataFrame, rules: Sequence[Mapping]) -> DataFrame:
    """Evaluate declared quality rules against ``df`` and return one
    row per rule: ``(check, check_type, column, violations, total,
    passed)``.

    Each rule is a dict with ``type`` and a ``name`` (optional —
    defaults to ``<type>:<column>``):

    - ``{"type": "not_null", "column": c}`` — no nulls in c.
    - ``{"type": "range", "column": c, "min": x, "max": y}`` — non-null
      values within bounds (either bound optional).
    - ``{"type": "in_set", "column": c, "values": [...]}`` — non-null
      values drawn from the enum.
    - ``{"type": "regex", "column": c, "pattern": p}`` — non-null
      values match p.
    - ``{"type": "custom", "predicate": sql, "column"?: c}`` — the SQL
      boolean expression holds on every row.
    - ``{"type": "unique", "columns": [c, ...]}`` — no key appears
      twice; ``violations`` counts the rows involved in duplicates.
    - ``{"type": "ref", "column": c, "ref": DataFrame, "ref_column":
      rc}`` — every non-null value of c exists in the reference's rc
      (foreign-key check); ``violations`` counts orphan rows.

    All row-local rules share one aggregation pass; each unique rule
    adds one shuffle; each ref rule one join.
    """
    rules = list(rules)
    row_local = [r for r in rules if r["type"] not in ("unique", "ref")]
    others = [r for r in rules if r["type"] in ("unique", "ref")]

    spark = df.sparkSession
    results: list[DataFrame] = []

    if row_local or others:
        aggs = [F.count(F.lit(1)).alias("__total__")]
        for i, r in enumerate(row_local):
            aggs.append(
                F.sum(F.when(_row_violation(df, r), 1).otherwise(0)).alias(f"__v{i}__")
            )
        totals = df.agg(*aggs)
        rows = []
        for i, r in enumerate(row_local):
            rows.append(
                F.struct(
                    F.lit(_name(r)).alias("check"),
                    F.lit(r["type"]).alias("check_type"),
                    F.lit(r.get("column", "")).alias("column"),
                    F.col(f"__v{i}__").cast("bigint").alias("violations"),
                    F.col("__total__").cast("bigint").alias("total"),
                    (F.col(f"__v{i}__") == 0).alias("passed"),
                )
            )
        if rows:
            results.append(
                totals.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
            )
        else:
            # still need total for unique/ref result rows
            results = []
        total_df = totals.select(F.col("__total__").alias("__total__"))

    for r in others:
        if r["type"] == "unique":
            cols = to_list(r.get("columns", r.get("column")))
            dup_rows = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("__n__"))
                .filter(F.col("__n__") > 1)
                .agg(F.coalesce(F.sum("__n__"), F.lit(0)).alias("__v__"))
            )
            res = dup_rows.crossJoin(F.broadcast(total_df)).select(
                F.lit(_name(r)).alias("check"),
                F.lit("unique").alias("check_type"),
                F.lit(",".join(cols)).alias("column"),
                F.col("__v__").cast("bigint").alias("violations"),
                F.col("__total__").cast("bigint").alias("total"),
                (F.col("__v__") == 0).alias("passed"),
            )
        else:  # ref
            col, ref, ref_col = r["column"], r["ref"], r["ref_column"]
            keys = ref.select(F.col(ref_col).alias(col)).distinct()
            orphans = (
                df.filter(F.col(col).isNotNull())
                .join(F.broadcast(keys), col, "left_anti")
                .agg(F.count(F.lit(1)).alias("__v__"))
            )
            res = orphans.crossJoin(F.broadcast(total_df)).select(
                F.lit(_name(r)).alias("check"),
                F.lit("ref").alias("check_type"),
                F.lit(col).alias("column"),
                F.col("__v__").cast("bigint").alias("violations"),
                F.col("__total__").cast("bigint").alias("total"),
                (F.col("__v__") == 0).alias("passed"),
            )
        results.append(res)

    if not results:
        return spark.createDataFrame(
            [],
            "check string, check_type string, column string, "
            "violations bigint, total bigint, passed boolean",
        )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def _name(rule: Mapping) -> str:
    if "name" in rule:
        return rule["name"]
    col = rule.get("column") or ",".join(to_list(rule.get("columns", [])))
    return f"{rule['type']}:{col}" if col else rule["type"]


def assert_checks(df: DataFrame, rules: Sequence[Mapping]) -> DataFrame:
    """Run the checks and raise ``ValueError`` listing every failed
    rule (name + violation count) if any rule fails; returns the
    result frame when all pass. The pipeline-gate form of
    :func:`run_checks`."""
    res = run_checks(df, rules)
    failed = [(r["check"], r["violations"]) for r in res.collect() if not r["passed"]]
    if failed:
        detail = ", ".join(f"{n} ({v} violations)" for n, v in failed)
        raise ValueError(f"data-quality checks failed: {detail}")
    return res


def referential_report(
    child: DataFrame,
    parent: DataFrame,
    keys: str | Sequence[str],
    parent_keys: str | Sequence[str] | None = None,
) -> DataFrame:
    """Foreign-key health report between a fact/child frame and a
    dimension/parent frame — the join-quality audit the ``ref`` rule
    in :func:`run_checks` summarizes to one violation count, expanded
    to the numbers a pipeline owner actually triages:

    ``(n_child, n_child_null_key, n_orphan_rows, orphan_frac,
    n_child_keys, n_orphan_keys, n_parent, n_parent_keys,
    n_parent_dup_keys, n_unreferenced_parent_keys)``

    Orphans are child rows whose (fully non-null) key has no parent
    row — they silently vanish from every inner join downstream.
    Null-key child rows are counted separately (SQL join semantics
    never match them). Duplicate parent keys turn joins into row
    multipliers; unreferenced parent keys measure dimension bloat.

    Scale shape: two anti-join counts on the DISTINCT key frames
    (shuffle volume is O(distinct keys), with AQE free to broadcast
    the smaller side) plus one conditional aggregate per input —
    never a full child x parent join, nothing collected.
    """
    from pd_utils_spark.utils import to_list

    ck = to_list(keys)
    pk = to_list(parent_keys) if parent_keys is not None else ck
    if len(ck) != len(pk):
        raise ValueError(f"key arity mismatch: {ck} vs {pk}")
    nonnull = None
    for c in ck:
        cond = F.col(c).isNotNull()
        nonnull = cond if nonnull is None else (nonnull & cond)
    child_tot = child.groupBy().agg(
        F.count(F.lit(1)).alias("n_child"),
        F.sum((~nonnull).cast("long")).alias("n_child_null_key"),
    )
    ckeys = (
        child.filter(nonnull)
        .groupBy(*ck)
        .agg(F.count(F.lit(1)).alias("__n__"))
    )
    pkeys = parent.groupBy(
        *[F.col(p).alias(c) for p, c in zip(pk, ck)]
    ).agg(F.count(F.lit(1)).alias("__pn__"))
    orphans = ckeys.join(pkeys.select(*ck), ck, "left_anti")
    orphan_agg = orphans.groupBy().agg(
        F.coalesce(F.sum("__n__"), F.lit(0).cast("long")).alias(
            "n_orphan_rows"
        ),
        F.count(F.lit(1)).alias("n_orphan_keys"),
    )
    ckey_tot = ckeys.groupBy().agg(
        F.count(F.lit(1)).alias("n_child_keys")
    )
    parent_agg = pkeys.groupBy().agg(
        F.coalesce(F.sum("__pn__"), F.lit(0).cast("long")).alias("n_parent"),
        F.count(F.lit(1)).alias("n_parent_keys"),
        F.sum((F.col("__pn__") > 1).cast("long")).alias(
            "n_parent_dup_keys"
        ),
    )
    unref = pkeys.join(ckeys.select(*ck), ck, "left_anti").groupBy().agg(
        F.count(F.lit(1)).alias("n_unreferenced_parent_keys")
    )
    return (
        child_tot.crossJoin(F.broadcast(ckey_tot))
        .crossJoin(F.broadcast(orphan_agg))
        .crossJoin(F.broadcast(parent_agg))
        .crossJoin(F.broadcast(unref))
        .select(
            "n_child",
            "n_child_null_key",
            "n_orphan_rows",
            F.when(
                (F.col("n_child") - F.col("n_child_null_key")) > 0,
                F.col("n_orphan_rows").cast("double")
                / (F.col("n_child") - F.col("n_child_null_key")).cast(
                    "double"
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("orphan_frac"),
            "n_child_keys",
            "n_orphan_keys",
            "n_parent",
            "n_parent_keys",
            "n_parent_dup_keys",
            "n_unreferenced_parent_keys",
        )
    )
