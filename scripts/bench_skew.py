"""Skewed-input bench: measure whether the explicit skew tools
(`plans/skew.py`) actually beat the naive plans on a pathologically
hot key — the motivation the plan-lock tests assert but never time.

Dataset (generated in-memory, deterministic): a Zipf-ish fact table
where ONE key owns `hot_share` of all rows (the cardinality-1 skew
that breaks reducers), joined/aggregated against a uniform dim.

Lanes:
  agg_naive        groupBy(key).agg(sum/count/avg)       (AQE on)
  agg_salted       salted_groupby_agg, salt=16
  join_broadcast   fact JOIN dim, Spark's own choice (it broadcasts —
                   the first-resort answer that makes skew moot)
  join_aqe_skew    same join, broadcast disabled, AQE skew-join ON —
                   the runtime skew-split lane
  join_noskew      broadcast disabled, AQE skew-join OFF (the naive
                   sort-merge straggler a non-AQE engine would run)
  join_salted      salted_join(fact, dim, salt=8), broadcast + AQE
                   skew-join OFF — the explicit fallback

Usage: python scripts/bench_skew.py [n_rows] [hot_share]
Prints one JSON line; human table on stderr.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pd_utils_spark.plans.skew import hot_key_join, salted_groupby_agg, salted_join
from pd_utils_spark.session import get_spark


def build(spark, n_rows: int, hot_share: float, n_keys: int = 10_000):
    """Skewed fact: first `hot_share` of rows all carry key 0; the
    rest spread uniformly. Deterministic (md5 of the row id)."""
    base = spark.range(n_rows)
    frac = (
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(16**8))
    )
    key = F.when(frac < hot_share, F.lit(0)).otherwise(
        (F.col("id") % (n_keys - 1)) + 1
    )
    fact = base.select(
        F.col("id"),
        key.alias("key"),
        (F.col("id") % 1000).cast("double").alias("value"),
    )
    # dim sizing: LARGER than the broadcast threshold (400k keys with
    # a 128-char pad, ~60 MB estimated — a broadcastable dim never
    # skews) but small enough that salt-replication is cheap — exactly
    # the "too big to broadcast, small enough to replicate" regime
    # salted_join documents as its target.
    dim = spark.range(400_000).select(
        F.col("id").alias("key"),
        (F.col("id") * 2).alias("payload"),
        F.repeat(F.md5(F.col("id").cast("string")), 4).alias("pad"),
    )
    return fact, dim


def timed(label, thunk, results):
    t0 = time.time()
    n = thunk()
    dt = round(time.time() - t0, 3)
    results[label] = dt
    print(f"{label:<14} {dt:>8.3f} s   (rows={n})", file=sys.stderr)


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    spark = get_spark()
    fact, dim = build(spark, n_rows, hot_share)
    fact = fact.localCheckpoint(eager=True)  # isolate op cost from gen cost
    dim = dim.localCheckpoint(eager=True)

    results: dict[str, float] = {}

    def set_skew(flag: bool):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(flag).lower())

    # JVM/codegen warm-up so the first timed lane isn't penalized
    fact.groupBy("key").count().count()
    fact.join(dim, "key").count()

    timed(
        "agg_naive",
        lambda: fact.groupBy("key")
        .agg(F.sum("value"), F.count("*"), F.avg("value"))
        .count(),
        results,
    )
    timed(
        "agg_salted",
        lambda: salted_groupby_agg(
            fact, "key", {"value": "sum", "id": "count"}, salt=16
        ).count(),
        results,
    )
    # join lanes: the select forces both sides' payload through
    def set_bcast(threshold: str):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)

    timed(
        "join_broadcast",
        lambda: fact.join(dim, "key").select("id", "payload", "value").count(),
        results,
    )
    set_bcast("-1")
    try:
        timed(
            "join_aqe_skew",
            lambda: fact.join(dim, "key").select("id", "payload", "value").count(),
            results,
        )
        set_skew(False)
        timed(
            "join_noskew",
            lambda: fact.join(dim, "key").select("id", "payload", "value").count(),
            results,
        )
        timed(
            "join_salted",
            lambda: salted_join(fact, dim, "key", salt=8)
            .select("id", "payload", "value")
            .count(),
            results,
        )
        timed(
            "join_hotkey",
            lambda: hot_key_join(fact, dim, "key", hot_threshold=1_000_000)
            .select("id", "payload", "value")
            .count(),
            results,
        )
    finally:
        set_skew(True)
        set_bcast("10485760")

    print(
        json.dumps(
            {
                "metric": "skew_bench",
                "n_rows": n_rows,
                "hot_share": hot_share,
                "times_sec": results,
            }
        )
    )


if __name__ == "__main__":
    main()
