"""Profile one declared query: run it isolated with the Spark UI
enabled and dump per-job/per-stage wall+metrics from the UI REST API,
so optimization targets the stage that actually costs time (guide §1).

Usage:
    python scripts/profile_query.py <query> [--sf=DIR] [--reps=N]

Prints per-stage rows (submit-ordered): stage id, name (first 60
chars), duration ms, task count, shuffle read/write bytes, input
bytes — then a summary of total stage-time vs wall.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

from pyspark.sql import SparkSession


def get_spark_ui(cpus: str, extra: dict | None = None) -> SparkSession:
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    reps = 1
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    name = args[0]
    extra = {}
    for a in sys.argv[1:]:
        if a.startswith("--conf="):
            k, v = a.split("=", 2)[1:]
            extra[k] = v
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark_ui(cpus, extra)
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    qs = entry.queries()

    # warmup (absorbs codegen/python-worker spin-up), not profiled
    from pyspark.sql import functions as F
    _w = spark.range(10_000).selectExpr("id", "id % 7 AS k")
    _w.join(F.broadcast(_w.groupBy("k").count()), "k").write.format(
        "noop"
    ).mode("overwrite").save()
    _w.mapInPandas(lambda it: it, "id long, k long").write.format(
        "noop"
    ).mode("overwrite").save()

    def stages():
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            return json.loads(r.read())

    for rep in range(reps):
        pre = {s["stageId"] for s in stages()}
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        time.sleep(0.5)
        post = stages()
        new = sorted(
            (s for s in post if s["stageId"] not in pre),
            key=lambda s: s["stageId"],
        )
        total_ms = 0
        rows = []
        for s in new:
            try:
                sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
                comp = s.get("completionTime")
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                dur = (
                    datetime.strptime(comp, fmt)
                    - datetime.strptime(sub, fmt)
                ).total_seconds() * 1000
            except Exception:
                dur = -1
            total_ms += max(dur, 0)
            rows.append(
                (
                    s["stageId"],
                    int(dur),
                    s["numCompleteTasks"],
                    s.get("shuffleReadBytes", 0),
                    s.get("shuffleWriteBytes", 0),
                    s.get("inputBytes", 0),
                    (s.get("description") or s.get("name", ""))[:90],
                )
            )
        print(f"\n=== {name} rep {rep}: wall {wall:.2f}s, "
              f"{len(new)} stages, sum(stage wall) {total_ms/1000:.2f}s ===")
        print(f"{'id':>5} {'ms':>7} {'tsk':>4} {'shR':>9} {'shW':>9} {'in':>9}  name")
        for r in sorted(rows, key=lambda r: -r[1])[:40]:
            print(f"{r[0]:>5} {r[1]:>7} {r[2]:>4} {r[3]:>9} {r[4]:>9} {r[5]:>9}  {r[6]}")


if __name__ == "__main__":
    main()
