"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what a cluster deployment would set per
executor: AQE on (runtime skew-join + partition coalescing), shuffle
partitions sized to cores (not the 200 default), Arrow enabled for the
two sanctioned pandas-UDF entry points, UTC session timezone so results
hash-match the DuckDB oracle (DuckDB timestamps are UTC-naive).

At 100 TB these same knobs hold: AQE handles skew and coalescing,
``spark.sql.shuffle.partitions`` becomes a cluster-size-derived setting,
and everything else in this package is declarative DataFrame API that
Catalyst plans per-cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "pd_utils_spark", cpus: str | int | None = None) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults.

    Any already-active session is reused as-is (important: the driver
    passes us its own session; never fight it).
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    n = str(cpus or DEFAULT_CPUS)
    return (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", n)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE partition-coalescing knobs, env-parameterised for cluster
        # tuning. parallelismFirst stays at Spark's default (true): an
        # A/B over a representative query mix (r11) showed byte-derived
        # coalescing (false + 64m advisory) serializes the CPU-heavy
        # small-byte text/simhash aggregations onto one core (measured
        # 16 s -> 46 s on candidate_recall_simhash) — per-row compute,
        # not bytes, bounds those stages. On a cluster with genuinely
        # byte-bound shuffles set SPARK_GRAFT_PARALLELISM_FIRST=false.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_PARALLELISM_FIRST", "true"),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "64m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
