"""The BIGGER rung of the scaling ladder (r6 verdict #7): the r6
sf0.01 -> sf0.1 ladder showed no super-linear query, but at those
sizes many data-bound queries are fixed-cost-dominated, understating
their asymptotic slopes. This script synthesizes a ~10x sf0.1 corpus
for the DATA-BOUND tier (key-remapped union — ten id-shifted copies,
so group COUNT scales 10x like a real SF bump, group sizes stay) and
re-measures those queries with the frozen warm-median protocol, so
the <= linear claim is load-bearing where fixed cost no longer
dominates.

Only the tables the tier reads are materialized (lineitem for the
numeric scans/windows, documents for the text scans); build is
idempotent (skipped when the scaled dir already has the table).

Usage:
    python scripts/bench_scaling_big.py [--reps=N] [--out=F]
        [--scaled-dir=D] [--copies=K]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from pd_utils_spark.session import get_spark

# the tier the r6 ladder flagged as data-bound (steepest slopes,
# dominated by one-shuffle scans over lineitem/documents)
DATA_BOUND = [
    "flag_outliers_iqr",
    "winsorize",
    "groupby_transform_cumsum",
    "long_to_wide_ordinal",
    "tf_idf",
    "language_id",
]

# table -> id columns shifted per copy (keeps join/group semantics:
# copy i's keys live in their own id range, like a real SF increase)
REMAP = {
    "lineitem": ["l_orderkey"],
    "documents": ["doc_id"],
}


def build_scaled(spark, src_dir: str, dst_dir: str, copies: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dst_dir, exist_ok=True)
    for table, keys in REMAP.items():
        out = f"{dst_dir}/{table}.parquet"
        if os.path.exists(out):
            continue
        df = spark.read.parquet(f"{src_dir}/{table}.parquet")
        # shift span: far above any real key at sf0.1
        span = 10_000_000
        parts = []
        for i in range(copies):
            c = df
            for kcol in keys:
                c = c.withColumn(kcol, F.col(kcol) + F.lit(i * span))
            parts.append(c)
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionByName(p)
        scaled.write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        print(f"# built {out}: {n} rows", file=sys.stderr, flush=True)


def bench(spark, names, sf_dir: str, reps: int) -> dict:
    qs = entry.queries()
    out = {}
    for name in names:
        fn = qs[name]

        def run() -> float:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            return dt

        run()  # discarded cold rep
        times = [round(run(), 3) for _ in range(reps)]
        out[name] = round(statistics.median(times), 3)
        print(f"# {sf_dir} {name}: median={out[name]} reps={times}",
              file=sys.stderr, flush=True)
    return out


def main() -> None:
    reps = 3
    out_path = None
    scaled_dir = "/root/repo/.scaled10x"
    copies = 10
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        if a.startswith("--scaled-dir="):
            scaled_dir = a.split("=", 1)[1]
        if a.startswith("--copies="):
            copies = int(a.split("=", 1)[1])
    spark = get_spark("bench-scaling-big")
    spark.sparkContext.setLogLevel("ERROR")
    src = "/root/testdata/sf0.1"
    build_scaled(spark, src, scaled_dir, copies)

    base = bench(spark, DATA_BOUND, src, reps)
    big = bench(spark, DATA_BOUND, scaled_dir, reps)
    slopes = {
        n: round(big[n] / base[n], 2) if base[n] > 0 else None
        for n in DATA_BOUND
    }
    doc = {
        "metric": "scaling_big_rung",
        "protocol": f"warm medians of {reps} (1 discarded cold), "
        f"{copies}x key-remapped sf0.1",
        "sf0_1": base,
        "sf0_1_x10": big,
        "slope_at_10x_data": slopes,
        "queries_super_linear": [n for n, s in slopes.items() if s and s > 10],
    }
    line = json.dumps(doc)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
