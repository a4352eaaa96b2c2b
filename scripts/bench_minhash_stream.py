"""Per-batch cost evidence for the MinHash ingest gate's artifact/
probe split — the minhash sibling of bench_containment_stream.py
(the r9 verdict asked for the same measurement the containment gate
got: probe vs recompute shape, history slope, batch slope).

2x2: history size H in {1x, 10x sf0.1 documents} x path in
{recompute (r8 shape: dedup_minhash_against builds the history
artifacts inline EVERY call — shingle/minhash/band over the full
history) x index (r9/r10 shape: dedup_minhash_against_index probes
parquet artifacts prebuilt once by minhash_history_frames)} — plus
batch-size proportionality on the index path (B and 10B at fixed
10x history). History token-salted into disjoint content universes;
the probe batch carries its own marker so it is novel against every
history copy. Artifact-build time reported separately (the
write-once cost the recompute shape pays every batch).

Warm medians of 3 after one discarded cold run. Prints ONE JSON
line. Usage: python scripts/bench_minhash_stream.py [out.json]
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pd_utils_spark.extensions.dedup import (
    dedup_minhash_against,
    dedup_minhash_against_index,
    minhash_history_frames,
)
from pd_utils_spark.session import get_spark
from pd_utils_spark.utils import release_registered

SF = "/root/testdata/sf0.1"
COPIES = 10
BATCH_ROWS = 500
KW = dict(k=3, num_hashes=12, bands=4, threshold=0.8)


def salted_copies(df, n, marker):
    span = 10_000_000
    parts = []
    for i in range(n):
        c = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * span))
        if marker or i > 0:
            c = c.withColumn(
                "text",
                F.regexp_replace(F.col("text"), r"(\S+)", rf"$1{marker}q{i}"),
            )
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn, reps=3):
    fn()  # discarded cold
    return round(statistics.median([_one(fn) for _ in range(reps)]), 3)


def _one(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("bench-minhash-stream")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    base = tempfile.mkdtemp(prefix="pus_mbench_")
    out: dict = {
        "metric": "minhash_gate_per_batch",
        "protocol": (
            "warm medians of 3 (1 discarded cold); history token-salted "
            f"{COPIES}x sf0.1 documents; probe batch {BATCH_ROWS} novel "
            "docs; recompute = dedup_minhash_against (history artifacts "
            "rebuilt inline per call), index = dedup_minhash_against_"
            "index over prebuilt parquet artifacts (build cost separate)"
        ),
    }
    try:
        hist1 = docs
        hist10 = salted_copies(docs, COPIES, "")
        batch = (
            docs.limit(BATCH_ROWS)
            .withColumn(
                "text", F.regexp_replace(F.col("text"), r"(\S+)", r"$1zz")
            )
            .withColumn("doc_id", F.col("doc_id") + F.lit(900_000_000))
            .localCheckpoint(eager=True)
        )
        batch10 = (
            salted_copies(docs.limit(BATCH_ROWS), COPIES, "zz")
            .withColumn("doc_id", F.col("doc_id") + F.lit(900_000_000))
            .localCheckpoint(eager=True)
        )

        arts = {}
        build_sec = {}
        for label, hist in (("h1", hist1), ("h10", hist10)):
            d = f"{base}/{label}"
            t0 = time.perf_counter()
            frames = minhash_history_frames(
                hist, k=KW["k"], num_hashes=KW["num_hashes"],
                bands=KW["bands"],
            )
            for name in ("keys", "shingles"):
                frames[name].write.mode("overwrite").parquet(f"{d}/{name}")
            release_registered("minhash_history_frames")
            build_sec[label] = round(time.perf_counter() - t0, 3)
            arts[label] = {
                name: spark.read.parquet(f"{d}/{name}")
                for name in ("keys", "shingles")
            }
        out["artifact_build_sec"] = build_sec

        def recompute(hist):
            def run():
                dedup_minhash_against(
                    batch, hist, **KW
                ).write.format("noop").mode("overwrite").save()
                release_registered("minhash_history_frames")
                release_registered("dedup_minhash_against_index")
                spark.catalog.clearCache()
            return run

        def probe(label, b):
            a = arts[label]

            def run():
                dedup_minhash_against_index(
                    b, a["keys"], a["shingles"], **KW
                ).write.format("noop").mode("overwrite").save()
                release_registered("dedup_minhash_against_index")
                spark.catalog.clearCache()
            return run

        out["per_batch_sec"] = {
            "recompute_h1": timed(recompute(hist1)),
            "recompute_h10": timed(recompute(hist10)),
            "index_h1": timed(probe("h1", batch)),
            "index_h10": timed(probe("h10", batch)),
            "index_h10_batch10x": timed(probe("h10", batch10)),
        }
        p = out["per_batch_sec"]
        out["history_slope_10x"] = {
            "recompute": round(p["recompute_h10"] / p["recompute_h1"], 2),
            "index": round(p["index_h10"] / p["index_h1"], 2),
        }
        out["batch_slope_10x_at_h10"] = round(
            p["index_h10_batch10x"] / p["index_h10"], 2
        )
        out["index_vs_recompute_at_h10"] = round(
            p["index_h10"] / p["recompute_h10"], 2
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_MINHASH_STREAM_r10.json"
    line = json.dumps(out)
    with open(path, "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
