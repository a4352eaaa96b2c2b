"""The round-10 receipt for the ingest gates' central 100 TB claim:
the per-batch probe joins the stored history artifacts WITHOUT a
history-side shuffle when the artifacts are persisted bucketed.

For both gates (containment, minhash), 2x2x2: history {1x, 10x
token-salted sf0.1 documents} x storage {plain parquet, bucketed
tables via plans.skew.write_bucketed — containment index by __tok__
+ sets by __hid__, minhash keys by (band, band_key) + shingles by
__hid__} x the full probe exactly as the streaming gates run it.
Per cell: warm median of 3 (1 discarded cold) + the probe plan's
Exchange count. The plan receipt is the point — bucketed must read
exactly TWO fewer Exchanges (both history scans bucket-aware,
plan-asserted in tests/test_plans_skew.py); at sf-scale the
wall-clock delta is fixed-cost dominated, while at 100 TB the two
missing Exchanges ARE the history-sized shuffle the docstrings
promise away. Bucket count = spark.sql.shuffle.partitions (Spark
co-partitions a join to the LARGER side's width, so a narrower
bucketed table would be re-shuffled right back).

Prints ONE JSON line. Usage:
    python scripts/bench_bucketed_probe.py [out.json]
"""

from __future__ import annotations

import contextlib
import io
import json
import re
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pd_utils_spark.extensions.dedup import (
    containment_index_frames,
    dedup_containment_against_index,
    dedup_minhash_against_index,
    minhash_history_frames,
)
from pd_utils_spark.plans import write_bucketed
from pd_utils_spark.session import get_spark
from pd_utils_spark.utils import release_registered

SF = "/root/testdata/sf0.1"
COPIES = 10
BATCH_ROWS = 500


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


def n_exchanges(frame) -> int:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        frame.explain("formatted")
    return len(re.findall(r"\(\d+\) Exchange", buf.getvalue()))


def main() -> None:
    spark = get_spark("bench-bucketed-probe")
    spark.sparkContext.setLogLevel("ERROR")
    nbuck = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    base = tempfile.mkdtemp(prefix="pus_bprobe_")
    out: dict = {
        "metric": "bucketed_probe_vs_plain",
        "buckets": nbuck,
        "protocol": (
            "warm medians of 3 (1 discarded cold); history token-salted "
            f"{COPIES}x sf0.1 documents at h10; probe batch {BATCH_ROWS} "
            "novel docs; plain = parquet artifacts, bucketed = "
            "write_bucketed tables (containment index/__tok__ + "
            "sets/__hid__; minhash keys/(band,band_key) + shingles/"
            "__hid__); exchange counts from the probe's formatted plan"
        ),
    }
    tables: list[str] = []
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

        arts: dict = {}
        for label, hist in (("h1", hist1), ("h10", hist10)):
            d = f"{base}/{label}"
            cf = containment_index_frames(hist, k=3)
            for name in ("index", "sets", "dfreq"):
                cf[name].write.mode("overwrite").parquet(f"{d}/c_{name}")
            release_registered("containment_index_frames")
            mf = minhash_history_frames(hist, k=3, num_hashes=12, bands=4)
            for name in ("keys", "shingles"):
                mf[name].write.mode("overwrite").parquet(f"{d}/m_{name}")
            release_registered("minhash_history_frames")
            plain = {
                n: spark.read.parquet(f"{d}/{p}")
                for n, p in (
                    ("index", "c_index"), ("sets", "c_sets"),
                    ("dfreq", "c_dfreq"), ("keys", "m_keys"),
                    ("shingles", "m_shingles"),
                )
            }
            bnames = {
                "index": (f"bp_cidx_{label}", "__tok__"),
                "sets": (f"bp_csets_{label}", "__hid__"),
                "keys": (f"bp_mkeys_{label}", ["band", "band_key"]),
                "shingles": (f"bp_msh_{label}", "__hid__"),
            }
            buck = {}
            for n, (tname, keys) in bnames.items():
                spark.sql(f"DROP TABLE IF EXISTS {tname}")
                write_bucketed(plain[n], tname, keys, nbuck)
                tables.append(tname)
                buck[n] = spark.table(tname)
            arts[label] = {"plain": plain, "bucketed": buck}

        def cont_probe(label, storage):
            a = arts[label][storage]

            def build():
                return dedup_containment_against_index(
                    batch, a["index"], a["sets"],
                    arts[label]["plain"]["dfreq"], threshold=0.9, k=3,
                )

            def run():
                build().write.format("noop").mode("overwrite").save()
                release_registered("dedup_containment_against_index")
                spark.catalog.clearCache()
            return build, run

        def mh_probe(label, storage):
            a = arts[label][storage]

            def build():
                return dedup_minhash_against_index(
                    batch, a["keys"], a["shingles"],
                    k=3, num_hashes=12, bands=4, threshold=0.8,
                )

            def run():
                build().write.format("noop").mode("overwrite").save()
                release_registered("dedup_minhash_against_index")
                spark.catalog.clearCache()
            return build, run

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            sec: dict = {}
            exch: dict = {}
            for gate, mk in (("containment", cont_probe), ("minhash", mh_probe)):
                for label in ("h1", "h10"):
                    for storage in ("plain", "bucketed"):
                        build, run = mk(label, storage)
                        exch[f"{gate}_{label}_{storage}"] = n_exchanges(build())
                        release_registered(
                            "dedup_containment_against_index"
                        )
                        release_registered("dedup_minhash_against_index")
                        sec[f"{gate}_{label}_{storage}"] = timed(run)
            out["per_batch_sec"] = sec
            out["probe_plan_exchanges"] = exch
            out["exchanges_removed_by_bucketing"] = {
                g: {
                    h: exch[f"{g}_{h}_plain"] - exch[f"{g}_{h}_bucketed"]
                    for h in ("h1", "h10")
                }
                for g in ("containment", "minhash")
            }
            out["bucketed_vs_plain_at_h10"] = {
                g: round(
                    sec[f"{g}_h10_bucketed"] / sec[f"{g}_h10_plain"], 2
                )
                for g in ("containment", "minhash")
            }
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        for t in tables:
            try:
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        shutil.rmtree(base, ignore_errors=True)
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_BUCKETED_PROBE_r10.json"
    line = json.dumps(out)
    with open(path, "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
