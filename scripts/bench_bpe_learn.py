"""learn_bpe at DEPTH: the r9 verdict's iteration-floor measurement
("learn cost was never measured at depth — the rung's corpus
exhausted at 106 real merges") plus the r10 batched-round fix.

The sf corpora cannot go deep (31 distinct words / 138 vocabulary
chars => ~170 learnable merges), so the corpus here is a
DETERMINISTIC remap of sf0.1 documents: every word occurrence
becomes md5(word || position%50)[:8] — 1,549 distinct 8-hex-char
words / 12,392 vocabulary chars, inheriting the source's frequency
skew, >= 1024 learnable merges. No randomness; both engines and any
rerun derive the identical corpus.

Measures learn wall-time and aggregation-round count at n_merges in
{256, 1024} for batch_merges in {1 (sequential r9 shape), 16} and
asserts the merge tables are IDENTICAL (the batched path's
equivalence guard is exact — see learn_bpe's docstring; the
cross-engine certificate is the bpe_learn_batched oracle row).
Uniform hex text is tie-heavy, so the strict frequency-cut guard
accepts ~2.2 merges/round here (pure-python simulation: 1024
sequential rounds -> 463 batched); natural text ties less and
accepts more — this rung is the conservative floor. Prints ONE JSON
line. Usage: python scripts/bench_bpe_learn.py [out.json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pd_utils_spark.extensions import bpe
from pd_utils_spark.session import get_spark

SF = "/root/testdata/sf0.1"
DOCS = 20_000
VARIANTS = 50


def hex_corpus(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("text")
        .limit(DOCS)
    )
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " ")
    )
    w = docs.select(
        F.posexplode(F.split(norm, " ")).alias("i", "w")
    ).filter(F.length("w") > 0)
    return w.select(
        F.substring(
            F.md5(
                F.concat(
                    F.col("w"), (F.col("i") % VARIANTS).cast("string")
                )
            ),
            1,
            8,
        ).alias("text")
    ).localCheckpoint(eager=True)


def main() -> None:
    spark = get_spark("bench-bpe-learn")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = hex_corpus(spark)

    rounds = {"n": 0}
    orig = bpe._pair_counts

    def counting(wrapped):
        rounds["n"] += 1
        return orig(wrapped)

    bpe._pair_counts = counting
    out: dict = {
        "metric": "bpe_learn_depth",
        "protocol": (
            f"deterministic md5-remap corpus from {DOCS} sf0.1 documents "
            f"(word||pos%{VARIANTS} -> 8 hex chars; 1549 distinct words), "
            "single timed run per cell (a learn IS hundreds of jobs — "
            "per-job noise self-averages); batched vs sequential merge "
            "tables asserted identical in-process"
        ),
        "cells": {},
    }
    try:
        merge_tables: dict = {}
        for n in (256, 1024):
            for m in (1, 16):
                rounds["n"] = 0
                t0 = time.perf_counter()
                got = [
                    tuple(r)
                    for r in bpe.learn_bpe(
                        corpus, n_merges=n, batch_merges=m
                    ).collect()
                ]
                dt = round(time.perf_counter() - t0, 1)
                out["cells"][f"n{n}_batch{m}"] = {
                    "sec": dt,
                    "rounds": rounds["n"],
                    "merges": len(got),
                    "merges_per_sec": round(len(got) / dt, 2),
                }
                merge_tables[(n, m)] = got
                print(
                    f"# n={n} batch={m}: {dt}s, {rounds['n']} rounds,"
                    f" {len(got)} merges",
                    file=sys.stderr,
                    flush=True,
                )
            assert merge_tables[(n, 1)] == merge_tables[(n, 16)], n
        out["batched_identical_to_sequential"] = True
        out["speedup"] = {
            f"n{n}": round(
                out["cells"][f"n{n}_batch1"]["sec"]
                / out["cells"][f"n{n}_batch16"]["sec"],
                2,
            )
            for n in (256, 1024)
        }
    finally:
        bpe._pair_counts = orig
    path = (
        sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALING_BPE_LEARN_r10.json"
    )
    line = json.dumps(out)
    with open(path, "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
