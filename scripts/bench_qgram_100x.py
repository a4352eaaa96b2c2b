"""Second decade for the q-gram blocker (r9 verdict #6), with the
measured limit of the registered row disclosed.

The registered `linkage_pairs_qgram` (qgram=3, max_block=2000) is
measured to 10x in BENCH_SCALING_QGRAM_r10.json (cap drops 10.72x —
linear under the r10 bigram-hash salter). At 100x it is NOT runnable
on this host and that is a REAL operator property, not a protocol
artifact: 4M records over a 46k-key character-3-gram space saturate
the key space, and the pure-python simulation puts the kept-block
candidate volume at ~1.13e9 pairs (~12x SUPER-linear vs 10x) —
the Spark run exhausts 80 GB of spill in the candidate sort
([SPILL_OUT_OF_MEMORY] No space left on device). The flood cap's
``max_block`` knob is exactly the control a practitioner turns at
that corpus size, so the second decade is measured at max_block=200
ACROSS ALL THREE RUNGS (same operator, same params at every scale;
simulated kept-candidates 1.7M/9.7M/15.9M at 1x/10x/100x): one
protocol, three rungs, drops + wall + found-pair counts recorded.

Reads the scaled dirs bench_scaling_big.py builds (pass --copies to
rebuild if absent). Warm medians of ``--reps`` after one discarded
cold. Prints ONE JSON line.

Usage: python scripts/bench_qgram_100x.py [out.json] [--reps=2]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pd_utils_spark.extensions import linkage as pus_lk
from pd_utils_spark.session import get_spark
from pd_utils_spark.utils import observed_metrics

RUNGS = {
    "x1": "/root/repo/.scaled1x_r10_content",
    "x10": "/root/repo/.scaled10x_r10_content",
    "x100": "/root/repo/.scaled100x_r10_content",
}
MAX_BLOCK = 200


def corpus(spark, sf_dir: str):
    """Exactly q_linkage_pairs_qgram's corpus: squashed name+brand
    entity strings plus a single-character-deletion variant each."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    base = (
        part.groupBy("p_name", "p_brand")
        .agg(F.min("p_partkey").alias("cid"))
        .select(
            "cid",
            F.expr(
                "replace(concat_ws(' ', p_name, p_brand), ' ', '')"
            ).alias("raw"),
        )
    )
    return base.select(
        F.col("cid").alias("rec_id"), F.lower("raw").alias("name")
    ).unionByName(
        base.select(
            (F.col("cid") + 1_000_000).alias("rec_id"),
            F.lower(
                F.concat(
                    F.substring("raw", 1, 2),
                    F.expr("substring(raw, 4, 1000000)"),
                )
            ).alias("name"),
        )
    )


def main() -> None:
    reps = 2
    out_path = "BENCH_SCALING_QGRAM100X_r10.json"
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif not a.startswith("--"):
            out_path = a
    spark = get_spark("bench-qgram-100x")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {
        "metric": "qgram_blocker_second_decade",
        "max_block": MAX_BLOCK,
        "protocol": (
            f"warm medians of {reps} (1 discarded cold); same corpus "
            "construction as linkage_pairs_qgram over the r10 "
            "bigram-hash-salted part rungs; max_block=200 at EVERY "
            "rung (the registered max_block=2000 row is measured to "
            "10x; at 100x its ~1.13e9 kept candidates exhaust this "
            "host's spill — recorded in cap2000_100x_status)"
        ),
        "cap2000_100x_status": (
            "DNF: SPILL_OUT_OF_MEMORY (no space left on device) in the "
            "candidate sort; simulated kept-block candidate volume "
            "1.13e9 pairs (12x super-linear vs 10x) — character-3-gram "
            "key space (46k keys) saturates at 4M records; max_block "
            "is the documented control"
        ),
        "rungs": {},
    }
    for label, d in RUNGS.items():
        if not os.path.exists(f"{d}/part.parquet"):
            print(f"# missing {d}, skipping {label}", file=sys.stderr)
            continue
        c = corpus(spark, d).localCheckpoint(eager=True)
        n = c.count()

        def run():
            t0 = time.perf_counter()
            df = pus_lk.blocked_edit_pairs(
                c, textcol="name", idcol="rec_id",
                max_dist=1, max_block=MAX_BLOCK, blocker="qgram", qgram=3,
            ).select("id_a", "id_b")
            # collect (not count/write): observe metrics populate only
            # on the frame's OWN QueryExecution — utils.observed_metrics
            pairs = len(df.collect())
            dt = time.perf_counter() - t0
            obs = observed_metrics(df)
            drops = sum(
                v.get("dropped_rows", 0) for v in obs.values()
            ) if obs else None
            spark.catalog.clearCache()
            return dt, pairs, drops

        run()  # discarded cold
        runs = [run() for _ in range(reps)]
        sec = round(statistics.median([r[0] for r in runs]), 3)
        out["rungs"][label] = {
            "rows": n,
            "sec": sec,
            "pairs_found": runs[0][1],
            "cap_dropped_rows": runs[0][2],
        }
        print(f"# {label}: {out['rungs'][label]}", file=sys.stderr,
              flush=True)
    r = out["rungs"]
    if "x1" in r and "x100" in r:
        out["drops_slope_100x"] = round(
            r["x100"]["cap_dropped_rows"] / max(r["x1"]["cap_dropped_rows"], 1), 1
        )
        out["wall_slope_100x"] = round(r["x100"]["sec"] / r["x1"]["sec"], 1)
    if "x1" in r and "x10" in r:
        out["drops_slope_10x"] = round(
            r["x10"]["cap_dropped_rows"] / max(r["x1"]["cap_dropped_rows"], 1), 2
        )
        out["wall_slope_10x"] = round(r["x10"]["sec"] / r["x1"]["sec"], 2)
    line = json.dumps(out)
    with open(out_path, "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
