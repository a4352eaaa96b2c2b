"""Merge-count rung for the BPE tokenizer (round-9 task): measure
learn + apply cost at n_merges in {10, 64, 256, 1024} and verify the
depth gate — apply must switch to the constant-depth trie path above
max_expr_merges and cost must grow ~linearly in merges with no
analyzer/codegen failure at 1024.

Protocol: learn on sf0.01 documents (vocabulary-sized iterations;
timed once per rung — learning is a driver loop, medians would take
hours at 1024), apply to sf0.1 documents through the noop sink, warm
medians of 3 after 1 discarded cold run. Prints ONE JSON line.

Usage: python scripts/bench_bpe_merges.py [out.json]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pd_utils_spark.extensions import bpe
from pd_utils_spark.session import get_spark

LEARN_SF = "/root/testdata/sf0.01"
APPLY_SF = "/root/testdata/sf0.1"
RUNGS = [10, 64, 256, 1024]


def main() -> None:
    spark = get_spark("bench-bpe-merges")
    spark.sparkContext.setLogLevel("ERROR")
    learn_docs = spark.read.parquet(f"{LEARN_SF}/documents.parquet").select(
        "doc_id", "text"
    )
    apply_docs = spark.read.parquet(f"{APPLY_SF}/documents.parquet").select(
        "doc_id", "text"
    )
    # warmup: JVM + python worker pool
    apply_docs.limit(1000).mapInPandas(
        lambda it: it, "doc_id long, text string"
    ).write.format("noop").mode("overwrite").save()

    out = {
        "learn_sec": {},
        "apply_sec": {},
        "apply_method": {},
        "n_learned": {},
        "n_padded_to": {},
        "apply_expr_forced_sec": {},
    }
    for n in RUNGS:
        t0 = time.perf_counter()
        merges = bpe.learn_bpe(learn_docs, n_merges=n, checkpoint_every=8)
        rows = merges.collect()
        out["learn_sec"][str(n)] = round(time.perf_counter() - t0, 3)
        out["n_learned"][str(n)] = len(rows)
        pairs = [(r["left"], r["right"]) for r in rows]
        # the sf0.01 corpus exhausts learnable pairs (~106); pad the
        # rank table to the NOMINAL rung size with valid-but-
        # unreachable pairs (symbols outside the corpus alphabet:
        # no output change, full-size rank table) so the rung
        # measures tokenizer cost at the claimed merge count
        if len(pairs) < n:
            pairs = pairs + [
                (f"q{i}x", f"z{i}y") for i in range(n - len(pairs))
            ]
        out["n_padded_to"][str(n)] = len(pairs)
        out["apply_method"][str(n)] = (
            "expr" if len(pairs) <= 64 else "trie"
        )
        samples = []
        for i in range(4):  # 1 cold (discarded) + 3 warm
            t0 = time.perf_counter()
            bpe.apply_bpe(apply_docs, pairs).select("bpe_tokens").write.format(
                "noop"
            ).mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        out["apply_sec"][str(n)] = round(statistics.median(samples[1:]), 3)
        # the cliff documented, not just asserted: force the expr path
        # at every rung (single timed run; failure recorded as such)
        try:
            t0 = time.perf_counter()
            bpe.apply_bpe(apply_docs, pairs, method="expr").select(
                "bpe_tokens"
            ).write.format("noop").mode("overwrite").save()
            out["apply_expr_forced_sec"][str(n)] = round(
                time.perf_counter() - t0, 3
            )
        except Exception as e:
            out["apply_expr_forced_sec"][str(n)] = f"FAILED: {type(e).__name__}"

    base = out["apply_sec"][str(RUNGS[0])]
    result = {
        "metric": "bpe_merge_rung",
        "protocol": (
            "learn sf0.01 (single timed run, checkpoint_every=8); "
            "apply sf0.1 noop sink, warm median of 3 (1 discarded cold); "
            "auto method gate at 64 merges"
        ),
        **out,
        "apply_slope_vs_10": {
            str(n): round(out["apply_sec"][str(n)] / base, 2) for n in RUNGS
        },
    }
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALING_BPE_r9.json"
    with open(path, "w") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
