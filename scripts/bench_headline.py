"""The STABLE bench instrument: warm-isolated medians for a fixed
headline query set, replacing cross-round comparison of the serial
full-suite numbers.

Why it exists (round-5 finding): the serial bench's per-query numbers
swing up to 4x in BOTH directions on this host (host CPU steal +
first-execution codegen/JIT + session position — `dedup_minhash_lsh`
measured 6.55 s in-suite vs 4.3 s warm-isolated, `long_to_wide_multi`
2.87 s in-suite vs 11-13 s isolated), so a serial sample can neither
show nor hide a real 30% plan regression. This lane fixes the
protocol: per query, ONE discarded cold rep (absorbs codegen +
broadcast/Python-worker spin-up for that query's operator mix), then
``--reps`` timed warm reps, median reported. `spark.catalog
.clearCache()` between reps so retained-cache operators (e.g.
jaccard_join_prefix) measure their full plan each time, not a cache
hit.

The headline set = the top cost tier of the r5 serial bench + one
representative per operator family + the two r5 drift suspects
(flag_outliers_iqr, tf_idf). Keep the SET and the protocol frozen
across rounds — the medians are the regression reference
(BASELINE.md); the serial bench remains for totals/coverage only.

V2 (round 9): the r6-frozen 37-query set predates 68 of the round-7/8
queries, so none of the containment, linkage, sketch, BPE, VARIANT or
constant-state streaming families had a cross-round median — a plan
regression there was invisible between scaling rungs. HEADLINE_V2
appends one cost-weighted representative per uncovered family; the
artifact reports the 37-query V1 subtotal separately
(``value_v1_subtotal``) so the r6-r8 lane history stays comparable.
V2 is now the frozen set; do not grow it casually — add a V3 block
with its own subtotal if a future round needs more coverage.

Usage:
    python scripts/bench_headline.py [--sf=DIR] [--reps=N] [--out=F]
    # default sf0.1, 3 warm reps, JSON to stdout (one line)
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

# Frozen headline set (r6). Order is cost-descending from the r5
# serial bench so a wall-clock budget cut truncates the cheap tail.
HEADLINE = [
    # top cost tier (r5 serial, sf0.1)
    "candidate_recall",
    "dedup_minhash_lsh",
    "near_dup_analysis",
    "ann_pq_topk",
    "ann_ivf_topk",
    "hits",
    "simhash_near_dup_pairs",
    "semantic_dedup_kmeans",
    "groupby_transform_cumsum",
    "cluster_top_terms",
    "pagerank",
    "training_pipeline",
    "streaming_interval_join",
    "dedup_cluster_stats",
    "dedup_keep_best",
    "long_to_wide_ordinal",
    "rfm_segments",
    "source_overlap",
    "jaccard_join_prefix",
    "dsir_weights",
    "bfs_levels",
    "connected_components",
    # one per family not already covered above
    "winsorize",            # reference core: percentile window
    "reg_by",               # reference core: grouped OLS
    "left_merge_latest",    # reference core: as-of join
    "sql_interface",        # TPC-H Q1 through sql()
    "mann_kendall",         # timeseries
    "attribution",          # events
    "target_encode",        # features
    "auc_by_group",         # metrics
    "ks_test",              # stats
    "scd2_merge",           # snapshot/versioning
    "run_checks",           # data quality
    "hash_split",           # sampling
    "language_id",          # text analysis
    # r5 drift suspects (VERDICT r5 task #2)
    "flag_outliers_iqr",
    "tf_idf",
]

# Round-7/8 families the V1 set cannot see (one cost-weighted
# representative each; frozen as of r9 — see module docstring).
HEADLINE_V2_EXTRA = [
    "containment_join",                # exact containment join
    "dedup_containment_against",       # incremental subsumption gate
    "linkage_pairs",                   # record-linkage blocking+verify
    "entity_match",                    # linkage closure
    "kmv_containment_audit",           # bottom-k/KMV sketch family
    "bpe_learn",                       # distributed BPE training
    "greedy_band_precision_boundary",  # greedy-band audit tier
    "streaming_containment_dedup",     # streaming ingest gate
    "streaming_quantiles",             # constant-state streaming sketch
    "variant_nested",                  # VARIANT semi-structured ops
    "approx_group_stats",              # sketch aggs + exact audit
    "weighted_pick_audit",             # A-ES weighted sampling audit
]
HEADLINE_V2 = HEADLINE + HEADLINE_V2_EXTRA

# Round-10 block (the r9 verdict's lane blind spot: three of the five
# most expensive serial rows had no cross-round lane median, so serial
# spikes on them — winnow_containment 2.8x in r9 on untouched code —
# could only be dispositioned as "host noise by inference"). Frozen as
# of r10; reported as its own subtotal (value_v3_subtotal).
HEADLINE_V3_EXTRA = [
    "winnow_containment",    # winnowing fingerprint self-join
    "shingle_fingerprints",  # shingle/fingerprint extraction tier
    "fuzzy_best_join",       # blocked thresholded-Levenshtein best match
]
HEADLINE_V3 = HEADLINE_V2 + HEADLINE_V3_EXTRA

# Round-11 block (the r10 verdict's lane blind spot: of the five most
# expensive r10 serial rows, these three had no cross-round lane
# median — streaming_quantiles and weighted_pick_audit were already in
# V2 — so e.g. dedup_containment_index's 8.83->17.47 s serial doubling
# could only be dispositioned by inference). Frozen as of r11;
# reported as its own subtotal (value_v4_subtotal).
HEADLINE_V4_EXTRA = [
    "dedup_containment_index",    # incremental gate: build + round-trip + probe
    "streaming_weighted_sample",  # constant-state streaming A-ES sample
    "streaming_minhash_dedup",    # streaming LSH ingest gate end-to-end
]
HEADLINE_V4 = HEADLINE_V3 + HEADLINE_V4_EXTRA


def _cpu_ticks() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from the aggregate /proc/stat cpu
    line — the per-rep host-contention witness. A rep whose wall time
    spikes while its steal/busy delta also spikes is host noise, not
    plan drift; the r6 verdict asked for this to be attributable from
    the artifact alone (candidate_recall's [8.97, 7.29, 25.06])."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except Exception:  # pragma: no cover - non-Linux
        return 0, 0


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    out_path = None
    names = list(HEADLINE_V4)
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        if a == "--v1":
            names = list(HEADLINE)
        if a == "--v2":
            names = list(HEADLINE_V2)
        if a == "--v3":
            names = list(HEADLINE_V3)
        if a.startswith("--slice="):
            # run a contiguous chunk (e.g. --slice=0:20) so the lane
            # can be produced in resumable pieces and merged
            lo, hi = a.split("=", 1)[1].split(":")
            names = names[int(lo):int(hi)]
    spark = get_spark("bench-headline")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]

        def run() -> tuple[float, float]:
            s0, t0_ticks = _cpu_ticks()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            s1, t1_ticks = _cpu_ticks()
            spark.catalog.clearCache()
            dticks = max(t1_ticks - t0_ticks, 1)
            return dt, (s1 - s0) / dticks

        try:
            cold, _ = run()  # discarded: codegen + spin-up
            cold = round(cold, 3)
            runs = [run() for _ in range(reps)]
        except Exception as e:  # pragma: no cover
            print(f"# headline bench error in {name}: {e}", file=sys.stderr)
            results[name] = {"median": -1.0, "reps": [], "cold": -1.0}
            continue
        times = [round(t, 3) for t, _ in runs]
        steals = [round(s, 4) for _, s in runs]
        results[name] = {
            "median": round(statistics.median(times), 3),
            "reps": times,
            "steal_frac": steals,
            "cold": cold,
        }
        print(f"# {name}: median={results[name]['median']} reps={times} "
              f"steal={steals} (cold {cold})", file=sys.stderr, flush=True)

    total = round(sum(r["median"] for r in results.values() if r["median"] > 0), 3)
    v1_subtotal = round(
        sum(
            r["median"]
            for n, r in results.items()
            if n in HEADLINE and r["median"] > 0
        ),
        3,
    )
    v2_subtotal = round(
        sum(
            r["median"]
            for n, r in results.items()
            if n in HEADLINE_V2 and r["median"] > 0
        ),
        3,
    )
    v3_subtotal = round(
        sum(
            r["median"]
            for n, r in results.items()
            if n in HEADLINE_V3_EXTRA and r["median"] > 0
        ),
        3,
    )
    v4_subtotal = round(
        sum(
            r["median"]
            for n, r in results.items()
            if n in HEADLINE_V4_EXTRA and r["median"] > 0
        ),
        3,
    )
    doc = {
        "metric": "headline_warm_median_sec",
        "value": total,
        "value_v1_subtotal": v1_subtotal,
        "value_v2_subtotal": v2_subtotal,
        "value_v3_subtotal": v3_subtotal,
        "value_v4_subtotal": v4_subtotal,
        "unit": "sec",
        "protocol": f"1 discarded cold rep + {reps} warm reps, median; "
        "clearCache between reps; one session",
        "n_queries": len(results),
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
        "queries": {n: r["median"] for n, r in results.items()},
        "detail": results,
    }
    line = json.dumps(doc)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
