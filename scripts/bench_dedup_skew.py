"""Boilerplate-heavy corpus bench: the flood-cap (`max_bucket`)
evidence at the CORPUS level, complementing bench_skew.py's key-level
join/agg lanes.

Corpus (deterministic, in-memory): `n_docs` documents; a `flood_share`
fraction are near-identical boilerplate (same paragraph + one unique
token — the template-page pathology that lands whole cohorts in single
LSH buckets); every 20th non-flood doc has an exact twin (known true
near-dup pairs OUTSIDE the flood, for recall accounting).

Lanes:
  lsh_nocap      lsh_candidate_pairs(max_bucket=None): the quadratic
                 blow-up a cap-less engine runs (candidates ~
                 C(flood,2) per colliding band)
  lsh_cap        lsh_candidate_pairs(max_bucket=cap): flood buckets
                 dropped (count read from the observe metric), twin
                 pairs must all survive
  lines_boiler   dedup_lines on the boilerplate corpus — the hot
                 line-fingerprint key (one line in flood_share of all
                 docs); partial aggregation should absorb it
  lines_uniform  dedup_lines on an all-unique corpus of the same size
                 (the no-skew baseline the boiler lane is compared to)

Usage: python scripts/bench_dedup_skew.py [n_docs] [flood_share] [cap]
Prints one JSON line; human table on stderr.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pd_utils_spark.extensions import dedup as D
from pd_utils_spark.session import get_spark
from pd_utils_spark.utils import observed_metrics


def build(spark, n_docs: int, flood_share: float):
    base = spark.range(n_docs)
    frac = (
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(16**8))
    )
    boiler = (
        "subscribe to our newsletter accept all cookies terms of service "
        "privacy policy all rights reserved contact us about careers "
    ) * 3
    uniq_words = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"w{j}x"), ((F.col("id") * (j + 7)) % 9973).cast("string"))
            for j in range(30)
        ],
    )
    is_flood = frac < flood_share
    docs = base.select(
        F.col("id").alias("doc_id"),
        F.when(
            is_flood,
            F.concat(F.lit(boiler), F.lit("tok"), F.col("id").cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("footer all rights reserved "),  # the hot LINE
                F.lit("\n"),
                uniq_words,
            )
        )
        .alias("text"),
        is_flood.alias("is_flood"),
    )
    twins = (
        docs.filter(~F.col("is_flood") & (F.col("doc_id") % 20 == 0))
        .select((F.col("doc_id") + n_docs).alias("doc_id"), "text", "is_flood")
    )
    corpus = docs.unionByName(twins).drop("is_flood")
    twin_pairs = twins.select(
        (F.col("doc_id") - n_docs).alias("id_a"), F.col("doc_id").alias("id_b")
    )
    return corpus, twin_pairs


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    flood_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 500

    spark = get_spark("bench_dedup_skew")
    spark.sparkContext.setLogLevel("ERROR")
    corpus, twin_pairs = build(spark, n_docs, flood_share)
    corpus = corpus.persist()
    n_total = corpus.count()
    n_twins = twin_pairs.count()
    res: dict[str, object] = {
        "n_docs": n_total,
        "flood_share": flood_share,
        "cap": cap,
        "n_twin_pairs": n_twins,
    }

    # --- LSH lanes -------------------------------------------------
    def lsh(max_bucket):
        out = D.lsh_candidate_pairs(corpus, max_bucket=max_bucket)
        n = out.count()
        drops = sum(
            m["dropped_rows"]
            for name, m in observed_metrics(out).items()
            if name.startswith("lsh_bucket_cap")
        )
        kept_twins = out.join(twin_pairs, ["id_a", "id_b"], "left_semi").count()
        return {"candidates": n, "dropped_rows": drops, "twin_recall": kept_twins / n_twins}

    r, s = timed(lambda: lsh(None))
    res["lsh_nocap"] = {**r, "sec": s}
    r, s = timed(lambda: lsh(cap))
    res["lsh_cap"] = {**r, "sec": s}

    # --- dedup_lines lanes -----------------------------------------
    def lines(df):
        out = D.dedup_lines(df, max_docs=1)
        return {"rows": out.count()}

    uniform = corpus.select(
        "doc_id",
        F.concat(
            F.lit("unique header "), F.col("doc_id").cast("string"),
            F.lit("\n"), F.col("text"),
        ).alias("text"),
    )
    r, s = timed(lambda: lines(corpus))
    res["lines_boiler"] = {**r, "sec": s}
    r, s = timed(lambda: lines(uniform))
    res["lines_uniform"] = {**r, "sec": s}

    # --- dedup_substrings lanes (r7: keeper de-skew evidence) -------
    # the flood docs share a long boilerplate token run, so every
    # window of that run is ONE fingerprint appearing in n_flood docs
    # — the hot-keeper case the r6 row_number window sorted in one
    # task and the r7 min-struct partial agg absorbs map-side
    def substr(df):
        out = D.dedup_substrings(df, min_tokens=10)
        return {"rows": out.count()}

    r, s = timed(lambda: substr(corpus))
    res["substr_flood"] = {**r, "sec": s}
    r, s = timed(lambda: substr(uniform))
    res["substr_uniform"] = {**r, "sec": s}

    corpus.unpersist()
    for k in (
        "lsh_nocap", "lsh_cap", "lines_boiler", "lines_uniform",
        "substr_flood", "substr_uniform",
    ):
        print(f"{k:14s} {res[k]}", file=sys.stderr)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
