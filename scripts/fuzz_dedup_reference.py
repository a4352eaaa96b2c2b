"""Deep differential fuzz of the reassembly-dedup family (r6 verdict
#1 'Done' criterion: green under a 200-example seeded run): one
dedup_substrings / dedup_spans pass is compared against a pure-Python
replay of the published rule on randomly generated corpora, far past
the per-commit pytest budget (the property tests run 15 examples each
in CI; this script runs 200 by default, seeded, and is meant to be
run per-round with the count recorded in SCALE.md).

Usage: python scripts/fuzz_dedup_reference.py [--n=200] [--seed=7]
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pd_utils_spark.session import get_spark


def ref_substrings(docs: dict, k: int) -> dict:
    toks = {i: t.split() for i, t in docs.items()}
    occ: dict = {}
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - k + 1):
            occ.setdefault(tuple(ts[p : p + k]), []).append((i, p))
    removal = set()
    for lst in occ.values():
        if len(lst) > 1:
            keep = min(lst)
            for i, p in lst:
                if (i, p) != keep:
                    removal.update((i, q) for q in range(p, p + k))
    return {
        i: " ".join(t for p, t in enumerate(ts) if (i, p) not in removal)
        for i, ts in toks.items()
    }


def ref_spans(docs: dict, n: int) -> dict:
    sents = {
        i: [s.strip() for s in t.split(".") if s.strip()]
        for i, t in docs.items()
    }
    occ: dict = {}
    for i in sorted(sents):
        ss = sents[i]
        for p in range(len(ss) - n + 1):
            occ.setdefault(
                tuple(s.lower() for s in ss[p : p + n]), []
            ).append((i, p))
    removal = set()
    for lst in occ.values():
        if len(lst) > 1:
            keep = min(lst)
            for i, p in lst:
                if (i, p) != keep:
                    removal.update((i, q) for q in range(p, p + n))
    return {
        i: ". ".join(s for p, s in enumerate(ss) if (i, p) not in removal)
        for i, ss in sents.items()
    }


def main() -> None:
    n_examples = 200
    seed = 7
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n_examples = int(a.split("=", 1)[1])
        if a.startswith("--seed="):
            seed = int(a.split("=", 1)[1])
    rng = random.Random(seed)
    spark = get_spark("fuzz-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    from pd_utils_spark.extensions.dedup import dedup_spans, dedup_substrings

    words = ["aa", "bb", "cc", "dd", "ee", "ff"]
    fails = 0
    for ex in range(n_examples):
        ndocs = rng.randint(1, 7)
        docs = {
            i: " ".join(
                rng.choice(words) for _ in range(rng.randint(1, 14))
            )
            for i in range(ndocs)
        }
        k = rng.randint(2, 4)
        df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
        got = {
            r.doc_id: r.clean_text
            for r in dedup_substrings(df, min_tokens=k, out="clean_text").collect()
        }
        want = ref_substrings(docs, k)
        if got != want:
            fails += 1
            print(f"SUBSTR MISMATCH ex={ex} k={k} docs={docs}\n got={got}\n want={want}")

        sdocs = {
            i: ". ".join(
                " ".join(rng.choice(words) for _ in range(rng.randint(1, 3)))
                for _ in range(rng.randint(1, 6))
            )
            for i in range(ndocs)
        }
        n = rng.randint(2, 3)
        sdf = spark.createDataFrame(list(sdocs.items()), ["doc_id", "text"])
        got_s = {
            r.doc_id: r.clean_text
            for r in dedup_spans(sdf, n=n, out="clean_text").collect()
        }
        want_s = ref_spans(sdocs, n)
        if got_s != want_s:
            fails += 1
            print(f"SPANS MISMATCH ex={ex} n={n} docs={sdocs}\n got={got_s}\n want={want_s}")
        if (ex + 1) % 25 == 0:
            print(f"# {ex + 1}/{n_examples} examples, {fails} failures",
                  flush=True)
    print(f"RESULT: {n_examples} examples x 2 operators, {fails} failures, seed={seed}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
