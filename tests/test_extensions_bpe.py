from __future__ import annotations

import collections
import random
import re

import pytest
from pyspark.sql import functions as F

from pd_utils_spark.extensions import bpe


def ref_learn(texts, n_merges, min_freq=1):
    """Pure-Python Sennrich-style reference: pair counts over the
    distinct-word table, greedy-leftmost merge, tie-break (freq desc,
    left asc, right asc)."""
    wc = collections.Counter()
    for t in texts:
        for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split():
            wc[w] += 1
    vocab = {tuple(list(w) + ["_"]): c for w, c in wc.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = collections.Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += c
        if not pc:
            break
        (l, r), f = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if f < min_freq:
            break
        merges.append((rank, l, r, l + r, f))
        vocab = {ref_merge_seq(sym, l, r): c for sym, c in vocab.items()}
    return merges


def ref_merge_seq(sym, l, r):
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def test_learn_textbook_corpus(spark):
    df = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest; NEW!")],
        ["id", "text"],
    )
    got = [tuple(r) for r in bpe.learn_bpe(df, n_merges=5).collect()]
    assert got == [
        (1, "l", "o", "lo", 5),
        (2, "lo", "w", "low", 5),
        (3, "e", "w", "ew", 4),
        (4, "n", "ew", "new", 4),
        (5, "low", "_", "low_", 3),
    ]


def test_learn_matches_pure_python_reference(spark):
    rng = random.Random(11)
    words = ["aba", "ab", "ba", "aab", "bb", "a"]
    for _ in range(4):
        texts = [
            " ".join(rng.choice(words) for _ in range(rng.randint(1, 8)))
            for _ in range(rng.randint(1, 5))
        ]
        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["id", "text"])
        n = rng.randint(1, 4)
        got = [tuple(r) for r in bpe.learn_bpe(df, n_merges=n).collect()]
        want = ref_learn(texts, n)
        assert got == want, f"texts={texts} n={n}"


def test_learn_batched_identical_to_sequential(spark):
    """batch_merges changes the SCHEDULE (jobs per merge), never the
    vocabulary: the symbol-disjoint prefix + strict frequency cut is
    provably sequential-equivalent (see learn_bpe docstring). Pinned
    on the textbook corpus, an overlap-heavy corpus (top pairs share
    symbols, forcing the guard's stop/fallback paths), and seeded
    random corpora, across batch sizes."""
    corpora = [
        ["low low low lower lowest", "new newer newest; NEW!"],
        # overlap-heavy: a/b dominate every top pair
        ["aba ab ba aab bb aa abab baba", "ab ab ab ba ba aab"],
        ["the cat sat on the mat", "the hat and the bat chat"],
    ]
    rng = random.Random(17)
    words = ["aba", "ab", "ba", "aab", "bb", "a", "cab", "bac"]
    for _ in range(3):
        corpora.append(
            [
                " ".join(rng.choice(words) for _ in range(rng.randint(2, 9)))
                for _ in range(rng.randint(1, 4))
            ]
        )
    for texts in corpora:
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["id", "text"]
        )
        for n in (3, 7):
            want = [
                tuple(r)
                for r in bpe.learn_bpe(df, n_merges=n).collect()
            ]
            assert want == ref_learn(texts, n), f"texts={texts} n={n}"
            for m in (2, 4, 16):
                got = [
                    tuple(r)
                    for r in bpe.learn_bpe(
                        df, n_merges=n, batch_merges=m
                    ).collect()
                ]
                assert got == want, f"texts={texts} n={n} batch={m}"


def test_learn_batched_fewer_jobs(spark):
    """The point of batching: merge rounds (pair-count jobs) drop from
    n to ~n/m on a corpus whose top pairs are symbol-disjoint with
    strictly decreasing counts (the guard needs BOTH: ties at the cut
    or chain-overlapping pairs force sequential-pace rounds, which is
    exactly the bit-exactness contract)."""
    tiers = [
        ("ab", ("q", "r", "s"), (100, 100, 100)),  # (a,b) = 300
        ("cd", ("t", "u", "v"), (70, 70, 60)),     # (c,d) = 200
        ("ef", ("w", "x", "y"), (50, 50, 50)),     # (e,f) = 150
        ("gh", ("z", "0", "1"), (48, 48, 44)),     # (g,h) = 140
        ("ij", ("2", "3", "4"), (45, 45, 40)),     # (i,j) = 130
        ("kl", ("5", "6", "7"), (40, 40, 40)),     # (k,l) = 120
    ]
    texts = [
        " ".join((stem + suf + " ") * n for suf, n in zip(sufs, ns))
        for stem, sufs, ns in tiers
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["id", "text"]
    )
    calls = {"n": 0}
    orig = bpe._pair_counts

    def counting(wrapped):
        calls["n"] += 1
        return orig(wrapped)

    bpe._pair_counts = counting
    try:
        seq = [tuple(r) for r in bpe.learn_bpe(df, n_merges=8).collect()]
        seq_jobs = calls["n"]
        calls["n"] = 0
        bat = [
            tuple(r)
            for r in bpe.learn_bpe(
                df, n_merges=8, batch_merges=8
            ).collect()
        ]
        bat_jobs = calls["n"]
    finally:
        bpe._pair_counts = orig
    assert bat == seq
    assert seq_jobs == 8
    assert bat_jobs < seq_jobs  # strictly fewer aggregation rounds


def test_apply_greedy_leftmost(spark):
    df = spark.createDataFrame([(1, "aaa")], ["id", "text"])
    out = bpe.apply_bpe(df, [("a", "a")]).first()["bpe_tokens"]
    assert out == ["aa", "a", "_"]


def test_apply_does_not_merge_across_words(spark):
    # merge (a, _) is an end-of-word merge; the 'a' that starts the
    # SECOND word must not pair with the first word's EOW
    df = spark.createDataFrame([(1, "ba ab")], ["id", "text"])
    out = bpe.apply_bpe(df, [("a", "_")]).first()["bpe_tokens"]
    assert out == ["b", "a_", "a", "b", "_"]


def test_apply_ranked_order_and_empty_docs(spark):
    df = spark.createDataFrame([(1, "abab"), (2, ""), (3, "?!")], ["id", "text"])
    m = [("a", "b"), ("ab", "ab")]
    got = {r["id"]: r["bpe_tokens"] for r in bpe.apply_bpe(df, m).collect()}
    assert got[1] == ["abab", "_"]
    assert got[2] == [] and got[3] == []


def test_stats_compression(spark):
    df = spark.createDataFrame(
        [(1, "s", "low low"), (2, "s", "low")], ["id", "source", "text"]
    )
    m = bpe.learn_bpe(df, n_merges=3)
    stats = bpe.bpe_token_stats(df, m, byvars="source").first()
    # 3 words x (3 chars + EOW) = 12 initial symbols
    assert stats["n_docs"] == 2
    assert stats["n_symbols_initial"] == 12
    # merges: (l,o),(lo,w),(low,_) -> each word is ONE token
    assert stats["n_tokens_bpe"] == 3
    assert stats["compression"] == pytest.approx(0.25)


def test_min_freq_early_stop(spark):
    df = spark.createDataFrame([(1, "ab cd")], ["id", "text"])
    m = bpe.learn_bpe(df, n_merges=10, min_freq=2)
    # every pair occurs once; nothing reaches min_freq=2
    assert m.count() == 0


def test_apply_is_map_only(spark):
    df = spark.createDataFrame([(1, "hello world")], ["id", "text"])
    plan = (
        bpe.apply_bpe(df, [("l", "l")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_matches_applied_tokens(spark):
    df = spark.createDataFrame(
        [(1, "low low lower"), (2, "lowest low")], ["id", "text"]
    )
    m = bpe.learn_bpe(df, n_merges=3)
    vocab = {r["symbol"]: r["n"] for r in bpe.bpe_vocab(df, m).collect()}
    # ground truth: flatten apply_bpe over the docs and count
    applied = bpe.apply_bpe(df, m)
    truth = collections.Counter(
        t for r in applied.collect() for t in r["bpe_tokens"]
    )
    assert vocab == dict(truth)
    assert sum(vocab.values()) == sum(truth.values())


def test_trie_path_identical_to_expr_path(spark):
    """The depth-bounded mapInPandas tokenizer is pinned bit-identical
    to the exact relational replace chain — same merges, same docs,
    including empty, punctuation-only and NULL text."""
    docs = spark.createDataFrame(
        [
            (1, "low low lower lowest"),
            (2, "newer newest new"),
            (3, "wider wide widest lower"),
            (4, ""),
            (5, "?!  ,,"),
            (6, None),
            (7, "aaaa aa a"),
        ],
        "id int, text string",
    )
    m = bpe.learn_bpe(docs, n_merges=12)
    e = {
        r["id"]: r["bpe_tokens"]
        for r in bpe.apply_bpe(docs, m, method="expr").collect()
    }
    t = {
        r["id"]: r["bpe_tokens"]
        for r in bpe.apply_bpe(docs, m, method="trie").collect()
    }
    assert e == t
    ve = {
        r["symbol"]: r["n"]
        for r in bpe.bpe_vocab(docs, m, method="expr").collect()
    }
    vt = {
        r["symbol"]: r["n"]
        for r in bpe.bpe_vocab(docs, m, method="trie").collect()
    }
    assert ve == vt


def test_auto_switches_to_trie_above_threshold(spark):
    """auto picks the expr path at/below max_expr_merges and the
    constant-depth Arrow path above it (ArrowEvalPython-free vs
    mapInPandas in the physical plan)."""
    df = spark.createDataFrame([(1, "hello world")], ["id", "text"])
    pairs = [("l", "l"), ("h", "e"), ("w", "o")]

    def plan(method, max_expr):
        return (
            bpe.apply_bpe(
                df, pairs, method=method, max_expr_merges=max_expr
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    assert "MapInPandas" not in plan("auto", 3)
    assert "MapInPandas" in plan("auto", 2)
    assert "MapInPandas" in plan("trie", 64)


def test_learn_checkpoint_cadence_changes_nothing(spark):
    """localCheckpoint every N iterations bounds lineage only — the
    learned merge table is bit-identical at any cadence."""
    df = spark.createDataFrame(
        [(1, "low low lower lowest"), (2, "newer newest new low")],
        ["id", "text"],
    )
    a = [tuple(r) for r in bpe.learn_bpe(df, n_merges=9, checkpoint_every=2).collect()]
    b = [tuple(r) for r in bpe.learn_bpe(df, n_merges=9, checkpoint_every=100).collect()]
    assert a == b and len(a) == 9


def test_trie_path_large_merge_table_runs(spark):
    """The scale point: a merge table far past the expr gate (1024
    synthetic pairs on top of real ones) tokenizes fine on the trie
    path — constant plan depth, no analyzer/codegen cliff."""
    docs = spark.createDataFrame(
        [(1, "low low lower lowest"), (2, "newer newest new")],
        ["id", "text"],
    )
    m = bpe.learn_bpe(docs, n_merges=8)
    real = [(r["left"], r["right"]) for r in m.orderBy("rank").collect()]
    # pad with unreachable pairs (symbols outside the corpus alphabet)
    pad = [(f"q{i}x", f"z{i}y") for i in range(1024)]
    got = {
        r["id"]: r["bpe_tokens"]
        for r in bpe.apply_bpe(docs, real + pad).collect()
    }
    want = {
        r["id"]: r["bpe_tokens"]
        for r in bpe.apply_bpe(docs, real, method="expr").collect()
    }
    assert got == want
