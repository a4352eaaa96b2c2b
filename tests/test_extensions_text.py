"""Golden tests for the text-analysis extension operators
(pd_utils_spark/extensions/text.py) on tiny hand-written documents."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from pd_utils_spark.extensions import text as T
from tests.helpers import assert_df_equal

DOCS = pd.DataFrame(
    {
        "doc_id": [0, 1, 2, 3],
        "text": [
            "the cat sat on the mat.",
            "der Hund und die Katze",
            "  spaced   out\ttabs  ",
            "",
        ],
    }
)


def _sdf(spark):
    return spark.createDataFrame(DOCS)


class TestTokenCount:
    def test_counts(self, spark):
        out = T.token_count(_sdf(spark)).select("doc_id", "n_tokens")
        expect = pd.DataFrame({"doc_id": [0, 1, 2, 3], "n_tokens": [6, 5, 3, 0]})
        assert_df_equal(out, expect, sort_cols=["doc_id"])

    def test_bpe_estimate(self, spark):
        out = T.token_count_bpe(_sdf(spark)).select("doc_id", "n_tokens_bpe")
        # ceil(len/4) per word: doc0 all words <=4 chars -> 6;
        # doc1 Katze(5)->2, rest 1 -> 6; doc2 spaced(6)->2, out, tabs -> 4; doc3 0
        expect = pd.DataFrame({"doc_id": [0, 1, 2, 3], "n_tokens_bpe": [6, 6, 4, 0]})
        assert_df_equal(out, expect, sort_cols=["doc_id"])


class TestTextQuality:
    def test_ratios(self, spark):
        out = T.text_quality(_sdf(spark)).select(
            "doc_id", "n_tokens", "punct_ratio", "stopword_ratio"
        )
        expect = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "n_tokens": [6, 5, 3, 0],
                "punct_ratio": [round(1 / 23, 6), 0.0, 0.0, 0.0],
                "stopword_ratio": [round(2 / 6, 6), 0.0, 0.0, 0.0],
            }
        )
        assert_df_equal(out, expect, sort_cols=["doc_id"])


class TestLanguageId:
    def test_pred(self, spark):
        out = T.language_id(_sdf(spark)).select("doc_id", "lang_pred")
        # doc0: 'the' x2 -> en; doc1: der/und/die -> de; doc2/3: no hits -> und
        expect = pd.DataFrame(
            {"doc_id": [0, 1, 2, 3], "lang_pred": ["en", "de", "und", "und"]}
        )
        assert_df_equal(out, expect, sort_cols=["doc_id"])

    def test_tie_breaks_alphabetical(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["la la"]}))
        # 'la' is a marker for both es and fr (2 hits each) -> 'es' wins
        out = T.language_id(df).select("doc_id", "lang_pred")
        expect = pd.DataFrame({"doc_id": [0], "lang_pred": ["es"]})
        assert_df_equal(out, expect, sort_cols=["doc_id"])


class TestDocFingerprint:
    def test_normalized_md5(self, spark):
        out = T.doc_fingerprint(_sdf(spark)).select("doc_id", "fingerprint")
        def fp(s):
            norm = " ".join(s.lower().split())
            return hashlib.md5(norm.encode()).hexdigest()
        expect = pd.DataFrame(
            {"doc_id": [0, 1, 2, 3], "fingerprint": [fp(t) for t in DOCS["text"]]}
        )
        assert_df_equal(out, expect, sort_cols=["doc_id"])

    def test_whitespace_variants_collide(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0, 1], "text": ["A  b\tc", "a b c"]})
        )
        fps = (
            T.doc_fingerprint(df).select("fingerprint").distinct().count()
        )
        assert fps == 1


class TestRollingHash:
    def test_shingle_count(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0, 1], "text": ["a b c d e f", "a b"]})
        )
        out = T.rolling_hash_fingerprints(df, k=5).toPandas().set_index("doc_id")
        assert len(out.loc[0, "shingle_hashes"]) == 2  # 6 tokens, k=5 -> 2
        assert len(out.loc[1, "shingle_hashes"]) == 0  # shorter than k

    def test_matches_python_md5(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["a b c d e"]}))
        [row] = T.rolling_hash_fingerprints(df, k=5).collect()
        assert row.shingle_hashes == [hashlib.md5(b"a b c d e").hexdigest()]


class TestRepetitionScores:
    def test_fractions(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [0, 1, 2],
                    "text": [
                        "spam spam spam eggs",       # top word 3/4, top bigram 2/3
                        "all words differ here",     # 1/4, 1/3
                        "",                          # no tokens -> 0.0
                    ],
                }
            )
        )
        out = T.repetition_scores(df).toPandas().set_index("doc_id")
        assert out.loc[0, "top_word_frac"] == 0.75
        assert abs(out.loc[0, "top_bigram_frac"] - 2 / 3) < 1e-6
        assert out.loc[1, "top_word_frac"] == 0.25
        assert out.loc[2, "top_word_frac"] == 0.0
        assert out.loc[2, "top_bigram_frac"] == 0.0

    def test_single_token_doc_has_zero_bigram_frac(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["word"]}))
        out = T.repetition_scores(df).toPandas()
        assert out.top_word_frac.iloc[0] == 1.0
        assert out.top_bigram_frac.iloc[0] == 0.0


class TestGopherFilter:
    def test_gate_components(self, spark):
        good = "the quick brown fox is not lazy and jumps over the dog " * 2
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [0, 1, 2],
                    "text": [
                        good,                      # passes with min_tokens=10
                        "shrt txt",                # too few tokens, no stopwords
                        "@@@ ### $$$ %%% ^^^ &&& *** ((( ))) ___ +++ ===",  # symbols
                    ],
                }
            )
        )
        out = (
            T.gopher_quality_filter(df, min_tokens=10)
            .toPandas()
            .set_index("doc_id")
        )
        assert bool(out.loc[0, "passes_gopher"])
        assert not bool(out.loc[1, "ok_token_count"])
        assert not bool(out.loc[2, "ok_symbol_frac"])
        assert not bool(out.loc[2, "passes_gopher"])


class TestC4LineFilter:
    def test_line_and_page_rules(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [0, 1, 2],
                    "text": [
                        "This line stays here.\nshort one\nAnother good line stays!\nno punct line at all",
                        "Lorem Ipsum dolor sit amet.",
                        "function f() { return 1; }",
                    ],
                }
            )
        )
        out = T.c4_line_filter(df).toPandas().set_index("doc_id")
        assert out.loc[0, "clean_text"] == "This line stays here.\nAnother good line stays!"
        assert out.loc[0, "n_lines_kept"] == 2 and out.loc[0, "n_lines_total"] == 4
        assert bool(out.loc[0, "c4_page_ok"])
        assert not bool(out.loc[1, "c4_page_ok"])  # lorem ipsum
        assert not bool(out.loc[2, "c4_page_ok"])  # curly brace

    def test_no_terminal_punct_requirement(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0], "text": ["three words here\nTwo words"]})
        )
        out = T.c4_line_filter(df, require_terminal_punct=False).toPandas()
        assert out.clean_text.iloc[0] == "three words here"


class TestWinnowing:
    def test_guarantee_and_density(self, spark):
        import hashlib

        import pandas as pd
        from pd_utils_spark.extensions.text import winnowing_fingerprints

        text = "a b c d e f g h i j k l m n o p"
        df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [text]}))
        row = winnowing_fingerprints(df, k=5, window=4).collect()[0]
        toks = text.split()
        grams = [" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)]
        hashes = [hashlib.md5(g.encode()).hexdigest() for g in grams]
        want = sorted(
            {min(hashes[i : i + 4]) for i in range(len(hashes) - 3)}
        )
        assert sorted(row.winnow_hashes) == want
        # winnowing keeps a strict subset of the k-gram hashes
        assert 0 < len(row.winnow_hashes) < len(hashes)

    def test_short_docs(self, spark):
        import pandas as pd
        from pd_utils_spark.extensions.text import winnowing_fingerprints

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "text": [
                        "a b c d e f",  # 2 k-grams < window -> min of all
                        "a b c",  # shorter than k -> empty
                        "",
                    ],
                }
            )
        )
        got = {r.doc_id: r.winnow_hashes for r in winnowing_fingerprints(df, k=5, window=4).collect()}
        assert len(got[1]) == 1
        assert got[2] == [] and got[3] == []

    def test_shared_run_shares_a_fingerprint(self, spark):
        import pandas as pd
        from pd_utils_spark.extensions.text import winnowing_fingerprints

        shared = "the common stolen passage appears verbatim here today"
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2],
                    "text": [
                        "intro words before " + shared,
                        shared + " trailing epilogue of other words",
                    ],
                }
            )
        )
        got = {r.doc_id: set(r.winnow_hashes) for r in winnowing_fingerprints(df, k=5, window=4).collect()}
        # match length >= window + k - 1 = 8 tokens guarantees overlap
        assert got[1] & got[2]


class TestBM25TopK:
    def _expected(self, corpus, query_tokens, k1=1.2, b=0.75):
        # independent eager reimplementation of Okapi BM25 (Lucene idf)
        import math

        toks = {i: t.lower().split() for i, t in corpus.items()}
        n = len(toks)
        avgdl = sum(len(v) for v in toks.values()) / n
        df = {}
        for v in toks.values():
            for t in set(v):
                df[t] = df.get(t, 0) + 1
        scores = {}
        for i, v in toks.items():
            s = 0.0
            for t in set(query_tokens):
                tc = v.count(t)
                if tc == 0:
                    continue
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * tc * (k1 + 1) / (tc + k1 * (1 - b + b * len(v) / avgdl))
            if s != 0.0:
                scores[i] = round(s, 4)
        return scores

    def test_matches_eager_reference(self, spark):
        corpus = {
            0: "the cat sat on the mat",
            1: "the dog sat",
            2: "a bird flew over the mat",
            3: "unrelated words entirely",
        }
        cdf = spark.createDataFrame(
            pd.DataFrame({"doc_id": list(corpus), "text": list(corpus.values())})
        )
        qdf = spark.createDataFrame(
            pd.DataFrame({"query_id": [7], "text": ["cat on mat"]})
        )
        out = T.bm25_topk(cdf, qdf, k=10, round_to=4).toPandas()
        expect = self._expected(corpus, ["cat", "on", "mat"])
        got = dict(zip(out["doc_id"], out["score"]))
        assert got == expect  # doc 3 shares no token -> absent
        # ranks follow score desc, doc_id asc
        ranked = out.sort_values("rank")
        assert list(ranked["doc_id"]) == sorted(
            expect, key=lambda d: (-expect[d], d)
        )

    def test_topk_cut(self, spark):
        corpus = {i: f"common w{i}" for i in range(6)}
        cdf = spark.createDataFrame(
            pd.DataFrame({"doc_id": list(corpus), "text": list(corpus.values())})
        )
        qdf = spark.createDataFrame(
            pd.DataFrame({"query_id": [0], "text": ["common"]})
        )
        out = T.bm25_topk(cdf, qdf, k=3, round_to=4).toPandas()
        # equal scores -> tie broken by ascending doc_id
        assert sorted(out["doc_id"]) == [0, 1, 2]
        assert len(out) == 3


class TestUnigramLogprob:
    def test_mle_probabilities(self, spark):
        import math

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a a", "a b", ""]})
        )
        out = (
            T.unigram_logprob(df, round_to=6)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        # counts: a=3, b=1, total=4
        lp0 = math.log(0.75)
        lp1 = (math.log(0.75) + math.log(0.25)) / 2
        assert list(out.index) == [0, 1]  # empty doc dropped
        assert out.loc[0, "n_tokens"] == 2
        assert out.loc[1, "n_tokens"] == 2
        assert abs(out.loc[0, "logprob_mean"] - round(lp0, 6)) < 1e-9
        assert abs(out.loc[1, "logprob_mean"] - round(lp1, 6)) < 1e-9
        assert abs(out.loc[0, "perplexity"] - round(math.exp(-lp0), 6)) < 1e-9


class TestBigramLogprob:
    def test_hand_computed_interpolation(self, spark):
        import math

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a b a b", "a a", ""]})
        )
        out = (
            T.bigram_logprob(df, lam=0.7)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        # uni: a=4, b=2, total=6; bi: (a,b)=2, (b,a)=1, (a,a)=1;
        # ctx: a=3, b=1
        om = 1.0 - 0.7  # the operator's exact (1 - lam) double
        first = math.log(4 / 6)
        ab = math.log(0.7 * (2 / 3) + om * (2 / 6))
        ba = math.log(0.7 * (1 / 1) + om * (4 / 6))
        aa = math.log(0.7 * (1 / 3) + om * (4 / 6))
        lp1 = (first + ab + ba + ab) / 4
        lp2 = (first + aa) / 2
        assert list(out.index) == [1, 2]  # empty doc dropped
        assert out.loc[1, "n_tokens"] == 4 and out.loc[1, "n_bigrams"] == 3
        assert out.loc[2, "n_tokens"] == 2 and out.loc[2, "n_bigrams"] == 1
        assert abs(out.loc[1, "logprob_mean"] - lp1) < 1e-12
        assert abs(out.loc[2, "logprob_mean"] - lp2) < 1e-12
        assert abs(out.loc[1, "perplexity"] - math.exp(-lp1)) < 1e-9

    def test_word_salad_scores_below_fluent(self, spark):
        # a salad doc with the SAME token multiset as the dominant
        # fluent phrasing: unigram scores tie, bigram must separate
        fluent = "the cat sat on the mat"
        salad = "mat the on sat cat the"
        docs = [fluent] * 5 + [salad]
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
        )
        out = T.bigram_logprob(df).toPandas().set_index("doc_id")
        assert out.loc[0, "logprob_mean"] > out.loc[5, "logprob_mean"]
        uni = T.unigram_logprob(df).toPandas().set_index("doc_id")
        assert abs(uni.loc[0, "logprob_mean"] - uni.loc[5, "logprob_mean"]) < 1e-12


class TestSourceKLDrift:
    def test_hand_computed(self, spark):
        import math

        df = spark.createDataFrame(
            pd.DataFrame(
                {"source": ["A", "B"], "text": ["a a b", "b b"]}
            )
        )
        out = (
            T.source_kl_drift(df, round_to=9)
            .toPandas()
            .set_index("source")
            .sort_index()
        )
        # corpus: a=2, b=3, total 5 -> Q(a)=0.4, Q(b)=0.6
        kl_a = (2 / 3) * math.log((2 / 3) / 0.4) + (1 / 3) * math.log((1 / 3) / 0.6)
        kl_b = 1.0 * math.log(1.0 / 0.6)
        assert out.loc["A", "n_tokens"] == 3
        assert out.loc["B", "n_tokens"] == 2
        assert abs(out.loc["A", "kl_divergence"] - kl_a) < 1e-8
        assert abs(out.loc["B", "kl_divergence"] - kl_b) < 1e-8

    def test_identical_sources_zero(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"source": ["A", "B"], "text": ["x y z", "x y z"]})
        )
        out = T.source_kl_drift(df, round_to=9).toPandas()
        assert (out["kl_divergence"].abs() < 1e-9).all()


class TestChunkDocuments:
    def test_overlapping_windows_cover_all_tokens(self, spark):
        text = " ".join(f"t{i}" for i in range(1, 11))  # 10 tokens
        df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [text]}))
        out = (
            T.chunk_documents(df, chunk_tokens=4, stride=3)
            .toPandas()
            .sort_values("chunk_index")
        )
        # n=10, extra=ceil(6/3)=2 -> starts 1, 4, 7
        assert list(out["chunk_index"]) == [0, 1, 2]
        assert list(out["chunk_text"]) == [
            "t1 t2 t3 t4",
            "t4 t5 t6 t7",
            "t7 t8 t9 t10",
        ]
        assert list(out["n_chunk_tokens"]) == [4, 4, 4]

    def test_short_final_chunk_and_edge_cases(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [0, 1, 2],
                    "text": [" ".join(f"t{i}" for i in range(1, 11)), "solo", ""],
                }
            )
        )
        out = T.chunk_documents(df, chunk_tokens=4, stride=4).toPandas()
        d0 = out[out.doc_id == 0].sort_values("chunk_index")
        # disjoint: starts 1, 5, 9 -> sizes 4, 4, 2
        assert list(d0["n_chunk_tokens"]) == [4, 4, 2]
        assert list(d0["chunk_text"])[-1] == "t9 t10"
        d1 = out[out.doc_id == 1]
        assert list(d1["chunk_text"]) == ["solo"]
        assert len(out[out.doc_id == 2]) == 0  # empty doc -> no chunks

    def test_stride_validation(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["a"]}))
        import pytest

        with pytest.raises(ValueError):
            T.chunk_documents(df, chunk_tokens=4, stride=5)
        with pytest.raises(ValueError):
            T.chunk_documents(df, chunk_tokens=0)


class TestNormalizeText:
    def test_all_steps(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.text import normalize_text

        df = spark.createDataFrame(
            pd.DataFrame({"text": ["  Hello,\x07  WORLD!?\n\ttabs  "]})
        )
        got = normalize_text(df, strip_punct=True).collect()[0].text
        assert got == "hello world tabs"

    def test_selective_flags_and_out_column(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.text import normalize_text

        df = spark.createDataFrame(pd.DataFrame({"text": ["A  B"]}))
        r = normalize_text(df, lowercase=False, out="norm").collect()[0]
        assert r.text == "A  B" and r.norm == "A B"


class TestTokenWeightScore:
    def test_sigmoid_of_weight_sum(self, spark):
        import math

        import pandas as pd
        import pytest

        from pd_utils_spark.extensions.text import token_weight_score

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "text": ["good great excellent", "spam junk spam", ""],
                }
            )
        )
        w = spark.createDataFrame(
            pd.DataFrame(
                {
                    "token": ["good", "great", "excellent", "spam", "junk"],
                    "weight": [1.0, 1.5, 2.0, -2.0, -1.0],
                }
            )
        )
        out = {r.doc_id: r for r in token_weight_score(docs, w).collect()}
        sig = lambda z: 1 / (1 + math.exp(-z))
        assert out[1].quality_score == pytest.approx(sig(4.5))
        assert out[1].n_scored_tokens == 3
        assert out[2].quality_score == pytest.approx(sig(-5.0))
        assert out[3].quality_score == pytest.approx(0.5)  # no tokens
        assert out[3].n_scored_tokens == 0

    def test_bias_and_oov(self, spark):
        import math

        import pandas as pd
        import pytest

        from pd_utils_spark.extensions.text import token_weight_score

        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "text": ["totally unknown words"]})
        )
        w = spark.createDataFrame(
            pd.DataFrame({"token": ["x"], "weight": [9.9]})
        )
        r = token_weight_score(docs, w, bias=2.0).collect()[0]
        assert r.n_scored_tokens == 0  # all OOV
        assert r.quality_score == pytest.approx(1 / (1 + math.exp(-2.0)))


class TestPerplexityBuckets:
    def test_terciles_per_group_and_head_is_most_fluent(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.text import perplexity_buckets

        # 6 docs per lang with STRICTLY distinct fluency: doc i mixes
        # (6 - i) corpus-common tokens with i one-off tokens, so
        # logprob_mean strictly decreases in i (ties would make
        # interpolated terciles legitimately lumpy)
        rows = []
        for lang in ("en", "de"):
            for i in range(6):
                toks = ["thecommon"] * (6 - i) + [
                    f"rare{lang}{i}x{j}" for j in range(i)
                ]
                rows.append((f"{lang}{i}", lang, i, " ".join(toks)))
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "lang", "i", "text"])
        ).drop("i")
        out = perplexity_buckets(df, bycol="lang").toPandas()
        assert len(out) == 12
        out["i"] = out.doc_id.str[-1].astype(int)
        for lang, sub in out.groupby("lang"):
            counts = sub.bucket.value_counts()
            # 6 distinct scores -> exactly 2 per tercile
            assert counts.get("head", 0) == 2
            assert counts.get("middle", 0) == 2
            assert counts.get("tail", 0) == 2
            # every head doc beats every tail doc on fluency
            assert (
                sub[sub.bucket == "head"].perplexity.max()
                <= sub[sub.bucket == "tail"].perplexity.min()
            )
            # the common-token-heavy docs are the head
            assert set(sub[sub.bucket == "head"].i) == {0, 1}
            assert set(sub[sub.bucket == "tail"].i) == {4, 5}

    def test_no_bycol_buckets_globally(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.text import perplexity_buckets

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "text": ["a a a a", "a a b b", "x y z w"],
                }
            )
        )
        out = perplexity_buckets(df).toPandas().set_index("doc_id")
        assert out.loc[1].bucket == "head"
        assert out.loc[3].bucket == "tail"


class TestTopNgrams:
    def test_counts_and_ordering(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.text import top_ngrams

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "text": [
                        "all rights reserved all rights reserved",
                        "ALL   Rights  reserved",  # normalization collapses
                        "totally different words here",
                    ],
                }
            )
        )
        out = top_ngrams(docs, n=3, k=5).toPandas()
        top = out.iloc[0]
        # doc1 has the trigram twice, doc2 once
        assert top.ngram == "all rights reserved"
        assert top.n_occurrences == 3
        assert top.n_docs == 2
        # deterministic tie-break: equal-count grams sort by text
        ties = out[out.n_occurrences == 1]
        assert list(ties.ngram) == sorted(ties.ngram)

    def test_short_and_empty_docs_contribute_nothing(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.text import top_ngrams

        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2, 3], "text": ["one two", "", "   "]})
        )
        assert top_ngrams(docs, n=3, k=10).count() == 0
        # unigrams still work
        uni = top_ngrams(docs, n=1, k=10).toPandas()
        assert set(uni.ngram) == {"one", "two"}


class TestCharStats:
    def test_signals(self, spark):
        import math

        import pandas as pd

        from pd_utils_spark.extensions.text import char_stats

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3, 4],
                    "text": [
                        "aaaa",                       # zero entropy
                        "ab",                         # 1 bit/char
                        "café ��",     # non-ascii + U+FFFD x2
                        "dÃ©jÃ  vu â€œ",  # mojibake
                    ],
                }
            )
        )
        out = {r.doc_id: r for r in char_stats(docs).collect()}
        assert out[1].prefix_entropy == 0.0
        assert out[1].ascii_ratio == 1.0
        assert abs(out[2].prefix_entropy - 1.0) < 1e-9
        assert out[3].replacement_chars == 2
        assert out[3].ascii_ratio < 1.0
        # 'Ã©', 'Ã ', 'â€œ' -> three artifacts
        assert out[4].mojibake_hits == 3

    def test_entropy_prefix_bound(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.text import char_stats

        # entropy computed on the first 4 chars only: 'abab' -> 1 bit,
        # the z-tail outside the prefix must not contribute
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "text": ["abab" + "z" * 100]})
        )
        r = char_stats(docs, entropy_prefix_chars=4).collect()[0]
        assert abs(r.prefix_entropy - 1.0) < 1e-9
        assert r.n_chars == 104


class TestTermBlocklist:
    def test_word_boundary_case_and_phrase(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.text import term_blocklist_filter

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3, 4],
                    "text": [
                        "this Classic essay",          # no: substring only
                        "a class on history",          # yes: whole word
                        "first class and CLASS again", # two hits
                        "bad  phrase spans   spaces",  # phrase w/ ws run
                    ],
                }
            )
        )
        ann = term_blocklist_filter(
            docs, ["class", "bad phrase"], drop=False
        ).toPandas().set_index("doc_id")
        assert ann.loc[1].blocklist_hits == 0 and not ann.loc[1].blocked
        assert ann.loc[2].blocklist_hits == 1
        assert ann.loc[3].blocklist_hits == 2
        assert ann.loc[4].blocklist_hits == 1
        kept = sorted(
            r.doc_id
            for r in term_blocklist_filter(docs, ["class", "bad phrase"]).collect()
        )
        assert kept == [1]

    def test_empty_terms_raise(self, spark):
        import pandas as pd
        import pytest as _pytest

        from pd_utils_spark.extensions.text import term_blocklist_filter

        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "text": ["x"]})
        )
        with _pytest.raises(ValueError, match="non-empty"):
            term_blocklist_filter(docs, ["", "  "])


class TestClusterTopTerms:
    def test_ctfidf_labels_and_stopword_self_elimination(self, spark):
        from pd_utils_spark.extensions.text import cluster_top_terms

        rows = [
            (0, "apple banana apple fruit market the the"),
            (0, "apple fruit juice the"),
            (1, "rocket engine thrust the"),
            (1, "rocket fuel engine launch the"),
        ]
        df = spark.createDataFrame(rows, ["cluster", "text"])
        out = cluster_top_terms(df, top_k=2, min_count=1)
        got = {(r.cluster, r.rank): (r.term, r["count"]) for r in out.collect()}
        assert got[(0, 1)] == ("apple", 3)
        assert got[(0, 2)] == ("fruit", 2)
        assert got[(1, 1)] == ("engine", 2)
        assert got[(1, 2)] == ("rocket", 2)
        # "the" is in every cluster -> score 0, never outranks real terms
        terms = {r.term for r in out.collect()}
        assert "the" not in terms

    def test_min_count_and_null_cluster(self, spark):
        from pd_utils_spark.extensions.text import cluster_top_terms

        df = spark.createDataFrame(
            [(0, "solo word word"), (None, "ghost ghost ghost")],
            "cluster int, text string",
        )
        out = cluster_top_terms(df, top_k=5, min_count=2).collect()
        assert {r.term for r in out} == {"word"}

    def test_validation(self, spark):
        from pd_utils_spark.extensions.text import cluster_top_terms

        df = spark.createDataFrame([(0, "x")], ["cluster", "text"])
        import pytest as _pt

        with _pt.raises(ValueError):
            cluster_top_terms(df, top_k=0)


# ----------------------------------------------------- phrase_search

def test_phrase_search_counts_overlaps_and_boundaries(spark):
    from pd_utils_spark.extensions.text import phrase_search

    df = spark.createDataFrame(
        [
            (1, "the Hash  JOIN wins"),          # normalization hit
            (2, "rehash joint venture"),          # substring, NOT a token hit
            (3, "a a a"),                         # overlapping occurrences
            (4, "hash"),                          # shorter than the phrase
            (5, "x hash join y hash join"),       # two disjoint hits
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(df, "Hash Join").collect()
    }
    assert got == {1: (1, 2), 5: (2, 2)}
    over = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(df, "a a").collect()
    }
    assert over[3] == (2, 1)


def test_phrase_search_single_token_and_empty_phrase(spark):
    from pd_utils_spark.extensions.text import phrase_search

    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "gamma")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(df, "alpha").collect()
    }
    assert got == {1: (2, 1)}
    with pytest.raises(ValueError, match="phrase"):
        phrase_search(df, "   ")


# ----------------------------------------------------- pmi_collocations

def test_pmi_collocations_matches_reference(spark):
    import collections
    import math

    from pd_utils_spark.extensions.text import pmi_collocations

    texts = [
        "new york is a big city",
        "new york city has a new mayor",
        "a big apple in new york",
        "the mayor of the city",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    uni = collections.Counter()
    bi = collections.Counter()
    for t in texts:
        ws = t.split()
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    nu = sum(uni.values())
    nb = sum(bi.values())
    got = pmi_collocations(df, min_count=2, k=10).collect()
    assert [r["w1"] + " " + r["w2"] for r in got] == sorted(
        [f"{a} {b}" for (a, b), c in bi.items() if c >= 2],
        key=lambda p: (
            -math.log(
                (bi[tuple(p.split())] / nb)
                / ((uni[p.split()[0]] / nu) * (uni[p.split()[1]] / nu))
            ),
            p,
        ),
    )
    for r in got:
        a, b = r["w1"], r["w2"]
        ref = math.log(
            (bi[(a, b)] / nb) / ((uni[a] / nu) * (uni[b] / nu))
        )
        assert r["pmi"] == pytest.approx(ref, rel=1e-9)
        assert r["n_pair"] == bi[(a, b)]
        assert r["n_w1"] == uni[a] and r["n_w2"] == uni[b]


class TestReadability:
    def test_hand_computed(self, spark):
        from pd_utils_spark.extensions.text import readability

        df = spark.createDataFrame(
            [(1, "The cat sat. The dog ran!"), (2, ""), (3, "   "),
             (4, "xyzzy 123 bcd")],
            ["doc_id", "text"],
        )
        got = {r.doc_id: r for r in readability(df).collect()}
        r1 = got[1]
        # 6 words, 2 sentences, 6 single-vowel-run words
        assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (6, 2, 6)
        wps, spw = 6 / 2, 6 / 6
        assert r1.flesch_ease == pytest.approx(206.835 - 1.015 * wps - 84.6 * spw)
        assert r1.fk_grade == pytest.approx(0.39 * wps + 11.8 * spw - 15.59)
        for empty in (2, 3):
            r = got[empty]
            assert (r.n_words, r.n_sentences, r.n_syllables) == (0, 0, 0)
            assert r.flesch_ease is None and r.fk_grade is None
        # 'xyzzy' = 2 y-runs, '123' floors to 1, 'bcd' floors to 1
        assert got[4].n_syllables == 4 and got[4].n_sentences == 1

    def test_simple_vs_complex_ordering(self, spark):
        from pd_utils_spark.extensions.text import readability

        simple = "I like tea. You like me. We sit here."
        complex_ = (
            "Notwithstanding institutional heterogeneity considerations, "
            "multidimensional organizational restructuring necessitates "
            "comprehensive infrastructural reconceptualization."
        )
        df = spark.createDataFrame(
            [(1, simple), (2, complex_)], ["doc_id", "text"]
        )
        got = {r.doc_id: r for r in readability(df).collect()}
        assert got[1].flesch_ease > got[2].flesch_ease
        assert got[1].fk_grade < got[2].fk_grade


class TestFeatureHashing:
    def test_deterministic_sparse_and_zero_vector(self, spark):
        from pd_utils_spark.extensions.text import feature_hashing

        df = spark.createDataFrame(
            [(1, "apple banana apple"), (2, "apple banana apple"),
             (3, ""), (4, "Apple BANANA apple")],
            ["doc_id", "text"],
        )
        got = {r.doc_id: r.features for r in feature_hashing(df, dim=8).collect()}
        # identical text -> identical vector; case-insensitive
        assert got[1] == got[2] == got[4]
        assert got[3] == [0.0] * 8
        assert len(got[1]) == 8
        # "apple" appears twice with one sign: some |component| == 2
        assert max(abs(v) for v in got[1]) == 2.0
        # total signed mass is bounded by token count
        assert sum(abs(v) for v in got[1]) <= 3.0

    def test_bucket_arithmetic_matches_hash31(self, spark):
        from pyspark.sql import functions as F

        from pd_utils_spark.extensions.sampling import _hash31
        from pd_utils_spark.extensions.text import feature_hashing

        tok = "gamma"
        h = (
            spark.range(1)
            .select(_hash31(F.concat(F.lit(tok), F.lit(":fh"))).alias("h"))
            .collect()[0]
            .h
        )
        b, sgn = h % 8, 1.0 if (h // 8) % 2 == 0 else -1.0
        df = spark.createDataFrame([(1, tok)], ["doc_id", "text"])
        vec = feature_hashing(df, dim=8).collect()[0].features
        assert vec[b] == sgn
        assert sum(abs(v) for v in vec) == 1.0

    def test_validation(self, spark):
        from pd_utils_spark.extensions.text import feature_hashing

        df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="dim"):
            feature_hashing(df, dim=0)


class TestZipfFit:
    def test_exact_powerlaw_recovers_slope(self, spark):
        import math

        from pd_utils_spark.extensions.text import zipf_fit

        # counts EXACTLY c_r = round(1000 / r): near-perfect Zipf
        rows = []
        for r in range(1, 30):
            tok = f"tok{r:03d}"
            rows += [(tok + " ",)] * round(1000 / r)
        df = spark.createDataFrame(
            [(" ".join(t[0] for t in rows),)], ["text"]
        )
        r_ = zipf_fit(df).collect()[0]
        assert r_.n_types == 29
        assert r_.slope == pytest.approx(-1.0, abs=0.05)
        assert r_.r2 > 0.99

    def test_uniform_corpus_flat_slope_and_counts(self, spark):
        from pd_utils_spark.extensions.text import zipf_fit

        # every type appears exactly 5 times: ln(freq) constant ->
        # slope 0, r2 null (zero y-variance)
        text = " ".join(f"w{i}" for i in range(20)) + " "
        df = spark.createDataFrame([(text * 5,)], ["text"])
        r = zipf_fit(df).collect()[0]
        assert r.n_types == 20 and r.n_tokens == 100
        assert r.slope == pytest.approx(0.0, abs=1e-12)
        assert r.r2 is None

    def test_min_count_and_validation(self, spark):
        from pd_utils_spark.extensions.text import zipf_fit

        df = spark.createDataFrame(
            [("a a a b b c",)], ["text"]
        )
        r = zipf_fit(df, min_count=2).collect()[0]
        assert r.n_types == 2  # 'c' filtered
        with pytest.raises(ValueError, match="min_count"):
            zipf_fit(df, min_count=0)
