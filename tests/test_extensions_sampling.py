"""Golden tests for deterministic sampling/splitting/mixing operators
(pd_utils_spark/extensions/sampling.py)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pd_utils_spark.extensions import sampling as S

DOCS = pd.DataFrame(
    {
        "doc_id": list(range(200)),
        "source": ["web"] * 120 + ["books"] * 60 + ["code"] * 20,
        "n_tokens": [(7 * i) % 50 + 1 for i in range(200)],
        "text": [f"document number {i} with some words" for i in range(200)],
    }
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS)


class TestHashSplit:
    def test_deterministic_and_partitioning_invariant(self, docs):
        a = {r.doc_id: r.split for r in S.hash_split(docs, seed=1).collect()}
        b = {
            r.doc_id: r.split
            for r in S.hash_split(docs.repartition(7), seed=1).collect()
        }
        assert a == b

    def test_covers_all_rows_with_given_labels(self, docs):
        out = S.hash_split(docs, weights={"train": 8, "val": 1, "test": 1}, seed=0)
        counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == 200
        assert set(counts) <= {"train", "val", "test"}
        assert counts["train"] > counts.get("val", 0)

    def test_seed_changes_assignment(self, docs):
        a = {r.doc_id: r.split for r in S.hash_split(docs, seed=0).collect()}
        b = {r.doc_id: r.split for r in S.hash_split(docs, seed=99).collect()}
        assert a != b

    def test_bad_weights_raise(self, docs):
        with pytest.raises(ValueError):
            S.hash_split(docs, weights={"a": -1, "b": 2})


class TestStratifiedSample:
    def test_scalar_fraction_subset(self, docs):
        kept = S.stratified_sample(docs, 0.5, seed=3).collect()
        assert 0 < len(kept) < 200
        # a kept row is kept again under the same seed (pure function)
        again = S.stratified_sample(docs, 0.5, seed=3).collect()
        assert sorted(r.doc_id for r in kept) == sorted(r.doc_id for r in again)

    def test_per_stratum_rates(self, docs):
        out = S.stratified_sample(
            docs, {"web": 0.0, "books": 1.0}, strata="source", seed=0
        )
        got = out.groupBy("source").agg(F.count("*").alias("n")).collect()
        by = {r.source: r.n for r in got}
        assert by == {"books": 60}  # web rate 0, code absent from map -> dropped

    def test_mapping_requires_strata(self, docs):
        with pytest.raises(ValueError):
            S.stratified_sample(docs, {"web": 0.5})


class TestInterleaveSources:
    def test_mix_approaches_target_and_scarce_source_kept_whole(self, docs):
        out = S.interleave_sources(
            docs, {"web": 1, "books": 1, "code": 1}, seed=0
        )
        by = {
            r.source: r.n
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        # code is scarcest (20 rows at weight 1/3): kept in full
        assert by["code"] == 20
        # web/books downsampled toward ~20 each (hash-binomial tolerance)
        assert by["web"] < 120 and by["books"] < 60
        assert abs(by["web"] - 20) <= 12 and abs(by["books"] - 20) <= 12

    def test_unlisted_sources_dropped(self, docs):
        out = S.interleave_sources(docs, {"books": 1.0}, seed=0)
        assert set(r.source for r in out.select("source").distinct().collect()) == {"books"}


class TestSampleNPerGroup:
    def test_exact_n(self, docs):
        out = S.sample_n_per_group(docs, 5, by="source", seed=0)
        by = {
            r.source: r.n
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert by == {"web": 5, "books": 5, "code": 5}

    def test_small_group_kept_whole(self, docs):
        out = S.sample_n_per_group(docs, 1000, by="source", seed=0)
        assert out.count() == 200


class TestDecontaminate:
    def test_overlapping_docs_removed(self, spark):
        corpus = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [0, 1, 2],
                    "text": [
                        "alpha beta gamma delta epsilon",
                        "totally unrelated training text here",
                        "zeta eta theta iota kappa",
                    ],
                }
            )
        )
        bench = spark.createDataFrame(
            pd.DataFrame({"text": ["alpha beta gamma delta epsilon and more"]})
        )
        kept = sorted(
            r.doc_id for r in S.decontaminate(corpus, bench, n=3).collect()
        )
        assert kept == [1, 2]

    def test_flag_mode_keeps_rows(self, spark):
        corpus = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0, 1], "text": ["a b c d", "e f g h"]})
        )
        bench = spark.createDataFrame(pd.DataFrame({"text": ["a b c d"]}))
        out = {r.doc_id: r.contaminated for r in S.decontaminate(corpus, bench, n=3, mode="flag").collect()}
        assert out == {0: True, 1: False}


class TestPackChunks:
    def test_chunks_respect_budget_layout(self, docs):
        out = S.pack_chunks(docs, budget=100, buckets=4).collect()
        # chunk of each doc = floor(exclusive cumsum / budget) within its bucket:
        # verify by replaying the layout in python
        rows = sorted(out, key=lambda r: (r.bucket, r.chunk_id))
        from collections import defaultdict

        per_bucket = defaultdict(list)
        for r in out:
            per_bucket[r.bucket].append(r)
        total = 0
        for b, rs in per_bucket.items():
            # reconstruct hash order: chunk ids must be non-decreasing with
            # exclusive cumsum — check totals instead of order internals
            tokens = sum(r.n_tokens for r in rs)
            max_chunk = max(r.chunk_id for r in rs)
            assert max_chunk <= tokens // 100 + 1
            total += len(rs)
        assert total == 200

    def test_deterministic_under_repartition(self, docs):
        a = {(r.doc_id): (r.bucket, r.chunk_id) for r in S.pack_chunks(docs, budget=64).collect()}
        b = {
            (r.doc_id): (r.bucket, r.chunk_id)
            for r in S.pack_chunks(docs.repartition(13), budget=64).collect()
        }
        assert a == b


class TestPackSequences:
    def test_accounting_and_membership(self, docs):
        seqs = S.pack_sequences(
            docs, textcol="text", token_col="n_tokens", budget=100, buckets=4
        ).collect()
        assert sum(r.n_docs for r in seqs) == 200
        assert sum(r.total_tokens for r in seqs) == sum(
            (7 * i) % 50 + 1 for i in range(200)
        )
        for r in seqs:
            assert len(r.seq_text.split("\n")) == r.n_docs

    def test_order_matches_chunk_layout(self, docs):
        chunks = S.pack_chunks(docs, token_col="n_tokens", budget=100, buckets=4)
        seqs = {
            (r.bucket, r.chunk_id): r.seq_text
            for r in S.pack_sequences(
                docs, token_col="n_tokens", budget=100, buckets=4
            ).collect()
        }
        # every doc's text appears in the sequence of its assigned chunk
        for r in chunks.collect():
            assert f"document number {r.doc_id} " in seqs[(r.bucket, r.chunk_id)]


class TestNullIdPropagation:
    def test_null_id_gets_else_label_and_falls_out_of_samples(self, spark):
        pdf = pd.DataFrame({"doc_id": [1.0, None], "x": [1, 2]})
        df = spark.createDataFrame(pdf)
        splits = {r.x: r.split for r in S.hash_split(df, idcol="doc_id", weights={"a": 1, "b": 1}).collect()}
        assert splits[2] == "b"  # NULL fraction -> ELSE label, like the SQL CASE
        kept = S.stratified_sample(df, 0.9999, idcol="doc_id").collect()
        assert all(r.doc_id is not None for r in kept)  # NULL < rate is NULL -> dropped


class TestTakeTokenBudget:
    def test_budget_cut_is_deterministic_and_reaches_budget(self, spark):
        import pandas as pd
        from pd_utils_spark.extensions.sampling import take_token_budget

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": list(range(20)),
                    "text": ["word " * 10] * 20,  # 10 tokens each
                }
            )
        )
        out = take_token_budget(df, budget=35, textcol="text")
        ids1 = sorted(r.doc_id for r in out.collect())
        # 10 tokens/doc: kept while before < 35 -> exactly 4 docs (40 tokens)
        assert len(ids1) == 4
        ids2 = sorted(
            r.doc_id
            for r in take_token_budget(
                df.repartition(7), budget=35, textcol="text"
            ).collect()
        )
        assert ids1 == ids2  # partitioning-independent

    def test_per_group_budget(self, spark):
        import pandas as pd
        from pd_utils_spark.extensions.sampling import take_token_budget

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": list(range(10)),
                    "source": ["a"] * 5 + ["b"] * 5,
                    "text": ["t t t t"] * 10,  # 4 tokens each
                }
            )
        )
        out = take_token_budget(df, budget=6, byvars="source").collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r.source, []).append(r.doc_id)
        assert len(by_src["a"]) == 2 and len(by_src["b"]) == 2

    def test_budget_zero_and_validation(self, spark):
        import pandas as pd
        import pytest as _pytest
        from pd_utils_spark.extensions.sampling import take_token_budget

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "text": ["x"]})
        )
        assert take_token_budget(df, budget=0).count() == 0
        with _pytest.raises(ValueError, match="budget"):
            take_token_budget(df, budget=-1)


class TestWeightedSample:
    def test_deterministic_and_sized(self, spark):
        import pandas as pd
        from pd_utils_spark.extensions.sampling import weighted_sample

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": list(range(100)), "w": [1.0] * 100})
        )
        a = sorted(r.doc_id for r in weighted_sample(df, 10, "w", seed=3).collect())
        b = sorted(r.doc_id for r in weighted_sample(df, 10, "w", seed=3).collect())
        assert a == b and len(a) == 10
        c = sorted(r.doc_id for r in weighted_sample(df, 10, "w", seed=4).collect())
        assert a != c  # a different seed draws a different sample

    def test_weight_bias(self, spark):
        import pandas as pd
        from pd_utils_spark.extensions.sampling import weighted_sample

        # 50 heavy rows (w=100) vs 150 light rows (w=1): a 30-row draw
        # should be dominated by heavy rows (each heavy row's key
        # u^(1/100) ~ 1 while light keys are spread over [0, 1))
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": list(range(200)),
                    "w": [100.0] * 50 + [1.0] * 150,
                }
            )
        )
        picked = [r.doc_id for r in weighted_sample(df, 30, "w", seed=0).collect()]
        heavy = sum(1 for d in picked if d < 50)
        assert heavy >= 25

    def test_null_and_nonpositive_weights_excluded(self, spark):
        import pandas as pd
        import pytest as _pytest
        from pd_utils_spark.extensions.sampling import weighted_sample

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2, 3], "w": [0.0, -1.0, None]})
        )
        assert weighted_sample(df, 3, "w").count() == 0
        with _pytest.raises(ValueError, match="n must"):
            weighted_sample(df, 0, "w")


class TestKfoldSplit:
    def test_partition_and_determinism(self, spark):
        import pandas as pd
        import pytest as _pytest

        from pd_utils_spark.extensions.sampling import kfold_split

        df = spark.createDataFrame(pd.DataFrame({"doc_id": range(500)}))
        out = kfold_split(df, k=5, seed=1).toPandas()
        assert len(out) == 500
        assert set(out.fold) == {0, 1, 2, 3, 4}
        by = out.groupby("fold").size()
        assert by.min() > 50  # roughly balanced
        # same (id, seed) -> same fold; different seed reshuffles
        again = kfold_split(df, k=5, seed=1).toPandas()
        assert (out.sort_values("doc_id").fold.values
                == again.sort_values("doc_id").fold.values).all()
        other = kfold_split(df, k=5, seed=9).toPandas()
        assert (out.sort_values("doc_id").fold.values
                != other.sort_values("doc_id").fold.values).any()
        with _pytest.raises(ValueError, match="k must"):
            kfold_split(df, k=1)


class TestFilterTopFraction:
    def _scored(self, spark):
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": range(10),
                    "g": ["a"] * 6 + ["b"] * 4,
                    "score": [5.0, 3.0, 9.0, 1.0, 7.0, 7.0, 2.0, 8.0, 8.0, 4.0],
                }
            )
        )

    def test_per_group_ceil_contract(self, spark):
        from pd_utils_spark.extensions.sampling import filter_top_fraction

        out = filter_top_fraction(self._scored(spark), "score", 0.5, by="g").toPandas()
        by = out.groupby("g").size()
        assert by["a"] == 3 and by["b"] == 2  # ceil(6*.5), ceil(4*.5)
        # the kept rows really are the top scores (ties -> smaller id)
        a = set(out[out.g == "a"].doc_id)
        assert a == {2, 4, 5}  # scores 9, 7, 7
        b = set(out[out.g == "b"].doc_id)
        assert b == {7, 8}  # scores 8, 8 (tie kept over 4)

    def test_global_and_edges(self, spark):
        import pytest as _pytest

        from pd_utils_spark.extensions.sampling import filter_top_fraction

        df = self._scored(spark)
        assert filter_top_fraction(df, "score", 1.0).count() == 10
        assert filter_top_fraction(df, "score", 0.0).count() == 0
        # ascending keeps the LOWEST scores
        low = filter_top_fraction(df, "score", 0.1, ascending=True).toPandas()
        assert set(low.doc_id) == {3}  # score 1.0
        with _pytest.raises(ValueError, match="frac"):
            filter_top_fraction(df, "score", 1.5)


class TestTemperatureMix:
    def _skewed(self, spark):
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": list(range(500)),
                    "source": ["head"] * 400 + ["tail"] * 100,
                }
            )
        )

    def test_alpha_one_keeps_everything(self, spark):
        from pd_utils_spark.extensions.sampling import temperature_mix

        assert temperature_mix(self._skewed(spark), alpha=1.0).count() == 500

    def test_alpha_zero_equalizes_toward_smallest(self, spark):
        from pd_utils_spark.extensions.sampling import temperature_mix

        out = temperature_mix(self._skewed(spark), alpha=0.0).toPandas()
        by = out.groupby("source").size()
        # smallest source keeps everything; head tempered to ~n_min
        assert by["tail"] == 100
        assert 60 <= by["head"] <= 140

    def test_intermediate_alpha_monotone_and_deterministic(self, spark):
        from pd_utils_spark.extensions.sampling import temperature_mix

        df = self._skewed(spark)
        n0 = temperature_mix(df, alpha=0.0).count()
        n5 = temperature_mix(df, alpha=0.5).count()
        n1 = temperature_mix(df, alpha=1.0).count()
        assert n0 < n5 < n1
        # bit-reproducible: same (data, alpha, seed) -> same rows
        a = sorted(r.doc_id for r in temperature_mix(df, alpha=0.5, seed=9).collect())
        b = sorted(r.doc_id for r in temperature_mix(df, alpha=0.5, seed=9).collect())
        assert a == b

    def test_alpha_validated(self, spark):
        import pytest as _pytest

        from pd_utils_spark.extensions.sampling import temperature_mix

        with _pytest.raises(ValueError, match="alpha"):
            temperature_mix(self._skewed(spark), alpha=1.5)

    def test_null_source_rows_survive(self, spark):
        """NULL sources form their own group (null-safe rejoin):
        alpha=1 keeps EVERY row, NULL-source rows included."""
        import pandas as pd

        from pd_utils_spark.extensions.sampling import temperature_mix

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": list(range(300)),
                    "source": ["a"] * 200 + ["b"] * 80 + [None] * 20,
                }
            )
        )
        full = temperature_mix(df, alpha=1.0).toPandas()
        assert len(full) == 300
        assert full["source"].isna().sum() == 20
        # alpha=0: NULL group is the smallest (20) and keeps everything
        eq = temperature_mix(df, alpha=0.0).toPandas()
        assert eq["source"].isna().sum() == 20


class TestContaminationReport:
    def test_per_item_fractions(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.sampling import contamination_report

        corpus = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2],
                    "text": [
                        "alpha beta gamma delta epsilon zeta",
                        "nothing in common here at all",
                    ],
                }
            )
        )
        bench = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [100, 101],
                    "text": [
                        "alpha beta gamma delta",  # 2 of 2 3-grams leak
                        "totally novel benchmark item",
                    ],
                }
            )
        )
        got = {
            r.doc_id: r
            for r in contamination_report(corpus, bench, n=3).collect()
        }
        assert got[100].n_grams == 2 and got[100].n_matched == 2
        assert got[100].match_frac == 1.0 and got[100].n_corpus_docs == 1
        assert got[101].n_matched == 0 and got[101].match_frac == 0.0

    def test_partial_leak(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.sampling import contamination_report

        corpus = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "text": ["alpha beta gamma x y z"]})
        )
        bench = spark.createDataFrame(
            pd.DataFrame({"doc_id": [9], "text": ["alpha beta gamma totally new tail"]})
        )
        r = contamination_report(corpus, bench, n=3).collect()[0]
        # bench has 4 distinct 3-grams, exactly 1 appears in the corpus
        assert r.n_grams == 4 and r.n_matched == 1
        assert r.match_frac == 0.25


class TestRepeatSources:
    def test_integer_fractional_zero_and_default_factors(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.sampling import repeat_sources

        rows = []
        for i in range(40):
            rows.append((i, ["a", "b", "c", "d"][i % 4]))
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source"]))
        out = repeat_sources(
            df, {"a": 2.0, "b": 1.5, "c": 0.0}, seed=3
        ).toPandas()
        per = out.groupby("source").size().to_dict()
        assert per["a"] == 20            # 10 rows x 2 exact
        assert 10 <= per["b"] <= 20      # 10 x 1.5 +- hash noise
        assert "c" not in per            # dropped
        assert per["d"] == 10            # default factor 1.0
        # epochs are 0-based and contiguous per row
        a_epochs = out[out.source == "a"].groupby("doc_id").epoch.apply(
            lambda s: sorted(s)
        )
        assert all(e == [0, 1] for e in a_epochs)

    def test_deterministic_across_runs(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.sampling import repeat_sources

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(30), "source": ["x"] * 30})
        )
        r1 = sorted(
            (r.doc_id, r.epoch)
            for r in repeat_sources(df, {"x": 1.5}, seed=7).collect()
        )
        r2 = sorted(
            (r.doc_id, r.epoch)
            for r in repeat_sources(df, {"x": 1.5}, seed=7).collect()
        )
        assert r1 == r2
        # different seed -> different extra-copy subset (overwhelmingly)
        r3 = sorted(
            (r.doc_id, r.epoch)
            for r in repeat_sources(df, {"x": 1.5}, seed=8).collect()
        )
        assert r1 != r3

    def test_negative_factor_raises(self, spark):
        import pandas as pd
        import pytest as _pytest

        from pd_utils_spark.extensions.sampling import repeat_sources

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "source": ["x"]})
        )
        with _pytest.raises(ValueError, match=">= 0"):
            repeat_sources(df, {"x": -1.0})


class TestLengthBucketsAndPadding:
    def test_equal_count_buckets_and_monotone_lengths(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.sampling import length_buckets

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": range(12),
                    "text": [" ".join(["w"] * (i + 1)) for i in range(12)],
                }
            )
        )
        out = length_buckets(df, n_buckets=4).toPandas()
        sizes = out.groupby("bucket").size()
        assert sizes.tolist() == [3, 3, 3, 3]
        # buckets ordered by length: bucket i's max <= bucket i+1's min
        by = out.groupby("bucket").n_tokens
        mx, mn = by.max(), by.min()
        assert all(mx[b] <= mn[b + 1] for b in range(1, 4))

    def test_padding_efficiency_math_and_cap(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.sampling import padding_efficiency

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3, 4],
                    "text": [
                        "a",                      # 1 token
                        "a b c",                  # 3
                        " ".join(["x"] * 10),     # 10
                        " ".join(["y"] * 100),    # 100 -> capped to 8
                    ],
                }
            )
        )
        out = padding_efficiency(
            df, n_buckets=2, max_seq_len=8
        ).toPandas().set_index("bucket")
        # bucket 1 = lengths {1, 3}; bucket 2 = {10->8, 100->8}
        assert out.loc[1].max_len == 3 and out.loc[1].total_tokens == 4
        assert out.loc[1].padded_tokens == 6
        assert abs(out.loc[1].efficiency - 4 / 6) < 1e-6
        assert out.loc[2].max_len == 8 and out.loc[2].efficiency == 1.0


class TestSkyline2D:
    def _brute(self, pts, mx=True, my=True):
        def better(a, b):  # a dominates b
            ax, ay = (a[0] if mx else -a[0]), (a[1] if my else -a[1])
            bx, by = (b[0] if mx else -b[0]), (b[1] if my else -b[1])
            return ax >= bx and ay >= by and (ax > bx or ay > by)
        return sorted(p for p in pts if not any(better(q, p) for q in pts if q != p))

    def test_matches_brute_force(self, spark):
        import numpy as np
        rng = np.random.default_rng(21)
        pts = [(float(x), float(y)) for x, y in rng.integers(0, 30, (200, 2))]
        df = spark.createDataFrame(pts, "x double, y double")
        from pd_utils_spark.extensions import skyline_2d
        got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
        exp = self._brute(set(pts))
        # duplicates of frontier points all survive
        exp_with_dups = sorted(p for p in pts if tuple(p) in set(exp))
        assert got == exp_with_dups

    def test_minimize_direction(self, spark):
        pts = [(1.0, 1.0), (2.0, 2.0), (0.5, 3.0), (3.0, 0.4)]
        df = spark.createDataFrame(pts, "x double, y double")
        from pd_utils_spark.extensions import skyline_2d
        got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y", (False, False)).collect())
        assert got == self._brute(pts, mx=False, my=False)

    def test_duplicates_survive_and_nulls_excluded(self, spark):
        import pandas as pd
        df = spark.createDataFrame(
            pd.DataFrame({"x": [5.0, 5.0, 1.0, None], "y": [5.0, 5.0, 1.0, 9.0]})
        )
        from pd_utils_spark.extensions import skyline_2d
        got = [(r.x, r.y) for r in skyline_2d(df, "x", "y").collect()]
        assert got == [(5.0, 5.0), (5.0, 5.0)]


class TestPurgedKfold:
    def _df(self, spark, n=20):
        import datetime as dt

        rows = [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i))
            for i in range(n)
        ]
        return spark.createDataFrame(rows, ["id", "ts"])

    def test_equal_count_folds_and_roles(self, spark):
        from pyspark.sql import functions as F

        from pd_utils_spark.extensions.sampling import purged_kfold_split

        out = purged_kfold_split(
            self._df(spark), n_folds=4,
            embargo_seconds=2 * 3600, horizon_seconds=1.5 * 3600,
        )
        # every fold has exactly 5 rows
        sizes = {
            r.fold: r["count"]
            for r in out.filter(F.col("test_fold") == 0)
            .groupBy("fold").count().collect()
        }
        assert sizes == {0: 5, 1: 5, 2: 5, 3: 5}
        k1 = {r.id: r.role for r in out.filter(F.col("test_fold") == 1).collect()}
        assert all(k1[i] == "test" for i in range(5, 10))
        assert k1[4] == "purged"      # ts+1.5h reaches into the test span
        assert k1[3] == "train"
        assert k1[10] == "embargo" and k1[11] == "embargo"
        assert k1[12] == "train"

    def test_no_purge_no_embargo_degenerates_to_plain_time_folds(self, spark):
        from pyspark.sql import functions as F

        from pd_utils_spark.extensions.sampling import purged_kfold_split

        out = purged_kfold_split(self._df(spark), n_folds=4)
        roles = {r.role for r in out.collect()}
        assert roles == {"test", "train"}
        # long format: every row appears once per test fold
        assert out.count() == 20 * 4

    def test_tied_timestamps_share_fold(self, spark):
        import datetime as dt

        from pyspark.sql import functions as F

        from pd_utils_spark.extensions.sampling import purged_kfold_split

        t0 = dt.datetime(2024, 1, 1)
        rows = [(i, t0) for i in range(6)] + [
            (10 + i, t0 + dt.timedelta(hours=1 + i)) for i in range(6)
        ]
        df = spark.createDataFrame(rows, ["id", "ts"])
        out = purged_kfold_split(df, n_folds=3)
        folds = {
            r.id: r.fold
            for r in out.filter(F.col("test_fold") == 0).collect()
        }
        assert len({folds[i] for i in range(6)}) == 1  # all ties together

    def test_validation(self, spark):
        import pytest as _pt

        from pd_utils_spark.extensions.sampling import purged_kfold_split

        df = self._df(spark, 4)
        with _pt.raises(ValueError):
            purged_kfold_split(df, n_folds=1)
        with _pt.raises(ValueError):
            purged_kfold_split(df, embargo_seconds=-1)


class TestWalkForward:
    def test_roles_expand_with_split(self, spark):
        import datetime as dt

        from pyspark.sql import functions as F

        from pd_utils_spark.extensions.sampling import walk_forward_splits

        rows = [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i))
            for i in range(10)
        ]
        df = spark.createDataFrame(rows, ["id", "ts"])
        out = walk_forward_splits(df, n_splits=4)
        s2 = {r.id: r.role for r in out.filter(F.col("split") == 2).collect()}
        assert [s2[i] for i in range(10)] == (
            ["train"] * 4 + ["test"] * 2 + ["future"] * 4
        )
        s4 = {r.id: r.role for r in out.filter(F.col("split") == 4).collect()}
        assert [s4[i] for i in range(10)] == ["train"] * 8 + ["test"] * 2
        with __import__("pytest").raises(ValueError):
            walk_forward_splits(df, n_splits=0)


class TestGini:
    def test_bounds_and_reference(self, spark):
        import numpy as np

        from pd_utils_spark.extensions.sampling import gini_concentration

        eq = spark.createDataFrame([(i, 5.0) for i in range(10)], ["id", "v"])
        assert gini_concentration(eq, "v").collect()[0].gini == 0.0
        one = spark.createDataFrame(
            [(0, 100.0)] + [(i, 0.0) for i in range(1, 10)], ["id", "v"]
        )
        assert gini_concentration(one, "v").collect()[0].gini == (
            __import__("pytest").approx(0.9)
        )
        rng = np.random.RandomState(0)
        x = rng.exponential(1, 200).round(3)
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(x)], ["id", "v"]
        )
        got = gini_concentration(df, "v").collect()[0].gini
        xs = np.sort(x)
        n = len(xs)
        ref = (2 * np.sum(np.arange(1, n + 1) * xs)) / (n * xs.sum()) - (
            n + 1
        ) / n
        assert got == __import__("pytest").approx(ref, rel=1e-12)


class TestRfm:
    def test_bins_and_segment_string(self, spark):
        import datetime as dt

        from pd_utils_spark.extensions.sampling import rfm_segments

        ev = [
            (u, dt.datetime(2024, 1, 1) + dt.timedelta(hours=u * 3 + k),
             float(u + 1))
            for u in range(8)
            for k in range(u + 1)
        ]
        df = spark.createDataFrame(ev, ["user_id", "ts", "value"])
        out = {r.user_id: r for r in rfm_segments(df, n_bins=2).collect()}
        # users 0-3: older, rarer, cheaper -> 0-0-0; users 4-7 -> 1-1-1
        for u in range(4):
            assert out[u].segment == "0-0-0"
        for u in range(4, 8):
            assert out[u].segment == "1-1-1"
        assert out[7].frequency == 8 and out[7].monetary == 64.0
        assert out[7].recency_seconds == 0.0  # owns the corpus max ts


class TestExactNtile:
    def test_ties_share_bucket_and_nulls_pass(self, spark):
        from pd_utils_spark.plans.prefix import exact_ntile

        df = spark.createDataFrame(
            [(i, float(i // 5)) for i in range(20)] + [(99, None)],
            "id long, v double",
        )
        out = {r.id: r.bucket for r in exact_ntile(df, "v", 4).collect()}
        for i in range(20):
            assert out[i] == i // 5
        assert out[99] is None
        with __import__("pytest").raises(ValueError):
            exact_ntile(df, "v", 0)


class TestMixDiversity:
    def test_hand_computed_three_sources(self, spark):
        import math

        import pytest as _pt

        from pd_utils_spark.extensions.sampling import mix_diversity

        df = spark.createDataFrame(
            [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20, ["source"]
        )
        r = mix_diversity(df).collect()[0]
        shares = [0.5, 0.3, 0.2]
        h = -sum(s * math.log(s) for s in shares)
        assert r.n_groups == 3 and r.total == 100.0
        assert r.entropy == _pt.approx(h, rel=1e-12)
        assert r.effective_groups == _pt.approx(math.exp(h), rel=1e-12)
        assert r.hhi == _pt.approx(0.38)
        assert r.top_share == 0.5

    def test_uniform_mix_effective_equals_n(self, spark):
        import pytest as _pt

        from pd_utils_spark.extensions.sampling import mix_diversity

        df = spark.createDataFrame(
            [(f"s{i}",) for i in range(10) for _ in range(7)], ["source"]
        )
        r = mix_diversity(df).collect()[0]
        assert r.effective_groups == _pt.approx(10.0, rel=1e-9)
        assert r.hhi == _pt.approx(0.1, rel=1e-9)

    def test_weighted_and_null_excluded(self, spark):
        from pd_utils_spark.extensions.sampling import mix_diversity

        df = spark.createDataFrame(
            [("a", 99), ("b", 1), (None, 1000)],
            "source string, w long",
        )
        r = mix_diversity(df, weightcol="w").collect()[0]
        assert r.n_groups == 2 and r.total == 100.0 and r.top_share == 0.99


class TestNegativePairs:
    def test_deterministic_uniform_and_no_self_pairs(self, spark):
        from pd_utils_spark.extensions.sampling import negative_pairs

        df = spark.createDataFrame([(i,) for i in range(50)], ["doc_id"])
        a = sorted(
            (r.anchor, r.neg_rank, r.partner)
            for r in negative_pairs(df, k=4).collect()
        )
        b = sorted(
            (r.anchor, r.neg_rank, r.partner)
            for r in negative_pairs(df.repartition(7), k=4).collect()
        )
        assert a == b  # partition-independent
        assert all(an != pt for an, _, pt in a)  # no self-pairs
        # every anchor keeps ~k draws (self-draws dropped, p = k/N)
        from collections import Counter

        per_anchor = Counter(an for an, _, _ in a)
        assert set(per_anchor) == set(range(50))
        assert all(3 <= c <= 4 for c in per_anchor.values())
        # partners must be uniform-ish across the id space
        partners = Counter(pt for _, _, pt in a)
        assert max(partners.values()) <= 12

    def test_seed_changes_draw(self, spark):
        from pd_utils_spark.extensions.sampling import negative_pairs

        df = spark.createDataFrame([(i,) for i in range(30)], ["doc_id"])
        a = {(r.anchor, r.neg_rank): r.partner
             for r in negative_pairs(df, k=2, seed="s1").collect()}
        b = {(r.anchor, r.neg_rank): r.partner
             for r in negative_pairs(df, k=2, seed="s2").collect()}
        assert any(a.get(key) != b.get(key) for key in a)

    def test_validation(self, spark):
        from pd_utils_spark.extensions.sampling import negative_pairs

        df = spark.createDataFrame([(1,)], ["doc_id"])
        with pytest.raises(ValueError, match="k must"):
            negative_pairs(df, k=0)
