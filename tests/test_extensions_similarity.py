"""Tests for similarity-search extension operators
(pd_utils_spark/extensions/similarity.py)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pd_utils_spark.extensions import similarity as S

VECS = pd.DataFrame(
    {
        "vec_id": [0, 1, 2, 3],
        "embedding": [
            [1.0, 0.0, 0.0],
            [0.9, 0.1, 0.0],   # close to 0
            [0.0, 1.0, 0.0],   # orthogonal to 0
            [-1.0, 0.0, 0.0],  # opposite of 0
        ],
    }
)


@pytest.fixture()
def vecs(spark):
    return spark.createDataFrame(VECS).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


class TestBruteForce:
    def test_ranking(self, vecs):
        q = vecs.filter("vec_id = 0")
        out = S.brute_force_topk(vecs, q, k=3).collect()
        ranked = [(r.vec_id, r.rank) for r in sorted(out, key=lambda r: r.rank)]
        assert ranked == [(1, 1), (2, 2), (3, 3)]
        sims = {r.vec_id: r.cosine for r in out}
        assert sims[1] == pytest.approx(0.9 / math.sqrt(0.82), rel=1e-6)
        assert sims[2] == pytest.approx(0.0, abs=1e-12)
        assert sims[3] == pytest.approx(-1.0, rel=1e-12)

    def test_exclude_self(self, vecs):
        q = vecs.filter("vec_id = 0")
        ids = {r.vec_id for r in S.brute_force_topk(vecs, q, k=10).collect()}
        assert 0 not in ids
        ids2 = {
            r.vec_id
            for r in S.brute_force_topk(vecs, q, k=10, exclude_self=False).collect()
        }
        assert 0 in ids2

    def test_zero_vector_null_cosine(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"vec_id": [0, 1], "embedding": [[0.0, 0.0], [1.0, 0.0]]})
        ).withColumn("embedding", F.col("embedding").cast("array<float>"))
        q = df.filter("vec_id = 1")
        rows = S.brute_force_topk(df, q, k=5).collect()
        assert [r.cosine for r in rows] == [None]


class TestLSH:
    def test_identical_vectors_share_signature(self, vecs):
        dup = vecs.unionByName(
            vecs.select((F.col("vec_id") + 100).alias("vec_id"), "embedding")
        )
        sig = {r.vec_id: r.signature for r in S.hyperplane_signature(dup, planes=8, dims=3).collect()}
        for i in range(4):
            assert sig[i] == sig[i + 100]

    def test_near_dup_pairs_find_copies(self, vecs):
        dup = vecs.unionByName(
            vecs.select((F.col("vec_id") + 100).alias("vec_id"), "embedding")
        )
        pairs = {
            (r.id_a, r.id_b): r.cosine
            for r in S.embedding_near_dup_pairs(dup, threshold=0.99, dims=3).collect()
        }
        for i in range(4):
            assert pairs[(i, i + 100)] == pytest.approx(1.0)

    def test_ann_subset_of_brute_force_scores(self, spark):
        import numpy as np

        rng = np.random.RandomState(7)
        pdf = pd.DataFrame(
            {
                "vec_id": range(100),
                "embedding": [rng.randn(16).astype("float32").tolist() for _ in range(100)],
            }
        )
        df = spark.createDataFrame(pdf).withColumn(
            "embedding", F.col("embedding").cast("array<float>")
        )
        q = df.filter("vec_id < 2")
        ann = S.ann_lsh_topk(df, q, k=5, planes=4, dims=16).collect()
        # ANN results must be genuine cosine values and unique per query
        seen = set()
        for r in ann:
            assert (r.query_id, r.vec_id) not in seen
            seen.add((r.query_id, r.vec_id))
            assert -1.0001 <= r.cosine <= 1.0001

    def test_ivf_topk_invariants(self, spark):
        import numpy as np

        rng = np.random.RandomState(11)
        pdf = pd.DataFrame(
            {
                "vec_id": range(80),
                "embedding": [rng.randn(8).astype("float32").tolist() for _ in range(80)],
            }
        )
        df = spark.createDataFrame(pdf).withColumn(
            "embedding", F.col("embedding").cast("array<float>")
        )
        q = df.filter("vec_id < 2")
        out = S.ann_ivf_topk(df, q, k=5, nlist=4, nprobe=4).collect()
        # nprobe = nlist probes every cell -> equals brute force top-k
        exact = {
            (r.query_id, r.vec_id)
            for r in S.brute_force_topk(df, q, k=5).collect()
        }
        assert {(r.query_id, r.vec_id) for r in out} == exact
        for r in out:
            assert 1 <= r.rank <= 5 and -1.0001 <= r.cosine <= 1.0001

    def test_dims_required(self, spark):
        # dims must be explicit: inferring it would hide an eager
        # .first() driver action inside plan construction
        df = spark.createDataFrame(
            pd.DataFrame({"vec_id": [1], "embedding": [[1.0, 2.0]]})
        ).withColumn("embedding", F.col("embedding").cast("array<float>"))
        with pytest.raises(ValueError, match="dims"):
            S.hyperplane_signature(df, planes=2)

    def test_near_dup_bucket_cap(self, spark):
        # a degenerate all-identical corpus lands in ONE signature
        # bucket; max_bucket drops it instead of going quadratic
        pdf = pd.DataFrame(
            {"vec_id": range(20), "embedding": [[1.0, 0.0, 0.0]] * 20}
        )
        df = spark.createDataFrame(pdf).withColumn(
            "embedding", F.col("embedding").cast("array<float>")
        )
        capped = S.embedding_near_dup_pairs(
            df, threshold=0.99, dims=3, max_bucket=10
        )
        assert capped.count() == 0
        uncapped = S.embedding_near_dup_pairs(
            df, threshold=0.99, dims=3, max_bucket=None
        )
        assert uncapped.count() == 20 * 19 // 2


class TestQuantizeEmbeddings:
    def test_codes_and_roundtrip(self, spark):
        import pandas as pd

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": [0, 1],
                    "embedding": [[1.0, -0.5, 0.25, 0.0], [0.0, 0.0, 0.0, 0.0]],
                }
            )
        )
        from pd_utils_spark.extensions.similarity import quantize_embeddings

        out = {r.vec_id: r for r in quantize_embeddings(df, bits=8).collect()}
        assert out[0].q_embedding == [127, -64, 32, 0]  # round(x / (1/127))
        assert abs(out[0].q_scale - 1.0 / 127) < 1e-9
        # dequantized max error bounded by scale/2
        for q, x in zip(out[0].q_embedding, [1.0, -0.5, 0.25, 0.0]):
            assert abs(q * (1.0 / 127) - x) <= (1.0 / 127) / 2 + 1e-12
        assert out[1].q_embedding == [0, 0, 0, 0]  # zero vector -> scale 0
        assert out[1].q_scale == 0.0

    def test_bad_bits_raise(self, spark):
        import pandas as pd
        import pytest as pt

        from pd_utils_spark.extensions.similarity import quantize_embeddings

        df = spark.createDataFrame(
            pd.DataFrame({"vec_id": [0], "embedding": [[1.0]]})
        )
        with pt.raises(ValueError):
            quantize_embeddings(df, bits=1)


class TestDedupEmbeddings:
    def test_one_survivor_per_duplicate_cluster(self, spark):
        import pandas as pd

        base = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
        rows = []
        for i, v in enumerate(base):
            rows.append((i, v))
            rows.append((i + 10, v))  # exact duplicate -> same LSH bucket
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        from pd_utils_spark.extensions.similarity import dedup_embeddings

        kept = sorted(
            r.vec_id
            for r in dedup_embeddings(df, threshold=0.99, planes=6, dims=4).collect()
        )
        assert kept == [0, 1, 2]


class TestTopkRecall:
    def test_recall_fractions(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.similarity import topk_recall

        exact = spark.createDataFrame(
            pd.DataFrame({"query_id": [1, 1, 2, 2], "vec_id": [10, 11, 20, 21]})
        )
        approx = spark.createDataFrame(
            # q1 finds one of two; q2 finds none (plus a spurious hit)
            pd.DataFrame({"query_id": [1, 1, 2], "vec_id": [10, 99, 98]})
        )
        got = {r.query_id: r.recall for r in topk_recall(approx, exact).collect()}
        assert got == {1: 0.5, 2: 0.0}

    def test_perfect_recall_against_self(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.similarity import topk_recall

        e = spark.createDataFrame(
            pd.DataFrame({"query_id": [1, 1, 1], "vec_id": [5, 6, 7]})
        )
        got = topk_recall(e, e).collect()
        assert [r.recall for r in got] == [1.0]


class TestProductQuantization:
    def _vecs(self, spark, n=200, d=16, seed=3):
        import numpy as np
        import pandas as pd

        rng = np.random.RandomState(seed)
        X = rng.randn(n, d)
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        return spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": range(n), "embedding": [list(map(float, r)) for r in X]}
            )
        )

    def test_fit_deterministic_and_shapes(self, spark):
        from pd_utils_spark.extensions.similarity import pq_fit

        df = self._vecs(spark)
        cb1 = pq_fit(df, m=4, ncodes=8, sample=128)
        cb2 = pq_fit(df.repartition(7), m=4, ncodes=8, sample=128)
        assert cb1 == cb2  # hash-ordered sample: partitioning-invariant
        assert len(cb1) == 4 and len(cb1[0]) == 8 and len(cb1[0][0]) == 4

    def test_encode_codes_in_range_and_nearest(self, spark):
        import numpy as np

        from pd_utils_spark.extensions.similarity import pq_encode, pq_fit

        df = self._vecs(spark)
        cb = pq_fit(df, m=4, ncodes=8, sample=128)
        enc = {r.vec_id: r.pq_codes for r in pq_encode(df, cb).collect()}
        assert len(enc) == 200
        assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in enc.values())
        # spot-check: code 0 of vec 0 really is the nearest centroid
        v0 = np.array(df.filter("vec_id = 0").collect()[0].embedding)
        C = np.array(cb[0])
        expect = ((v0[:4] - C) ** 2).sum(axis=1).argmin()
        assert enc[0][0] == expect

    def test_adc_pipeline_recovers_neighbors(self, spark):
        from pd_utils_spark.extensions.similarity import (
            brute_force_topk,
            pq_adc_topk,
            pq_codebook_table,
            pq_encode,
            pq_fit,
        )

        df = self._vecs(spark)
        cb = pq_fit(df, m=8, ncodes=16, sample=200)
        enc = pq_encode(df, cb)
        cbdf = pq_codebook_table(cb, spark)
        q = df.filter("vec_id < 3")
        truth = brute_force_topk(df, q, k=5)
        cand = pq_adc_topk(enc, cbdf, q, k=50)
        # true top-5 should sit inside the ADC top-50 candidates
        hits = cand.join(truth, ["query_id", "vec_id"]).count()
        assert hits >= 10  # >= 2/3 of 15 truth pairs

    def test_fit_validation(self, spark):
        import pytest as _pytest

        from pd_utils_spark.extensions.similarity import pq_fit

        df = self._vecs(spark, d=10)
        with _pytest.raises(ValueError, match="divisible"):
            pq_fit(df, m=4, ncodes=8, sample=64)

    def test_ivf_pq_composition_recall(self, spark):
        from pd_utils_spark.extensions.similarity import (
            ann_ivf_pq_topk,
            brute_force_topk,
        )

        df = self._vecs(spark, n=300, d=16)
        q = df.filter("vec_id < 3")
        out = ann_ivf_pq_topk(
            df, q, k=10, nlist=4, nprobe=4, m=8, ncodes=16, sample=300
        )
        # k rows per query, ADC-descending
        counts = out.groupBy("query_id").count().collect()
        assert all(r["count"] == 10 for r in counts)
        truth = brute_force_topk(df, q, k=10)
        hits = out.join(truth, ["query_id", "vec_id"]).count()
        assert hits >= 8  # nprobe=nlist: only PQ error remains


class TestEmbeddingDrift:
    def test_close_and_orthogonal_groups(self, spark):
        import numpy as np
        import pandas as pd

        from pd_utils_spark.extensions.similarity import embedding_drift

        rng = np.random.RandomState(0)
        rows = []
        for g, mu in (("a", [1, 0, 0, 0]), ("b", [1, 0.1, 0, 0]), ("c", [0, 0, 1, 0])):
            for _ in range(30):
                rows.append(
                    (g, [float(x) for x in (np.array(mu) + 0.01 * rng.randn(4))])
                )
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["source", "embedding"])
        )
        out = {(r.group_a, r.group_b): r.centroid_cosine
               for r in embedding_drift(df).collect()}
        assert out[("a", "b")] > 0.99       # near-identical sources
        assert abs(out[("a", "c")]) < 0.05  # orthogonal
        assert abs(out[("b", "c")]) < 0.05


class TestPCA:
    def test_projection_matches_numpy_svd(self, spark):
        import numpy as np
        import pandas as pd
        import pytest as _pytest

        from pd_utils_spark.extensions.similarity import pca_fit, pca_project

        rng = np.random.RandomState(0)
        X = rng.randn(400, 6) @ np.diag([5, 3, 1, 0.5, 0.1, 0.05])
        df = spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": range(400), "embedding": [list(map(float, r)) for r in X]}
            )
        )
        comps, mean, ev = pca_fit(df, k=3)
        C = np.array(comps)
        assert np.allclose(C @ C.T, np.eye(3), atol=1e-8)  # orthonormal
        assert ev[0] > ev[1] > ev[2]
        P = np.array(
            [r.pca for r in pca_project(df, comps, mean).orderBy("vec_id").collect()]
        )
        Xc = X - X.mean(0)
        _, _, Vt = np.linalg.svd(Xc, full_matrices=False)
        for j in range(3):
            c = Vt[j]
            if c[np.abs(c).argmax()] < 0:
                c = -c
            ref = Xc @ c
            # identical up to numerical noise (same sign convention)
            assert abs(np.corrcoef(P[:, j], ref)[0, 1]) == _pytest.approx(1.0, abs=1e-9)

    def test_sign_fix_partitioning_invariant(self, spark):
        import numpy as np
        import pandas as pd

        from pd_utils_spark.extensions.similarity import pca_fit

        rng = np.random.RandomState(1)
        X = rng.randn(200, 4)
        pdf = pd.DataFrame(
            {"vec_id": range(200), "embedding": [list(map(float, r)) for r in X]}
        )
        c1, m1, _ = pca_fit(spark.createDataFrame(pdf), k=2)
        c2, m2, _ = pca_fit(spark.createDataFrame(pdf).repartition(7), k=2)
        assert np.allclose(np.array(c1), np.array(c2), atol=1e-9)
        assert np.allclose(np.array(m1), np.array(m2), atol=1e-12)

    def test_whiten_unit_variance(self, spark):
        import numpy as np
        import pandas as pd
        import pytest as _pytest

        from pd_utils_spark.extensions.similarity import pca_fit, pca_project

        rng = np.random.RandomState(2)
        X = rng.randn(500, 4) @ np.diag([4, 2, 1, 0.5])
        df = spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": range(500), "embedding": [list(map(float, r)) for r in X]}
            )
        )
        comps, mean, ev = pca_fit(df, k=2)
        tv = float(np.var(X - X.mean(0), axis=0, ddof=1).sum())
        P = np.array(
            [
                r.pca
                for r in pca_project(
                    df, comps, mean,
                    explained_variance=ev, whiten=True, total_variance=tv,
                ).collect()
            ]
        )
        assert np.var(P[:, 0], ddof=1) == _pytest.approx(1.0, rel=1e-6)
        assert np.var(P[:, 1], ddof=1) == _pytest.approx(1.0, rel=1e-6)
        with _pytest.raises(ValueError, match="whiten"):
            pca_project(df, comps, mean, whiten=True)


class TestKmeans:
    def _df(self, spark, vecs):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": range(len(vecs)),
                    "embedding": [[float(x) for x in v] for v in vecs],
                }
            )
        )

    def test_two_separated_groups(self, spark):
        df = self._df(
            spark, [[0.0, 0.0], [0.1, 0.0], [10.0, 0.0], [10.1, 0.0]]
        )
        cents = S.kmeans_fit(df, k=2, iters=3)
        assert cents[0] == pytest.approx([0.05, 0.0])
        assert cents[1] == pytest.approx([10.05, 0.0])
        got = {
            r.vec_id: r.cluster for r in S.kmeans(df, k=2, iters=3).collect()
        }
        assert got == {0: 0, 1: 0, 2: 1, 3: 1}

    def test_tie_breaks_to_lowest_cid_and_empty_keeps_centroid(self, spark):
        # ids 0 and 1 carry the SAME vector -> identical init centroids;
        # every point ties and must go to cid 0, so cluster 1 empties
        # and must keep its (unchanged) centroid across iterations
        df = self._df(spark, [[1.0, 1.0], [1.0, 1.0], [1.2, 1.0]])
        cents = S.kmeans_fit(df, k=2, iters=1)
        # round 1: every point ties-or-prefers cid 0 (tie -> lowest),
        # cluster 1 empties and must keep its seed centroid while
        # cluster 0's centroid moves to the 3-point mean
        assert cents[0] == pytest.approx([1.0 + 0.2 / 3, 1.0])
        assert cents[1] == pytest.approx([1.0, 1.0])
        # final assignment against those centroids: the two identical
        # points are now nearer the UNMOVED cluster-1 seed
        out = {r.vec_id: r.cluster for r in S.kmeans(df, k=2, iters=1).collect()}
        assert out == {0: 1, 1: 1, 2: 0}

    def test_zero_iters_is_seed_assignment(self, spark):
        df = self._df(spark, [[0.0], [4.0], [10.0]])
        out = {r.vec_id: r.cluster for r in S.kmeans(df, k=2, iters=0).collect()}
        # seeds are ids 0 (=0.0) and 1 (=4.0); 10.0 is nearer 4.0
        assert out == {0: 0, 1: 1, 2: 1}

    def test_k_exceeds_rows_raises(self, spark):
        df = self._df(spark, [[1.0]])
        with pytest.raises(ValueError, match="exceeds"):
            S.kmeans_fit(df, k=5, iters=1)

    def test_fit_persists_during_and_unpersists_after(self, spark):
        # iters > 1 must cache the projection for the duration of the
        # fit (a derived upstream frame would otherwise recompute
        # iters+1 times) and release it before returning — the cache
        # footprint of a fit is zero once it's done
        jsc = spark.sparkContext._jsc.sc()
        before = jsc.getPersistentRDDs().size()
        df = self._df(
            spark, [[0.0, 0.0], [0.1, 0.0], [10.0, 0.0], [10.1, 0.0]]
        )
        cents = S.kmeans_fit(df, k=2, iters=3)
        assert cents[0] == pytest.approx([0.05, 0.0])  # result unchanged
        assert jsc.getPersistentRDDs().size() == before
        # the error path (k > rows) must also unpersist
        with pytest.raises(ValueError, match="exceeds"):
            S.kmeans_fit(df, k=9, iters=2)
        assert jsc.getPersistentRDDs().size() == before


class TestSemanticDedupKmeans:
    def test_keeps_lowest_id_per_near_dup_group(self, spark):
        vecs = [
            [1.0, 0.0],     # 0: keeper of the (0, 1) pair
            [1.0, 0.001],   # 1: near-dup of 0
            [0.0, 1.0],     # 2: unique direction
            [10.0, 0.01],   # 3: near-dup of 0 in cosine, same cell
        ]
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": range(4),
                    "embedding": [[float(x) for x in v] for v in vecs],
                }
            )
        )
        kept = {
            r.vec_id
            for r in S.semantic_dedup_kmeans(
                df, k=2, iters=2, threshold=0.99
            ).collect()
        }
        assert 0 in kept and 2 in kept
        assert 1 not in kept


class TestSilhouetteKmeans:
    def test_matches_numpy_reference(self, spark):
        import numpy as np

        rng = np.random.RandomState(2)
        # three well-separated blobs in 4-d
        blobs = [rng.randn(20, 4) * 0.2 + c for c in
                 (np.zeros(4), np.full(4, 5.0), np.array([0, 5, 0, 5.0]))]
        X = np.vstack(blobs)
        cents = [b.mean(axis=0) for b in blobs]
        df = spark.createDataFrame(
            [(i, [float(v) for v in row]) for i, row in enumerate(X)],
            ["vec_id", "embedding"],
        )
        got = {
            r.vec_id: (r.cluster, r.silhouette)
            for r in S.silhouette_kmeans(df, [list(c) for c in cents]).collect()
        }
        C = np.array(cents)
        for i, row in enumerate(X):
            d = np.sqrt(((C - row) ** 2).sum(axis=1))
            order = np.argsort(d, kind="stable")
            a, b = d[order[0]], d[order[1]]
            s = (b - a) / max(a, b)
            assert got[i][0] == order[0], i
            assert got[i][1] == pytest.approx(s, rel=1e-9), i
        # well-separated blobs -> silhouettes near 1
        assert sum(v for _, v in got.values()) / len(got) > 0.9

    def test_point_on_centroid_and_duplicate_centroids(self, spark):
        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.5, 0.0])], ["vec_id", "embedding"]
        )
        got = {
            r.vec_id: r
            for r in S.silhouette_kmeans(
                df, [[1.0, 0.0], [0.0, 0.0]]
            ).collect()
        }
        assert got[0].silhouette == pytest.approx(1.0)  # exactly on centroid
        dup = {
            r.vec_id: r.silhouette
            for r in S.silhouette_kmeans(
                df, [[1.0, 0.0], [1.0, 0.0]]
            ).collect()
        }
        assert dup[0] == 0.0  # both distances 0 -> defined as 0

    def test_validation(self, spark):
        df = spark.createDataFrame([(0, [1.0])], ["vec_id", "embedding"])
        with pytest.raises(ValueError, match="centroids"):
            S.silhouette_kmeans(df, [[1.0]])


class TestBruteForcePairs:
    def _df(self, spark, n=120, seed=7):
        import numpy as np

        rng = np.random.RandomState(seed)
        vecs = rng.normal(0, 1, (n, 8))
        if n > 55:
            vecs[10] = vecs[3] + 0.001   # near-identical pair
            vecs[55] = vecs[20] * 1.5    # colinear pair (cosine 1)
        return vecs, spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id int, embedding array<double>",
        )

    def test_matches_numpy_all_pairs(self, spark):
        import numpy as np

        vecs, df = self._df(spark)
        got = sorted(
            (r.id_a, r.id_b)
            for r in S.brute_force_pairs(df, 0.8, blocks=4).collect()
        )
        Vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        cos = Vn @ Vn.T
        ref = sorted(
            (i, j)
            for i in range(len(vecs))
            for j in range(i + 1, len(vecs))
            if cos[i, j] >= 0.8
        )
        assert got == ref

    def test_block_count_does_not_change_result(self, spark):
        _, df = self._df(spark, n=60)
        a = sorted(map(tuple, S.brute_force_pairs(df, 0.7, blocks=1).collect()))
        b = sorted(map(tuple, S.brute_force_pairs(df, 0.7, blocks=5).collect()))
        assert a == b and len(a) > 0

    def test_semantic_cell_pairs_subset_of_truth(self, spark):
        # cell-local candidates can MISS boundary pairs but never
        # invent one: candidate set is a subset of the exact truth —
        # the property candidate_recall_semantic quantifies
        _, df = self._df(spark)
        truth = set(map(tuple, S.brute_force_pairs(df, 0.8, blocks=4).collect()))
        cells = set(
            map(tuple, S.semantic_cell_pairs(df, k=4, iters=2, threshold=0.8).collect())
        )
        assert cells <= truth
        assert len(cells) > 0

    def test_validation(self, spark):
        _, df = self._df(spark, n=10)
        import pytest as _pt

        with _pt.raises(ValueError, match="blocks"):
            S.brute_force_pairs(df, 0.5, blocks=0)


class TestHardNegatives:
    def test_excludes_same_label_and_ranks_by_cosine(self, spark):
        import numpy as np

        rng = np.random.RandomState(3)
        vecs = rng.normal(0, 1, (40, 8))
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in v], int(i % 3))
             for i, v in enumerate(vecs)],
            "vec_id int, embedding array<double>, label int",
        )
        q = df.filter("vec_id < 2")
        out = S.hard_negatives(df, q, "label", k=5).collect()
        Vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        cos = Vn @ Vn.T
        for qid in (0, 1):
            rows = sorted(
                [r for r in out if r.query_id == qid], key=lambda r: r.rank
            )
            assert len(rows) == 5
            for r in rows:
                assert r.label != qid % 3      # never the query's class
                assert r.vec_id != qid
                assert r.query_label == qid % 3
            # matches the numpy reference ranking over other-class items
            ref = sorted(
                ((cos[qid, j], -j) for j in range(40)
                 if j != qid and j % 3 != qid % 3),
                reverse=True,
            )[:5]
            got = [(round(r.cosine, 9), -r.vec_id) for r in rows]
            ref9 = [(round(c, 9), nj) for c, nj in ref]
            assert got == ref9

    def test_kmeans_assign_probes_element0_is_the_assignment(self, spark):
        # top-probes cells: element 0 must equal kmeans_assign (same
        # (dist, cid) order), elements distinct, probes clamped to k
        import numpy as np

        from pd_utils_spark.extensions.similarity import (
            kmeans_assign,
            kmeans_assign_probes,
            kmeans_fit,
        )

        rng = np.random.RandomState(11)
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in rng.normal(0, 1, 4)])
             for i in range(30)],
            "vec_id int, embedding array<double>",
        )
        cents = kmeans_fit(df, k=3, iters=2)
        one = {r.vec_id: r.cluster for r in kmeans_assign(df, cents).collect()}
        probed = {
            r.vec_id: r.cells
            for r in kmeans_assign_probes(df, cents, probes=2).collect()
        }
        for vid, cells in probed.items():
            assert len(cells) == 2 and cells[0] != cells[1]
            assert cells[0] == one[vid]
        clamped = kmeans_assign_probes(df, cents, probes=9).collect()
        assert all(len(r.cells) == 3 for r in clamped)  # k=3 caps it
        with pytest.raises(ValueError, match="probes"):
            kmeans_assign_probes(df, cents, probes=0)

    def test_semantic_cell_pairs_probes_is_superset(self, spark):
        # every probes=1 pair also appears at probes=2 (each side's
        # nearest cell is still among its probe cells), plus boundary
        # pairs can only be added, never removed
        import numpy as np

        from pd_utils_spark.extensions.similarity import semantic_cell_pairs

        rng = np.random.RandomState(5)
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in rng.normal(0, 1, 4)])
             for i in range(40)],
            "vec_id int, embedding array<double>",
        )
        p1 = {
            (r.id_a, r.id_b)
            for r in semantic_cell_pairs(df, k=4, iters=2, threshold=0.3).collect()
        }
        p2 = {
            (r.id_a, r.id_b)
            for r in semantic_cell_pairs(
                df, k=4, iters=2, threshold=0.3, probes=2
            ).collect()
        }
        assert p1 <= p2

    def test_null_labels_excluded_from_both_sides(self, spark):
        # r7 contract: an unlabeled corpus row is NOT a certified
        # negative (its true class may equal the query's), and an
        # unlabeled query has no class to contrast — both are dropped
        df = spark.createDataFrame(
            [
                (0, [1.0, 0.0], "a"),
                (1, [0.9, 0.1], None),
                (2, [0.8, 0.2], "a"),
                (3, [0.7, 0.3], "b"),
            ],
            "vec_id int, embedding array<double>, label string",
        )
        q = df.filter("vec_id in (0, 1)")
        out = S.hard_negatives(df, q, "label", k=5).collect()
        # null-label query 1 produces no rows; query 0 mines only the
        # labeled different-class row 3 (null-label 1 is excluded)
        assert {r.query_id for r in out} == {0}
        assert {r.vec_id for r in out} == {3}

    def test_keep_unlabeled_restores_pre_r7_corpus_side(self, spark):
        # r8 (ADVICE): keep_unlabeled=True mines NULL-label corpus
        # rows as universal negatives (the pre-r7 contract) for
        # pipelines where "unlabeled" means "known out-of-class";
        # unlabeled QUERIES stay dropped — no class to contrast.
        df = spark.createDataFrame(
            [
                (0, [1.0, 0.0], "a"),
                (1, [0.9, 0.1], None),
                (2, [0.8, 0.2], "a"),
                (3, [0.7, 0.3], "b"),
            ],
            "vec_id int, embedding array<double>, label string",
        )
        q = df.filter("vec_id in (0, 1)")
        out = S.hard_negatives(df, q, "label", k=5, keep_unlabeled=True).collect()
        assert {r.query_id for r in out} == {0}  # query 1 still dropped
        # corpus row 1 (null label) is now mined alongside row 3
        assert {r.vec_id for r in out} == {1, 3}
        assert all(r.label is None for r in out if r.vec_id == 1)
