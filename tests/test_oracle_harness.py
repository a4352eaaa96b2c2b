"""Negative controls for the value-pinned oracles: prove the pinned
literals actually CATCH the regressions they were installed to catch
(round-5 audit item — a pinned number that no plausible bug can move
is no better than the self-certified booleans it replaced)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


SF_001 = "/root/testdata/sf0.01"

# the literals pinned in __spark_entry__.oracle_sql()["ann_pq_topk"]
PINNED_ADC_HITS = {0: 6, 1: 6, 2: 5, 3: 7, 4: 6}


class TestPinnedOraclesCatchRegressions:
    def test_adc_sign_flip_changes_pinned_hit_counts(self, spark):
        """A sign error in the ADC scoring path (negated query
        subvectors -> every lookup-table dot flips sign -> 'top'-k is
        really bottom-k) must move the per-query hit counts away from
        the pinned literals — the exact scenario the round-4 verdict
        said the TRUE-boolean oracles could NOT detect."""
        from pd_utils_spark.extensions import similarity as S

        emb = spark.read.parquet(f"{SF_001}/embeddings.parquet")
        nrm = emb.select(
            "vec_id",
            F.transform(
                "embedding", lambda x: x / S.norm(F.col("embedding"))
            ).alias("embedding"),
        ).persist()
        cb = S.pq_fit(nrm, m=16, ncodes=32, sample=1024)
        enc = S.pq_encode(nrm, cb)
        cbdf = S.pq_codebook_table(cb, spark)
        q = nrm.filter(F.col("vec_id") < 5)
        truth = S.brute_force_topk(nrm, q, k=10)
        # the sign flip: negate the query vectors ONLY in the ADC
        # stage (truth unchanged) — this is what a broken distance
        # kernel looks like to the harness
        q_neg = q.select(
            "vec_id",
            F.transform("embedding", lambda x: -x).alias("embedding"),
        )
        broken = S.pq_adc_topk(enc, cbdf, q_neg, k=10)
        hits = {
            r.query_id: r.n
            for r in broken.join(truth, ["query_id", "vec_id"])
            .groupBy("query_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        broken_hits = {qid: hits.get(qid, 0) for qid in PINNED_ADC_HITS}
        assert broken_hits != PINNED_ADC_HITS
        # bottom-k of a 500-vector corpus should recover almost none
        # of the true top-10
        assert sum(broken_hits.values()) < sum(PINNED_ADC_HITS.values())
        nrm.unpersist()


class TestCompareMechanics:
    """The driver-shaped compare (scripts/check_oracle.compare) must
    flag value flips, row-count drift, and column renames — the three
    failure shapes every pinned oracle relies on."""

    def _compare(self, spark_df, oracle_pdf):
        import sys

        sys.path.insert(0, "/root/repo/scripts")
        from check_oracle import compare

        return compare("t", spark_df, oracle_pdf)

    def test_value_flip_is_flagged(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": [6, 5]}))
        ok = self._compare(df, pd.DataFrame({"k": [1, 2], "v": [6, 5]}))
        assert ok == []
        bad = self._compare(df, pd.DataFrame({"k": [1, 2], "v": [6, 4]}))
        assert any("v" in p for p in bad)

    def test_row_count_drift_is_flagged(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"k": [1, 2]}))
        bad = self._compare(df, pd.DataFrame({"k": [1, 2, 3]}))
        assert any("rows" in p for p in bad)

    def test_column_rename_is_flagged(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"k": [1]}))
        bad = self._compare(df, pd.DataFrame({"key": [1]}))
        assert any("columns" in p for p in bad)

    def test_float_compare_is_exact_not_fuzzy(self, spark):
        """Pinned rounded numerics rely on EXACT float equality — a
        tolerance here would quietly weaken every pinned oracle."""
        df = spark.createDataFrame(pd.DataFrame({"x": [0.0276]}))
        bad = self._compare(df, pd.DataFrame({"x": [0.0277]}))
        assert any("x" in p for p in bad)


def test_pinned_oracles_verify(spark):
    """Run scripts/repin_oracles.py --verify in-process: every
    committed pinned literal (ann_pq_topk / ann_ivf_topk /
    pca_project / approx_group_stats HLL) must match a fresh sf0.01
    recompute — a silent testdata regeneration or a pin edit drifting
    from the code fails HERE, not in the next round's driver
    snapshot. Regenerate stale pins with
    ``python scripts/repin_oracles.py --print``."""
    import duckdb

    from scripts import repin_oracles as rp

    for sf_dir in (SF_001, "/root/testdata/sf0.001"):
        con = duckdb.connect()
        for t in rp.TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        # the oracles dispatch per-SF literals on the lineitem count,
        # so BOTH harness scale factors must verify
        assert rp.verify(spark, con, sf_dir) == 0, sf_dir
