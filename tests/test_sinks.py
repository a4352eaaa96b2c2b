"""Tests for sinks (pd_utils_spark/sources/sink.py): partitioned
layout writes, file sizing, and small-file compaction."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pandas as pd
import pytest

from pd_utils_spark.sources.sink import compact_small_files, write_partitioned

PDF = pd.DataFrame(
    {
        "doc_id": list(range(100)),
        "lang": (["en"] * 50 + ["de"] * 30 + ["fr"] * 20),
        "score": [i * 0.5 for i in range(100)],
    }
)


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="sink_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


class TestWritePartitioned:
    def test_layout_and_roundtrip(self, spark, outdir):
        df = spark.createDataFrame(PDF)
        path = f"{outdir}/docs"
        write_partitioned(df, path, partition_by="lang", sort_by="doc_id")
        subdirs = sorted(
            os.path.basename(p) for p in glob.glob(f"{path}/lang=*")
        )
        assert subdirs == ["lang=de", "lang=en", "lang=fr"]
        back = spark.read.parquet(path)
        assert back.count() == 100
        assert sorted(r.doc_id for r in back.filter("lang = 'de'").collect()) == list(
            range(50, 80)
        )

    def test_one_file_per_partition_by_default(self, spark, outdir):
        df = spark.createDataFrame(PDF).repartition(8)  # simulate task spread
        path = f"{outdir}/docs1"
        write_partitioned(df, path, partition_by="lang")
        for d in glob.glob(f"{path}/lang=*"):
            files = [f for f in os.listdir(d) if f.endswith(".parquet")]
            assert len(files) == 1, f"{d} has {len(files)} files"

    def test_tasks_per_partition_spreads_hot_value(self, spark, outdir):
        df = spark.createDataFrame(PDF)
        path = f"{outdir}/docs_salted"
        # AQE rightly coalesces tiny salted partitions (they're far
        # below the advisory size); disable it here to observe the
        # salt spread the 100-row fixture the way TB-scale data would
        prev = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        try:
            write_partitioned(df, path, partition_by="lang", tasks_per_partition=4)
        finally:
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev)
        en_files = [
            f for f in os.listdir(f"{path}/lang=en") if f.endswith(".parquet")
        ]
        assert 1 < len(en_files) <= 4
        back = spark.read.parquet(path)
        assert back.count() == 100
        assert "salt" not in back.columns and len(back.columns) == 3

    def test_max_records_per_file_splits(self, spark, outdir):
        df = spark.createDataFrame(PDF)
        path = f"{outdir}/docs2"
        write_partitioned(df, path, partition_by="lang", max_records_per_file=10)
        en_files = [
            f for f in os.listdir(f"{path}/lang=en") if f.endswith(".parquet")
        ]
        assert len(en_files) >= 5  # 50 rows / 10 per file

    def test_partition_pruning_at_read(self, spark, outdir):
        import contextlib
        import io

        df = spark.createDataFrame(PDF)
        path = f"{outdir}/docs3"
        write_partitioned(df, path, partition_by="lang")
        back = spark.read.parquet(path).filter("lang = 'fr'")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            back.explain("formatted")
        assert "PartitionFilters: [isnotnull(lang" in buf.getvalue()


class TestCompactSmallFiles:
    def test_compacts_to_fewer_files(self, spark, outdir):
        path = f"{outdir}/flood"
        spark.createDataFrame(PDF).repartition(20).write.parquet(path)
        n_before = len(glob.glob(f"{path}/*.parquet"))
        assert n_before >= 20
        out = compact_small_files(spark, path, target_file_mb=256)
        n_after = len(glob.glob(f"{path}.compact/*.parquet"))
        assert n_after == 1  # tiny data -> single target file
        assert out.count() == 100

    def test_bad_target_raises(self, spark, outdir):
        with pytest.raises(ValueError):
            compact_small_files(spark, outdir, target_file_mb=0)

    def test_partitioned_layout_survives_compaction(self, spark, outdir):
        path = f"{outdir}/part_flood"
        write_partitioned(spark.createDataFrame(PDF), path, partition_by="lang")
        out = compact_small_files(spark, path, target_file_mb=256)
        assert out.count() == 100
        subdirs = sorted(
            os.path.basename(p) for p in glob.glob(f"{path}.compact/lang=*")
        )
        assert subdirs == ["lang=de", "lang=en", "lang=fr"]
