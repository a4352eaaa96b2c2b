"""Tests for the Z-order layout module (pd_utils_spark/plans/layout.py):
key correctness against a reference Morton interleave, monotonicity per
dimension, degenerate/null handling, validation bounds, and — the point
of the module — a data-skipping effectiveness proof on real parquet
footer statistics written by zorder_write."""

from __future__ import annotations

import glob

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pd_utils_spark.plans import zorder_by, zorder_key, zorder_write


def _morton2(x: int, y: int, bits: int) -> int:
    """Reference Morton interleave: bit b of x -> 2b, of y -> 2b+1."""
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


@pytest.fixture()
def grid(spark):
    # full 64x64 integer grid; quantization with bits=6 is the identity
    return spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("bigint").alias("y")
    )


class TestZorderKey:
    def test_matches_reference_morton_interleave(self, grid):
        got = zorder_key(grid, ["x", "y"], bits=6).collect()
        for r in got:
            assert r.zorder == _morton2(r.x, r.y, 6), (r.x, r.y)

    def test_monotone_per_dimension(self, spark):
        # 1-D key must be non-decreasing in the column
        df = spark.range(1000).select((F.col("id") * 3).alias("v"))
        rows = zorder_key(df, "v", bits=8).orderBy("v").collect()
        keys = [r.zorder for r in rows]
        assert keys == sorted(keys)
        # and in 2-D, fixing one dim: larger other dim never lowers the key
        g = spark.createDataFrame(pd.DataFrame({"x": [3] * 8, "y": range(8)}))
        ks = [r.zorder for r in zorder_key(g, ["x", "y"], bits=3).orderBy("y").collect()]
        assert ks == sorted(ks)

    def test_null_and_degenerate_span_land_in_bucket_zero(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"x": [5.0, 5.0, None], "y": [1.0, 2.0, 3.0]})
        )
        rows = zorder_key(df, ["x", "y"], bits=4).collect()
        # x has zero span (min == max) and one null -> x contributes 0
        # bits for every row; keys reduce to y's interleaved pattern
        for r in rows:
            assert r.zorder is not None
            for b in range(4):
                assert (r.zorder >> (2 * b)) & 1 == 0  # x bit positions all 0

    def test_bits_times_cols_bound_validated(self, grid):
        with pytest.raises(ValueError, match="64-bit"):
            zorder_key(grid, ["x", "y"], bits=32)
        with pytest.raises(ValueError, match="64-bit"):
            zorder_key(grid, ["x", "y"], bits=0)
        with pytest.raises(ValueError, match="non-empty"):
            zorder_key(grid, [])

    def test_no_driver_action_in_plan_construction(self, grid):
        # building the key must not run a job; bounds come from a
        # broadcast single-row aggregate inside the lazy plan
        import contextlib
        import io

        out = zorder_key(grid, ["x", "y"], bits=6)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        assert "BroadcastExchange" in buf.getvalue()


class TestZorderByAndWrite:
    def test_zorder_by_partitions_and_local_sort(self, grid):
        out = zorder_by(grid, ["x", "y"], bits=6, num_files=8)
        assert out.rdd.getNumPartitions() == 8
        assert out.count() == 64 * 64
        assert "zorder" not in out.columns

    def test_skipping_effectiveness_on_footer_stats(self, grid, spark, tmp_path):
        """The proof the module exists for: after zorder_write, a point
        filter on EITHER clustered column overlaps few files' footer
        min/max spans (what row-group pruning keys on), while the same
        data written unclustered overlaps essentially all of them."""
        import pyarrow.parquet as pq

        zpath = str(tmp_path / "zordered")
        upath = str(tmp_path / "unordered")
        zorder_write(grid, zpath, ["x", "y"], bits=6, num_files=16)
        grid.repartition(16).write.mode("overwrite").parquet(upath)

        def overlapping(path: str, col: str, point: int) -> tuple[int, int]:
            files = sorted(glob.glob(f"{path}/part-*.parquet"))
            hit = 0
            for f in files:
                md = pq.ParquetFile(f).metadata
                for rg in range(md.num_row_groups):
                    stats = {
                        md.row_group(rg).column(i).path_in_schema: md.row_group(rg)
                        .column(i)
                        .statistics
                        for i in range(md.row_group(rg).num_columns)
                    }[col]
                    if stats.min <= point <= stats.max:
                        hit += 1
                        break
            return hit, len(files)

        for col in ("x", "y"):
            zhit, ztot = overlapping(zpath, col, 5)
            uhit, utot = overlapping(upath, col, 5)
            assert ztot == 16 and utot == 16
            # unclustered layout: every file spans the full domain
            assert uhit == utot
            # z-ordered: a point filter prunes most files on BOTH dims
            assert zhit <= ztot // 2, (col, zhit, ztot)
            assert zhit < uhit

        # the data round-trips intact
        back = spark.read.parquet(zpath)
        assert back.count() == 64 * 64
        assert back.filter("x = 5").count() == 64


class TestWritePartitioned:
    def test_one_file_per_partition_dir(self, spark, tmp_path):
        import glob
        import os

        from pd_utils_spark.plans.layout import write_partitioned

        df = (
            spark.range(10_000)
            .selectExpr("id", "id % 5 AS part", "id * 2 AS v")
            .repartition(16)  # many upstream tasks: the naive write
            # would emit up to 16 files per partition dir
        )
        out = str(tmp_path / "p1")
        write_partitioned(df, out, "part")
        for d in glob.glob(os.path.join(out, "part=*")):
            files = [f for f in os.listdir(d) if f.endswith(".parquet")]
            assert len(files) == 1, (d, files)
        back = spark.read.parquet(out)
        assert back.count() == 10_000
        assert back.select("part").distinct().count() == 5

    def test_files_per_partition_salt(self, spark, tmp_path):
        import glob
        import os

        from pd_utils_spark.plans.layout import write_partitioned

        df = spark.range(10_000).selectExpr("id", "id % 2 AS part")
        out = str(tmp_path / "p2")
        write_partitioned(df, out, "part", files_per_partition=3)
        for d in glob.glob(os.path.join(out, "part=*")):
            files = [f for f in os.listdir(d) if f.endswith(".parquet")]
            assert 1 <= len(files) <= 3, (d, files)
        assert spark.read.parquet(out).count() == 10_000
