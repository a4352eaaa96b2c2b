"""Tests for the sorted-block group streaming helpers
(`utils.group_block_stream` / `utils.group_boundaries`) — the shared
machinery under `groupby_merge('transform', ...)` and `ewma`.

The failure mode these guard: Arrow batch boundaries land MID-GROUP,
so a block function that trusted raw batch edges would see partial
groups. Every test here forces pathologically small Arrow batches
(`spark.sql.execution.arrow.maxRecordsPerBatch=3`) so nearly every
group straddles a batch edge, then asserts exact parity with a pandas
ground truth computed on whole groups.
"""

from __future__ import annotations

import contextlib

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import pd_utils_spark as pus
from pd_utils_spark.extensions import events as E
from pd_utils_spark.utils import group_block_stream, group_boundaries


@contextlib.contextmanager
def tiny_arrow_batches(spark, n: int = 3):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


# ------------------------------------------------------- boundaries

def test_group_boundaries_basic_and_null_keys():
    pdf = pd.DataFrame(
        {
            "g": ["a", "a", "b", None, None, "c"],
            "v": [1, 2, 3, 4, 5, 6],
        }
    )
    starts, ends = group_boundaries(pdf, ["g"])
    # two adjacent nulls are ONE group (null-safe equality)
    assert list(starts) == [0, 2, 3, 5]
    assert list(ends) == [2, 3, 5, 6]


def test_group_boundaries_multi_key():
    pdf = pd.DataFrame(
        {
            "g": [1, 1, 1, 2, 2],
            "h": ["x", "x", "y", "y", "y"],
        }
    )
    starts, ends = group_boundaries(pdf, ["g", "h"])
    assert list(starts) == [0, 2, 3]
    assert list(ends) == [2, 3, 5]


# ------------------------------------------------- block streaming

def _run_block_stream(spark, pdf: pd.DataFrame, byvars: list[str], block_fn, schema: str, batch: int = 3):
    df = spark.createDataFrame(pdf)
    prepared = df.repartition(1).sortWithinPartitions(*byvars, "o")
    with tiny_arrow_batches(spark, batch):
        out = prepared.mapInPandas(group_block_stream(byvars, block_fn), schema)
        return out.toPandas()


def test_blocks_are_whole_groups_despite_tiny_batches(spark):
    # groups of sizes 1..5 interleaved; batch=3 splits most of them
    rows = []
    o = 0
    for gi, size in enumerate([1, 5, 2, 4, 3, 1, 2]):
        for j in range(size):
            rows.append({"g": f"g{gi}", "o": o, "v": float(o)})
            o += 1
    pdf = pd.DataFrame(rows)

    seen: list[tuple] = []

    def block(b: pd.DataFrame) -> pd.DataFrame:
        # record (group-key-set, rowcount) per block; one group per
        # call is NOT required (a block may hold several complete
        # groups) but no group may be SPLIT across calls
        seen.append((set(b["g"]), len(b)))
        return b[["g", "o", "v"]]

    out = _run_block_stream(spark, pdf, ["g"], block, "g string, o long, v double")
    assert len(out) == len(pdf)
    # every group appears in exactly one block, whole
    per_group = {}
    for keys, n in seen:
        for k in keys:
            per_group.setdefault(k, 0)
            per_group[k] += 1
    assert all(v == 1 for v in per_group.values()), per_group
    sizes = pdf.groupby("g").size().to_dict()
    for keys, n in seen:
        assert n == sum(sizes[k] for k in keys)


def test_block_stream_null_key_group_survives_batch_edge(spark):
    pdf = pd.DataFrame(
        {
            "g": [None] * 7 + ["a"] * 2,
            "o": list(range(9)),
            "v": [float(i) for i in range(9)],
        }
    )

    def block(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["n"] = len(b)
        return b[["g", "o", "n"]]

    out = _run_block_stream(spark, pdf, ["g"], block, "g string, o long, n long")
    null_rows = out[out["g"].isna()]
    assert (null_rows["n"] == 7).all()
    assert (out[out["g"] == "a"]["n"] == 2).all()


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=7), min_size=1, max_size=6),
    batch=st.integers(min_value=1, max_value=5),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_block_stream_cumsum_parity_any_batch_size(spark, sizes, batch):
    rows = []
    o = 0
    for gi, size in enumerate(sizes):
        for _ in range(size):
            rows.append({"g": gi, "o": o, "v": float(o % 5)})
            o += 1
    pdf = pd.DataFrame(rows)
    expect = pdf.sort_values("o").copy()
    expect["cs"] = expect.groupby("g")["v"].cumsum()

    def block(b: pd.DataFrame) -> pd.DataFrame:
        starts, ends = group_boundaries(b, ["g"])
        b = b.copy()
        cs = np.empty(len(b))
        v = b["v"].to_numpy()
        for s, e in zip(starts, ends):
            cs[s:e] = np.cumsum(v[s:e])
        b["cs"] = cs
        return b[["g", "o", "cs"]]

    out = _run_block_stream(
        spark, pdf, ["g"], block, "g long, o long, cs double", batch=batch
    ).sort_values("o").reset_index(drop=True)
    exp = expect[["g", "o", "cs"]].sort_values("o").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


# ------------------------------------------- consumers under stress

def test_ewma_parity_with_pandas_under_tiny_batches(spark):
    rng = np.random.RandomState(7)
    pdf = pd.DataFrame(
        {
            "g": rng.randint(0, 10, 80),
            "o": np.arange(80),
            "v": rng.randn(80).round(3),
        }
    )
    df = spark.createDataFrame(pdf)
    with tiny_arrow_batches(spark, 3):
        for adjust in (False, True):
            got = (
                E.ewma(df, "v", alpha=0.3, byvars="g", ordervar="o", adjust=adjust)
                .toPandas()
                .sort_values("o")
                .reset_index(drop=True)
            )
            exp = pdf.sort_values("o").reset_index(drop=True).copy()
            exp["v_ewma"] = (
                exp.groupby("g")["v"]
                .transform(lambda s: s.ewm(alpha=0.3, adjust=adjust).mean())
            )
            np.testing.assert_allclose(
                got.sort_values("o")["v_ewma"].to_numpy(),
                exp["v_ewma"].to_numpy(),
                rtol=1e-12,
            )


def test_groupby_transform_parity_under_tiny_batches(spark):
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame(
        {
            "g": rng.randint(0, 12, 60),
            "o": np.arange(60),
            "v": rng.randn(60).round(3),
        }
    )
    df = spark.createDataFrame(pdf)
    with tiny_arrow_batches(spark, 3):
        got = (
            pus.groupby_merge(
                df, "g", "transform", lambda s: s.cumsum(),
                subset="v", ordervar="o",
            )
            .toPandas()
            .sort_values("o")
            .reset_index(drop=True)
        )
    exp = pdf.sort_values("o").reset_index(drop=True).copy()
    exp["cs"] = exp.groupby("g")["v"].cumsum()
    np.testing.assert_allclose(
        got["v_transform"].to_numpy(), exp["cs"].to_numpy(), rtol=1e-12
    )
