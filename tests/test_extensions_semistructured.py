from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pd_utils_spark.extensions import semistructured as ss


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [
        (1, "a", '{"k": 1, "tags": ["x", "y"], "meta": {"v": 1.5}}'),
        (2, "a", '{"k": 2, "tags": [], "meta": {"v": 2.5}}'),
        (3, "b", '{"k": "oops", "extra": true}'),
        (4, "b", None),
    ]
    return spark.createDataFrame(rows, ["id", "src", "props"])


def test_parse_and_extract_typed(spark, payloads):
    v = ss.parse_variant(payloads, "props")
    out = ss.variant_fields(
        v, "props_v", {"k": ("$.k", "bigint"), "v": ("$.meta.v", "double")}
    )
    got = {r["id"]: (r["k"], r["v"]) for r in out.collect()}
    assert got[1] == (1, 1.5)
    assert got[2] == (2, 2.5)
    assert got[3] == (None, None)  # "oops" not castable, no meta
    assert got[4] == (None, None)


def test_strict_extraction_raises_on_bad_cast(spark, payloads):
    v = ss.parse_variant(payloads.filter("id = 3"), "props")
    strict = ss.variant_fields(v, "props_v", {"k": ("$.k", "bigint")}, strict=True)
    with pytest.raises(Exception):
        strict.collect()


def test_lenient_parse_nulls_malformed(spark):
    df = spark.createDataFrame([(1, "{bad json"), (2, '{"a": 1}')], ["id", "props"])
    v = ss.parse_variant(df, "props", lenient=True)
    got = {r["id"]: r["props_v"] for r in v.collect()}
    assert got[1] is None and got[2] is not None
    strict = ss.parse_variant(df, "props")
    with pytest.raises(Exception):
        strict.collect()


def test_schema_profile_per_group(spark, payloads):
    v = ss.parse_variant(payloads, "props")
    prof = ss.variant_schema_profile(v, "props_v", "src")
    got = {r["src"]: r for r in prof.collect()}
    assert got["a"]["n_rows"] == 2 and got["a"]["n_parsed"] == 2
    assert got["b"]["n_rows"] == 2 and got["b"]["n_parsed"] == 1
    # merged schema sees both groups' fields with merged types
    assert "TAGS" in got["a"]["merged_schema"].upper()
    assert "EXTRA" in got["b"]["merged_schema"].upper()


def test_explode_variant_array(spark, payloads):
    v = ss.parse_variant(payloads, "props")
    ex = ss.explode_variant_array(v, "props_v", "$.tags", out="tag")
    tags = [
        (r["id"], r["t"])
        for r in ex.select("id", F.expr("cast(tag as string)").alias("t")).collect()
    ]
    # id=2 has an empty array, id=3 no tags field, id=4 null: no rows
    assert sorted(tags) == [(1, "x"), (1, "y")]


def test_extraction_is_expression_only(spark, payloads):
    """The whole pipeline must stay in whole-stage codegen: no UDF, no
    extra exchange for a map-only parse+extract."""
    v = ss.variant_fields(
        ss.parse_variant(payloads, "props"), "props_v", {"k": ("$.k", "bigint")}
    )
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_variant_parquet_round_trip(spark, payloads, tmp_path):
    """VARIANT is a real storage type: write the parsed column to
    parquet, read it back, and extract — values identical to
    extracting from the in-flight column. This is the 'parse once at
    ingest, store the variant' pattern's load-bearing property."""
    v = ss.parse_variant(payloads, "props").select("id", "props_v")
    path = str(tmp_path / "variants.parquet")
    v.write.parquet(path)
    back = spark.read.parquet(path)
    assert dict(back.dtypes)["props_v"] == "variant"
    fields = {"k": ("$.k", "bigint"), "v": ("$.meta.v", "double")}
    got = {
        r["id"]: (r["k"], r["v"])
        for r in ss.variant_fields(back, "props_v", fields).collect()
    }
    want = {
        r["id"]: (r["k"], r["v"])
        for r in ss.variant_fields(v, "props_v", fields).collect()
    }
    assert got == want and len(got) == 4
