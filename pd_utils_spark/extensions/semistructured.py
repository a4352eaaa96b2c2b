"""Semi-structured columns via the VARIANT type (Spark 4.x).

Event streams, API payloads, and scraped metadata arrive as JSON
strings with drifting schemas. The two classic Spark answers both
hurt at 100 TB: ``from_json`` demands a schema up front (drift =>
silent nulls or a re-run), and ``get_json_object`` RE-PARSES the
string once per extracted path (k paths = k full parses per row).
VARIANT is the engine's third way: ``parse_json`` parses ONCE into a
binary encoding with a field dictionary, after which every
``variant_get`` path access is a cheap binary probe — typed, lazy,
schema-on-read, entirely JVM-side expressions inside whole-stage
codegen. Parquet written from variant columns is shredding-eligible
(the writer can hoist hot fields into typed subcolumns), so the
format is also the long-term storage answer, not just an in-flight
convenience.

Everything here is a thin, tested composition of the native
expressions — the value is the pattern: parse once at ingest, keep
the variant column, extract typed projections per consumer, discover
drift with ``variant_schema_profile`` (``schema_of_variant_agg`` —
the aggregate merged schema, a map-side-combinable sketch of the
structure)."""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pd_utils_spark.utils import to_list

__all__ = [
    "parse_variant",
    "variant_fields",
    "variant_schema_profile",
    "explode_variant_array",
]


def parse_variant(
    df: DataFrame, col: str, out: str | None = None, lenient: bool = False
) -> DataFrame:
    """Parse a JSON-string column into a VARIANT column (``out`` or
    ``f"{col}_v"``). ``lenient=True`` uses ``try_parse_json`` —
    malformed documents become NULL instead of failing the job, the
    right default at ingest where one bad payload must not kill a
    100 TB pass (count the nulls; don't crash on them). The default
    is strict: corrupt input raises, the right default in tests and
    curated data."""
    name = out or f"{col}_v"
    fn = "try_parse_json" if lenient else "parse_json"
    return df.withColumn(name, F.expr(f"{fn}({col})"))


def variant_fields(
    df: DataFrame,
    vcol: str,
    fields: Mapping[str, tuple[str, str]],
    strict: bool = False,
) -> DataFrame:
    """Extract typed fields from a variant column: ``fields`` maps
    output column name -> (path, spark type), e.g. ``{"qty":
    ("$.item.qty", "double")}``. Default is ``try_variant_get`` —
    missing paths and uncastable values yield NULL (schema drift is
    data, not an error). ``strict=True`` uses ``variant_get``, which
    raises on an invalid cast — for contracts you want enforced.
    Each extraction is a binary probe of the parsed encoding; the
    JSON text is never re-parsed."""
    fn = "variant_get" if strict else "try_variant_get"
    out = df
    for name, (path, dtype) in fields.items():
        out = out.withColumn(
            name, F.expr(f"{fn}({vcol}, '{path}', '{dtype}')")
        )
    return out


def variant_schema_profile(
    df: DataFrame, vcol: str, byvars: str | Sequence[str] | None = None
) -> DataFrame:
    """Discover structure: per group (or globally), the MERGED schema
    of every variant value (``schema_of_variant_agg``) plus counts of
    rows and non-null variants. The merged schema is the drift
    detector — run it per source/day and diff the strings; a new
    field or a type widening shows up as a schema change long before
    a consumer's cast starts returning nulls. Aggregates map-side
    like any sketch; output is one row per group."""
    byvars_l = to_list(byvars)
    aggs = [
        F.expr(f"schema_of_variant_agg({vcol})").alias("merged_schema"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col(vcol).isNotNull().cast("long")).cast("bigint").alias("n_parsed"),
    ]
    if byvars_l:
        return df.groupBy(*byvars_l).agg(*aggs)
    return df.agg(*aggs)


def explode_variant_array(
    df: DataFrame, vcol: str, path: str, out: str = "element"
) -> DataFrame:
    """Explode a variant array field into one row per element (the
    element stays VARIANT — extract typed fields from it with
    ``variant_fields``). Missing/non-array paths contribute no rows
    (``explode`` of NULL), matching JSON-table semantics."""
    return df.withColumn(
        out,
        F.explode(F.expr(f"try_variant_get({vcol}, '{path}', 'array<variant>')")),
    )
