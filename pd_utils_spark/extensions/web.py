"""URL and domain curation for web-scraped training corpora.

Standard web-pipeline stages: extract URLs from text, derive
registrable domains, corpus-level domain statistics, and blocklist
filtering. Pure column expressions (JVM regex, arrays) — no Python in
the row path; the only shuffle is the explicit corpus aggregate in
``domain_stats``. Blocklists are broadcast.

Pattern dialect contract: same engine-portable regex subset as
``extensions.pii`` — no lookaround, no backreferences, identical
semantics in Java regex and RE2, so results hash-match a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Conservative: scheme + non-space run, trailing punctuation trimmed
# by the domain extractor rather than the matcher (trimming inside the
# pattern needs lookahead, which RE2 lacks).
URL_PATTERN = r"https?://[^\s]+"
# capture group 1 = host (stops at /, :, ?, #, or whitespace)
_HOST_PATTERN = r"https?://([^/\s:?#]+)"


def extract_urls(
    df: DataFrame, textcol: str = "text", out: str = "urls"
) -> DataFrame:
    """Array of raw URL matches per document (empty array when none)."""
    return df.withColumn(
        out, F.regexp_extract_all(F.col(textcol), F.lit(URL_PATTERN), 0)
    )


def domain_of(url: Column | str) -> Column:
    """Lower-cased host part of a URL ('' for non-URLs)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(c, _HOST_PATTERN, 1))


def url_signals(
    df: DataFrame, textcol: str = "text", prefix: str = ""
) -> DataFrame:
    """Per-document URL stats: ``n_urls`` (match count) and
    ``n_domains`` (distinct hosts). Row-local; no shuffle."""
    urls = F.regexp_extract_all(F.col(textcol), F.lit(URL_PATTERN), 0)
    domains = F.array_distinct(
        F.transform(urls, lambda u: F.lower(F.regexp_extract(u, _HOST_PATTERN, 1)))
    )
    return df.withColumn(f"{prefix}n_urls", F.size(urls)).withColumn(
        f"{prefix}n_domains", F.size(domains)
    )


def domain_stats(
    df: DataFrame, textcol: str = "text", idcol: str = "doc_id"
) -> DataFrame:
    """Corpus-level domain table: (domain, n_urls, doc_freq) — total
    URL mentions and number of distinct documents mentioning the
    domain. One explode + one partial-aggregated shuffle keyed on
    domain (cardinality = distinct domains, not corpus size)."""
    ex = df.select(
        F.col(idcol),
        F.explode(
            F.regexp_extract_all(F.col(textcol), F.lit(URL_PATTERN), 0)
        ).alias("__u__"),
    ).select(F.col(idcol), domain_of(F.col("__u__")).alias("domain"))
    return (
        ex.filter(F.length("domain") > 0)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct(idcol).alias("doc_freq"),
        )
    )


def drop_blocklisted_domains(
    df: DataFrame,
    blocklist: DataFrame | list[str],
    textcol: str = "text",
    idcol: str = "doc_id",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop documents mentioning any blocklisted domain (exact host
    match, case-insensitive). The blocklist — a frame or a plain list
    — is broadcast; matched doc ids (a small set) drive a left-anti
    join, so the corpus is never shuffled."""
    spark = df.sparkSession
    if isinstance(blocklist, list):
        bl = spark.createDataFrame(
            [(d.lower(),) for d in blocklist], [domain_col]
        )
    else:
        bl = blocklist.select(F.lower(F.col(domain_col)).alias(domain_col))
    ex = df.select(
        F.col(idcol),
        F.explode(
            F.regexp_extract_all(F.col(textcol), F.lit(URL_PATTERN), 0)
        ).alias("__u__"),
    ).select(F.col(idcol), domain_of(F.col("__u__")).alias(domain_col))
    hit = (
        ex.join(F.broadcast(bl), domain_col, "inner").select(idcol).distinct()
    )
    return df.join(F.broadcast(hit), idcol, "left_anti")
