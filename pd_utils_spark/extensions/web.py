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


#: query parameters stripped by canonical_url — tracking/attribution
#: noise that makes otherwise-identical pages look distinct (the #1
#: cause of spurious URL-level duplicates in web corpora)
TRACKING_PARAM_PATTERN = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|ref)(=|$)"


def canonical_url(url: Column | str) -> Column:
    """Canonical form of an http(s) URL, as pure column expressions:

    - scheme and host lower-cased;
    - default ports dropped (``:80`` for http, ``:443`` for https);
    - fragment removed;
    - tracking parameters removed (``TRACKING_PARAM_PATTERN``:
      utm_*, gclid, fbclid, msclkid, mc_eid, ref);
    - remaining query parameters sorted (order-insensitive dedup key);
    - trailing slashes stripped from the path (all of them —
      one pass reaches the fixed point).

    Non-http(s) strings pass through unchanged. URL-level dedup on the
    canonical form collapses the tracking-link explosion that URL
    exact-match misses; zero shuffle, zero UDF (JVM regex + array
    expressions), and the same regex subset runs in SQL engines so the
    oracle hash-matches.
    """
    c = F.col(url) if isinstance(url, str) else url
    # (?i) covers scheme-case variants (HTTPS://…); supported by both
    # Java regex and RE2, staying inside the portable dialect
    scheme = F.lower(F.regexp_extract(c, r"(?i)^(https?)://", 1))
    host = F.lower(F.regexp_extract(c, r"(?i)^https?://([^/\s:?#]+)", 1))
    port = F.regexp_extract(c, r"(?i)^https?://[^/\s:?#]+:(\d+)", 1)
    path = F.regexp_extract(c, r"(?i)^https?://[^/\s?#]+([^\s?#]*)", 1)
    query = F.regexp_extract(c, r"^[^\s#?]*\?([^\s#]*)", 1)

    default_port = F.when(scheme == "http", F.lit("80")).otherwise(F.lit("443"))
    hostport = F.concat(
        host,
        F.when((port != "") & (port != default_port), F.concat(F.lit(":"), port))
        .otherwise(F.lit("")),
    )
    # ALL trailing slashes, not one: "//" must not need a second
    # pass (idempotence — property-tested)
    path_norm = F.regexp_replace(path, r"/+$", "")
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_PATTERN),
    )
    qstr = F.array_join(F.array_sort(params), "&")
    built = F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path_norm,
        F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", c).otherwise(built)


def canonicalize_urls(
    df: DataFrame, urlcol: str = "url", out: str = "canonical_url"
) -> DataFrame:
    """Frame form of :func:`canonical_url`: adds ``out`` alongside the
    raw URL column. Compose with ``extract_urls`` + ``explode`` for
    in-text URLs, or run directly on a crawl-frontier URL column; the
    canonical string is the dedup/join key for URL-level pipelines."""
    return df.withColumn(out, canonical_url(F.col(urlcol)))


def strip_html(
    df: DataFrame,
    textcol: str = "text",
    out: str = "clean_text",
) -> DataFrame:
    """Regex-based HTML-to-text extraction — the first transform a
    web-crawl pipeline applies: ``<script>``/``<style>`` blocks go
    WITH their contents, comments and remaining tags go, the common
    entities decode (&amp; &lt; &gt; &quot; &#39; &nbsp;), and
    whitespace collapses. An engine-portable RE2-safe regex subset
    (no backtracking, no lookaround), so the oracle can replay it
    exactly; a full parser (trafilatura/bs4) belongs in a Pandas-UDF
    lane when fidelity matters more than throughput — this is the
    JVM-speed bulk path.

    Map-only column expressions; shuffle-free at any scale.
    """
    t = F.col(textcol)
    # (?is): case-insensitive, dot-matches-newline — supported by both
    # Java regex and RE2
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    for ent, rep in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return df.withColumn(out, t)


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
