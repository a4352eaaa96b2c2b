"""Targeted data selection: DSIR importance resampling.

Implements Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023): score every raw-corpus document by how much more likely
its hashed n-gram features are under a TARGET distribution (e.g. a
small high-quality / in-domain sample) than under the raw corpus
distribution, then resample the top of that ranking with Gumbel noise
so selection is a draw from the importance weights rather than a hard
argmax. The hashed n-gram bag-of-features estimator is the paper's
recommended cheap proxy for the target/raw likelihood ratio.

Scale shape (all operators):

- Feature extraction is map-only (normalize -> tokenize -> sliding
  n-grams -> 60-bit md5 fingerprint -> ``pmod`` bucket). Features are
  hashed into a FIXED number of buckets, so both distribution
  estimates aggregate to ``buckets`` rows regardless of corpus size —
  a partial-agg shuffle of O(buckets), then a broadcast of the
  log-ratio table (10k rows by default) back onto the exploded
  corpus features. Per-document weights are one shuffle on the doc id.
- Nothing is collected to the driver; selection is a global
  ``orderBy(...).limit(k)`` which Spark executes as TakeOrdered
  (per-partition top-k merged on the driver, no total sort shuffle).
- Determinism: the Gumbel noise is derived from the md5 hash of the
  document id (not an RNG), so the same inputs select the same
  documents on any engine / partitioning — replayable by the DuckDB
  oracle and stable across reruns, like every sampler in
  ``extensions/sampling.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pd_utils_spark.extensions.dedup import _norm
from pd_utils_spark.extensions.text import _tokens

__all__ = [
    "hashed_ngram_features",
    "dsir_log_weights",
    "dsir_select",
]

# 2^51 — the Gumbel uniform's integer range; small enough that the
# (fp % M + 1) / (M + 2) quotient is exact-input IEEE division on both
# engines, large enough that collisions in u are negligible.
_GUMBEL_M = 1 << 51


def _fp60(c: Column) -> Column:
    """60-bit non-negative bigint fingerprint of a string column
    (first 15 hex chars of md5) — the engine-portable hash used across
    the dedup/sampling families (DuckDB replay:
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hashed_ngram_features(
    df: DataFrame,
    textcol: str = "text",
    idcol: str = "doc_id",
    buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
    out: str = "bucket",
) -> DataFrame:
    """Explode each document into its hashed n-gram feature OCCURRENCES
    (one output row per n-gram position, NOT distinct — DSIR's
    bag-of-ngrams estimator counts multiplicity): ``(idcol, out)``
    with ``out`` an int bucket in ``[0, buckets)``.

    ``ns`` controls the gram sizes (the paper uses unigrams +
    bigrams). A document contributes n-grams for a given ``n`` only
    when it has at least ``n`` tokens; empty documents contribute
    nothing. Map-only: no shuffle, no UDF."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1: {buckets}")
    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"ns must be non-empty positive ints: {ns}")
    norm = _norm(F.col(textcol))
    toked = df.select(
        F.col(idcol), norm.alias("__norm__"), _tokens(norm).alias("__toks__")
    ).filter(F.length(F.col("__norm__")) > 0)
    toks = F.col("__toks__")
    size = F.size(toks)

    # NOTE: a `lambda i, n=n:` default-arg closure would be WRONG here —
    # F.transform calls a two-parameter lambda as (element, index),
    # silently overriding the default with the array index
    def gram(n: int):
        return lambda i: F.concat_ws(" ", F.slice(toks, i, n))

    per_n = [
        F.when(
            size >= n,
            F.transform(F.sequence(F.lit(1), size - F.lit(n - 1)), gram(n)),
        ).otherwise(F.array().cast("array<string>"))
        for n in ns
    ]
    grams = per_n[0] if len(per_n) == 1 else F.concat(*per_n)
    return toked.select(
        F.col(idcol), F.explode(grams).alias("__g__")
    ).select(
        F.col(idcol),
        F.pmod(_fp60(F.col("__g__")), F.lit(buckets)).cast("int").alias(out),
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    textcol: str = "text",
    idcol: str = "doc_id",
    buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
    smoothing: float = 1.0,
    target_textcol: str | None = None,
) -> DataFrame:
    """Per-document DSIR log importance weight:
    ``log w(doc) = sum over the doc's feature occurrences of
    ln p_target(bucket) - ln p_raw(bucket)``, with add-``smoothing``
    bucket distributions ``p(b) = (count_b + s) / (total + s*buckets)``
    so buckets unseen in the target stay finite.

    Returns ``(idcol, n_feats, log_weight)`` — one row per raw
    document that produced at least one feature. Higher weight =
    more target-like. ``n_feats`` is the occurrence count (long
    documents accumulate more terms; normalize by it if a
    length-neutral score is wanted).

    Scale shape: two O(buckets) aggregations (one per distribution),
    one broadcast of the ``buckets``-row log-ratio table, one shuffle
    on the doc id for the per-doc sum. The raw corpus is scanned
    twice (distribution + scoring); persist upstream if it is not a
    plain columnar scan."""
    s = float(smoothing)
    if s <= 0:
        raise ValueError(f"smoothing must be > 0: {s}")
    rawf = hashed_ngram_features(raw, textcol, idcol, buckets, ns)
    tgtf = hashed_ngram_features(
        target, target_textcol or textcol, idcol, buckets, ns
    )
    rdist = rawf.groupBy("bucket").agg(F.count(F.lit(1)).alias("__rc__"))
    tdist = tgtf.groupBy("bucket").agg(F.count(F.lit(1)).alias("__tc__"))
    rtot = rdist.agg(F.sum("__rc__").cast("double").alias("__rt__"))
    ttot = tdist.agg(F.sum("__tc__").cast("double").alias("__tt__"))
    # every bucket a raw doc can hit is in rdist by construction;
    # left-join target counts onto it and smooth the gaps
    ratio = (
        rdist.join(tdist, "bucket", "left")
        .crossJoin(F.broadcast(rtot))
        .crossJoin(F.broadcast(ttot))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("__tc__"), F.lit(0)).cast("double") + F.lit(s))
                    / (F.col("__tt__") + F.lit(s * buckets))
                )
                - F.log(
                    (F.col("__rc__").cast("double") + F.lit(s))
                    / (F.col("__rt__") + F.lit(s * buckets))
                )
            ).alias("__lr__"),
        )
    )
    return (
        rawf.join(F.broadcast(ratio), "bucket")
        .groupBy(idcol)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("__lr__").alias("log_weight"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    textcol: str = "text",
    idcol: str = "doc_id",
    buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
    smoothing: float = 1.0,
    temperature: float = 1.0,
    gumbel: bool = True,
    target_textcol: str | None = None,
) -> DataFrame:
    """Select ``k`` raw documents by DSIR importance resampling: rank
    by ``log_weight / temperature + Gumbel(doc)`` and keep the top k —
    the Gumbel-top-k trick makes this an exact sample WITHOUT
    replacement from the softmax of the importance weights (Kool et
    al. 2019), which is the paper's resampling step. ``gumbel=False``
    degrades to hard top-k by weight (ties broken by id).

    The Gumbel draw is DERIVED from the document id
    (``-ln(-ln(u))`` with ``u = (md5_60(id) mod 2^51 + 1) / (2^51 + 2)``),
    not an RNG: selection is deterministic, engine-portable, and
    independent of partitioning. Returns the selected raw rows plus
    ``n_feats``, ``log_weight`` and the ranking ``score``."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    t = float(temperature)
    if t <= 0:
        raise ValueError(f"temperature must be > 0: {t}")
    w = dsir_log_weights(
        raw, target, textcol, idcol, buckets, ns, smoothing, target_textcol
    )
    if gumbel:
        u = (
            F.pmod(_fp60(F.col(idcol).cast("string")), F.lit(_GUMBEL_M)) + F.lit(1)
        ).cast("double") / F.lit(float(_GUMBEL_M + 2))
        score = F.col("log_weight") / F.lit(t) - F.log(-F.log(u))
    else:
        score = F.col("log_weight") / F.lit(t)
    scored = w.withColumn("score", score)
    top = scored.orderBy(F.desc("score"), F.col(idcol)).limit(k)
    return raw.join(top, idcol).select(
        *[raw[c] for c in raw.columns], "n_feats", "log_weight", "score"
    )
