"""Record linkage / entity resolution — blocked edit-distance matching.

The reference engine has no fuzzy-matching surface (its merges are
exact-key: reference ``pd_utils/merge.py``); this module is the
engine extension for the messy-key reality of large corpora: the same
real-world entity arrives spelled three ways (typos, token
reorderings, punctuation drift) and an exact join silently
under-links. The design is the standard two-phase shape used by
every scalable linkage system (Fellegi–Sunter era blocking +
verify):

1. **Block** — a cheap, high-recall generator keyed on shared
   normalized tokens. Exactly the LSH recipe from
   ``extensions/dedup.py``, specialized to short entity strings: the
   candidate self-join meets only within a token bucket, so the
   all-pairs O(n²) never materializes. Oversized buckets (stopword-ish
   tokens shared by a large fraction of the corpus — the skew hazard)
   are dropped by the shared ``_cap_buckets`` flood guard with an
   ``observe``-metric audit trail (``linkage_block_cap*``), the same
   channel the LSH family uses.
2. **Verify** — exact Levenshtein on the normalized strings, computed
   JVM-side with the THRESHOLDED form (``levenshtein(a, b, k)``,
   Spark >= 3.5): the DP early-exits down a banded diagonal once the
   distance provably exceeds ``k``, so verification cost is
   O(k·min(len)) per candidate instead of O(len²) — at 100 TB the
   verify stage is the bill, and the threshold is the knob.

Scale shape: one shuffle to build token blocks, one shuffle for the
within-block self-join, distance entirely map-side. No window over
the corpus, no driver collect, no UDF. Entity-id closure
(``match_entities``) reuses ``connected_components`` — pointer-jumped
min-label propagation over the PAIRS frame, which is orders of
magnitude smaller than the record frame.

Relation to ``operators/merge.fuzzy_join`` / ``linkage_score``: that
pair is the lightweight TWO-TABLE enrich shape (prefix/soundex block
keys, one row per candidate pair, Fellegi–Sunter field scoring on
top). This module is the corpus-scale SELF-JOIN family: token/q-gram
blocking with flood caps and observe-metric audits, thresholded
early-exit verification, deterministic best-match selection, and
transitive entity closure — the near-dup-dedup recipe applied to
entity strings. Use ``fuzzy_join`` to attach a reference list;
use this module to resolve a dirty corpus against itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pd_utils_spark.extensions.dedup import _cap_buckets, connected_components

__all__ = [
    "normalize_entity",
    "token_sort_key",
    "blocked_edit_pairs",
    "match_entities",
    "edit_join",
]


def normalize_entity(col: Column | str) -> Column:
    """Canonical form for entity strings: lowercase, every run of
    non-alphanumerics collapsed to one space, ends trimmed. Pure
    column expression (whole-stage codegen) — identical semantics in
    ANSI SQL as ``trim(regexp_replace(lower(x), '[^a-z0-9]+', ' ',
    'g'))``, which is what the DuckDB oracles state."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))


def token_sort_key(col: Column | str) -> Column:
    """Token-sorted canonical key: normalized tokens sorted and
    rejoined. Exact-match on this key links pure token reorderings
    ("ACME Corp Ltd" == "ltd corp acme") at hash-join cost — the
    zero-edit fast path to run BEFORE paying pairwise distances."""
    return F.array_join(F.array_sort(F.split(normalize_entity(col), " ")), " ")


def _norm_tokens(norm: Column, min_token_len: int) -> Column:
    return F.array_distinct(
        F.filter(F.split(norm, " "), lambda t: F.length(t) >= min_token_len)
    )


def _blocking_keys(
    norm_col: str, blocker: str, min_token_len: int, qgram: int
) -> Column:
    """Distinct blocking keys for one record, as an array column over
    an already-materialized normalized-string column.

    - ``token``: whitespace tokens of length >= ``min_token_len``.
      Cheap and low-flood, but blind to records that share no whole
      token — a single-token name with a leading typo is missed.
    - ``qgram``: every character ``qgram``-gram of the normalized
      string (strings shorter than ``qgram`` key on themselves).
      Catches intra-token typos at materially higher candidate cost —
      common grams flood (handled by ``max_block``), and each record
      emits ~len(norm) keys instead of ~n_tokens.
    """
    if blocker == "token":
        return _norm_tokens(F.col(norm_col), min_token_len)
    if blocker == "qgram":
        grams = F.expr(
            f"transform(sequence(1, length({norm_col}) - {qgram - 1}),"
            f" i -> substring({norm_col}, i, {qgram}))"
        )
        # sequence(1, n) with n <= 0 would DESCEND ([1, 0]); guard short
        # strings by keying them on the whole normalized string
        return F.array_distinct(
            F.when(F.length(norm_col) >= qgram, grams).otherwise(
                F.array(F.col(norm_col))
            )
        )
    raise ValueError(f"unknown blocker {blocker!r}: use 'token' or 'qgram'")


def blocked_edit_pairs(
    df: DataFrame,
    textcol: str = "name",
    idcol: str = "id",
    max_dist: int = 2,
    min_token_len: int = 3,
    max_block: int | None = 10_000,
    keep_norm: bool = False,
    blocker: str = "token",
    qgram: int = 3,
) -> DataFrame:
    """Candidate record pairs within Levenshtein distance ``max_dist``
    of each other, generated by shared-blocking-key joins
    (``blocker='token'`` default, or ``'qgram'`` for character
    n-gram blocking — see ``_blocking_keys`` for the tradeoff).

    Returns distinct ``(id_a, id_b)`` with ``id_a < id_b``, plus
    ``edit_distance`` (exact, on the normalized strings) and
    ``edit_similarity`` (``1 - dist / max(len)``, in [0, 1]).

    Recall contract: a pair is found iff the two normalized strings
    share at least one blocking key whose block survived ``max_block``
    (dropped-block row counts are observable via the
    ``linkage_block_cap*`` metric). With token blocking, two strings
    within a small edit distance that share NO whole token (e.g.
    one-token names with a typo) are missed — that is the documented
    tradeoff; ``blocker='qgram'`` closes it at higher candidate cost
    (a d-edit pair of length-L strings still shares a q-gram whenever
    L >= q * (d + 1) + d - 1, the standard q-gram count filter
    guarantee — with q=3, d=2: L >= 10).

    ``min_token_len`` exists because short tokens (initials, digit
    fragments) are the stopwords of entity strings: they block
    everything with everything. ``max_block`` is the hard cap behind
    that heuristic — at 100 TB a token shared by 1% of a billion
    records is a 10-million-row bucket and a ~5e13-pair self-join;
    the cap turns the flood into an observable drop instead of a
    runaway stage."""
    norm = normalize_entity(F.col(textcol))
    base = df.select(F.col(idcol).alias("__id__"), norm.alias("__norm__"))
    toks = base.select(
        "__id__",
        "__norm__",
        F.explode(_blocking_keys("__norm__", blocker, min_token_len, qgram)).alias(
            "__blk__"
        ),
    )
    if max_block is not None:
        toks = _cap_buckets(toks, ["__blk__"], max_block, "linkage_block_cap")
    a, b = toks.alias("a"), toks.alias("b")
    # length prefilter (r11, guide §2.3 "shuffle fewer bytes"): a pair
    # with |len(a) - len(b)| > max_dist cannot pass the Levenshtein
    # verify (each edit changes length by at most 1), so dropping it
    # HERE — map-side, before the dropDuplicates exchange — removes the
    # doomed candidates and their norm strings from the shuffle instead
    # of after it. Result set provably unchanged.
    cand = (
        a.join(b, "__blk__")
        .filter(F.col("a.__id__") < F.col("b.__id__"))
        .filter(
            F.abs(
                F.length(F.col("a.__norm__")) - F.length(F.col("b.__norm__"))
            )
            <= max_dist
        )
        .select(
            F.col("a.__id__").alias("id_a"),
            F.col("b.__id__").alias("id_b"),
            F.col("a.__norm__").alias("__na__"),
            F.col("b.__norm__").alias("__nb__"),
        )
    )
    # thresholded levenshtein: -1 when distance > max_dist (early-exit
    # banded DP); kept rows carry the EXACT distance. Verify BEFORE the
    # dedup exchange (r11, guide §2.3): most candidates fail the
    # verify, so filtering first shrinks the dropDuplicates shuffle
    # from every within-block meeting to the true pair set. A pair
    # sharing several blocks pays the (early-exit, O(max_dist*len))
    # distance once per shared block — measured far cheaper than
    # shuffling the unverified candidate set; dedup rows of one pair
    # are bit-identical (distance is a function of the pair), so the
    # kept row is deterministic.
    dist = F.levenshtein(F.col("__na__"), F.col("__nb__"), max_dist)
    out = (
        cand.withColumn("edit_distance", dist)
        .filter(F.col("edit_distance") >= 0)
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "edit_similarity",
            F.round(
                1.0
                - F.col("edit_distance")
                / F.greatest(
                    F.length("__na__"), F.length("__nb__"), F.lit(1)
                ),
                6,
            ),
        )
    )
    cols = ["id_a", "id_b", "edit_distance", "edit_similarity"]
    if keep_norm:
        out = out.withColumnRenamed("__na__", "norm_a").withColumnRenamed(
            "__nb__", "norm_b"
        )
        cols += ["norm_a", "norm_b"]
    return out.select(*cols)


def match_entities(
    df: DataFrame,
    textcol: str = "name",
    idcol: str = "id",
    max_dist: int = 2,
    min_token_len: int = 3,
    max_block: int | None = 10_000,
    out: str = "entity_id",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    blocker: str = "token",
    qgram: int = 3,
) -> DataFrame:
    """Resolve records to entities: ``blocked_edit_pairs`` edges →
    ``connected_components`` → every record labeled with the SMALLEST
    record id in its match component (records matching nothing keep
    their own id). Transitive closure is deliberate: a~b and b~c link
    a and c even when dist(a, c) > ``max_dist`` — chains of drifted
    spellings resolve to one entity, the standard linkage semantics.

    The component step iterates over the PAIRS frame only (pointer
    jumping, O(log n) rounds); the record frame is touched once by a
    single left join."""
    pairs = blocked_edit_pairs(
        df,
        textcol=textcol,
        idcol=idcol,
        max_dist=max_dist,
        min_token_len=min_token_len,
        max_block=max_block,
        blocker=blocker,
        qgram=qgram,
    )
    cc = connected_components(
        pairs.select("id_a", "id_b"),
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
    ).select(F.col("id_a").alias(idcol), F.col("component").alias("__ent__"))
    return (
        df.join(cc, idcol, "left")
        .withColumn(out, F.coalesce(F.col("__ent__"), F.col(idcol)))
        .drop("__ent__")
    )


def edit_join(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    left_id: str = "id",
    right_id: str = "id",
    max_dist: int = 2,
    min_token_len: int = 3,
    max_block: int | None = 10_000,
    best: bool = True,
) -> DataFrame:
    """Fuzzy left-to-right join across two datasets: each left record
    meets right records sharing a blocking token, pairs within
    ``max_dist`` normalized Levenshtein survive. With ``best=True``
    (default) each left id keeps its single best match — smallest
    distance, ties broken by smallest right id — selected with a
    ``min(struct(dist, right_id))`` partial aggregate (map-side
    combine; never a window sort over a hot key, the de-skew rule
    shared with ``dedup_keep_best``). Left records with no candidate
    are absent from the output (inner semantics); left-join and
    re-coalesce at the call site when unmatched rows must survive.

    Returns ``(left_<left_id>, right_<right_id>, edit_distance,
    edit_similarity)`` — the id columns are always prefixed so the
    two sides never collide."""
    lid, rid = "left_" + left_id, "right_" + right_id
    lnorm = left.select(
        F.col(left_id).alias(lid), normalize_entity(F.col(left_text)).alias("__ln__")
    )
    rnorm = right.select(
        F.col(right_id).alias(rid), normalize_entity(F.col(right_text)).alias("__rn__")
    )
    ltoks = lnorm.select(
        lid, "__ln__", F.explode(_norm_tokens(F.col("__ln__"), min_token_len)).alias("__blk__")
    )
    rtoks = rnorm.select(
        rid, "__rn__", F.explode(_norm_tokens(F.col("__rn__"), min_token_len)).alias("__blk__")
    )
    if max_block is not None:
        ltoks = _cap_buckets(ltoks, ["__blk__"], max_block, "linkage_left_cap")
        rtoks = _cap_buckets(rtoks, ["__blk__"], max_block, "linkage_right_cap")
    cand = (
        ltoks.join(rtoks, "__blk__")
        # same length prefilter as blocked_edit_pairs (r11): prune
        # can't-match pairs map-side, before any exchange
        .filter(
            F.abs(F.length(F.col("__ln__")) - F.length(F.col("__rn__")))
            <= max_dist
        )
        .select(lid, rid, "__ln__", "__rn__")
    )
    # verify before deduplicating, as in blocked_edit_pairs (r11):
    # the thresholded distance is recomputed per shared block but the
    # exchange then carries only VERIFIED pairs. With best=True the
    # dedup exchange disappears entirely — min(struct(...)) over a
    # multiset equals min over its set (duplicate (lid, rid) rows are
    # bit-identical), so the map-side-combined best-match aggregate
    # absorbs duplicates for free.
    dist = F.levenshtein(F.col("__ln__"), F.col("__rn__"), max_dist)
    scored = cand.withColumn("edit_distance", dist).filter(
        F.col("edit_distance") >= 0
    )
    if not best:
        scored = scored.dropDuplicates([lid, rid])
    if best:
        scored = (
            scored.groupBy(lid)
            .agg(
                F.min(
                    F.struct(
                        F.col("edit_distance"),
                        F.col(rid),
                        F.col("__ln__"),
                        F.col("__rn__"),
                    )
                ).alias("__best__")
            )
            .select(
                lid,
                F.col("__best__")[rid].alias(rid),
                F.col("__best__.edit_distance").alias("edit_distance"),
                F.col("__best__.__ln__").alias("__ln__"),
                F.col("__best__.__rn__").alias("__rn__"),
            )
        )
    out = scored.withColumn(
        "edit_similarity",
        F.round(
            1.0
            - F.col("edit_distance")
            / F.greatest(F.length("__ln__"), F.length("__rn__"), F.lit(1)),
            6,
        ),
    )
    return out.select(lid, rid, "edit_distance", "edit_similarity")
