"""Distributed BPE tokenizer training (Sennrich et al. 2016) as
relational algebra.

Training a byte-pair-encoding vocabulary is the canonical
pre-training step the reference has no analog for: iteratively find
the most frequent adjacent symbol pair in the corpus and merge it.
The textbook implementation is a single-machine loop over a python
dict; this one is the Spark form, built so each iteration is ONE
map-side-combinable aggregation over the DISTINCT-WORD table (not
the corpus — pair counts are word-pair-counts weighted by word
frequency, so the working set collapses from tokens to vocabulary):

1. Words become boundary-wrapped symbol strings: ``hello`` ->
   ``(h)(e)(l)(l)(o)(_)`` (``_`` is the end-of-word symbol; the
   parens make symbol boundaries explicit so merges can be applied
   with plain string ``replace``).
2. Per iteration: split on ``)(`` -> adjacent symbol pairs ->
   ``groupBy(pair).agg(sum(word_freq))`` -> argmax with a total
   tie-break (freq desc, then left, then right) — one bounded
   ``limit(1)`` collect per iteration, nothing else reaches the
   driver.
3. The winning pair is applied everywhere with
   ``replace(s, '(l)(r)', '(lr)')`` — leftmost non-overlapping
   sequential replacement, which IS greedy BPE merge order, and has
   identical semantics in Spark and DuckDB. That's what makes the
   whole training loop expressible as unrolled relational CTEs: the
   oracle replays every iteration exactly (the kmeans/pagerank
   precedent), no pinned literals needed.

The end-of-word symbol can never appear as the LEFT of a learned
pair (it has no right neighbor inside a word), so applying merges to
a whole concatenated document string never merges across word
boundaries — ``apply_bpe`` exploits that to tokenize documents with
one replace chain instead of a per-word loop.

Scale shape: iterations touch the distinct-word frame (vocabulary-
sized, orders of magnitude smaller than the corpus); ``apply_bpe``
is a pure map over documents with ``n_merges`` chained replaces.
At 100 TB you learn on the word-count table (one corpus shuffle to
build, reusable across iterations) and apply map-only."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_counts",
    "learn_bpe",
    "apply_bpe",
    "bpe_token_stats",
    "bpe_vocab",
]

_EOW = "_"


def _norm(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "))


def _wrap(col_name: str, eow: str = _EOW) -> str:
    """SQL expression wrapping a word column into its boundary-marked
    symbol string: hello -> (h)(e)(l)(l)(o)(_)."""
    return (
        f"'(' || array_join(transform(sequence(1, length({col_name})),"
        f" i -> substring({col_name}, i, 1)), ')(') || ')({eow})'"
    )


def word_counts(df: DataFrame, textcol: str = "text") -> DataFrame:
    """(word, cnt) over the normalized corpus — the vocabulary-sized
    frame every BPE iteration aggregates instead of the corpus."""
    return (
        df.select(F.explode(F.split(_norm(F.col(textcol)), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _pair_counts(wrapped: DataFrame) -> DataFrame:
    toks = wrapped.select(
        F.split(F.expr("substring(s, 2, length(s)-2)"), r"\)\(").alias("t"),
        "cnt",
    ).filter(F.size("t") >= 2)  # sequence(1, 0) would DESCEND
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t)-1),"
                " i -> struct(element_at(t, i) AS l, element_at(t, i+1) AS r))"
            )
        ).alias("p"),
        "cnt",
    )
    return pairs.groupBy("p.l", "p.r").agg(F.sum("cnt").alias("f"))


def learn_bpe(
    df: DataFrame,
    textcol: str = "text",
    n_merges: int = 10,
    min_freq: int = 1,
    eow: str = _EOW,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus. Returns a
    DataFrame ``(rank, left, right, merged, freq)`` in merge order —
    the vocabulary artifact ``apply_bpe`` consumes. Stops early when
    no pair reaches ``min_freq`` (fewer rows than asked). Ties are
    totally ordered (freq desc, left asc, right asc), so the result
    is deterministic on any partitioning.

    One ``limit(1).collect()`` per iteration; every aggregation runs
    over the distinct-word frame (persisted once)."""
    spark = df.sparkSession
    wc = word_counts(df, textcol)
    base = wc.select(F.expr(_wrap("w", eow)).alias("s"), "cnt").persist()
    try:
        merges: list[tuple[int, str, str, int]] = []
        cur = base
        for rank in range(1, n_merges + 1):
            top = (
                _pair_counts(cur)
                .orderBy(F.desc("f"), "l", "r")
                .limit(1)
                .collect()
            )
            if not top or top[0]["f"] < min_freq:
                break
            l, r, f = top[0]["l"], top[0]["r"], int(top[0]["f"])
            merges.append((rank, l, r, f))
            cur = cur.select(
                F.expr(f"replace(s, '({l})({r})', '({l}{r})')").alias("s"),
                "cnt",
            )
        return spark.createDataFrame(
            [(rank, l, r, l + r, f) for rank, l, r, f in merges],
            "rank int, left string, right string, merged string, freq bigint",
        )
    finally:
        base.unpersist()


def apply_bpe(
    df: DataFrame,
    merges: DataFrame | list,
    textcol: str = "text",
    out: str = "bpe_tokens",
    eow: str = _EOW,
) -> DataFrame:
    """Tokenize documents with a learned merge table: normalized words
    are boundary-wrapped, concatenated, rewritten by every merge in
    rank order (one ``replace`` each — map-only), and split back into
    the final symbol array (``out``). The end-of-word symbol is never
    the left of a merge, so the concatenated form cannot merge across
    word boundaries. Documents with no alphanumeric content get an
    empty array."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("rank").collect()
        pairs = [(r["left"], r["right"]) for r in rows]
    else:
        pairs = [(m[0], m[1]) for m in merges]
    return _apply_bpe_expr(df, pairs, textcol, out, eow)


def _apply_bpe_expr(
    df: DataFrame, pairs: list, textcol: str, out: str, eow: str
) -> DataFrame:
    norm = _norm(F.col(textcol))
    with_words = df.withColumn(
        "__bpe_words__",
        F.filter(F.split(norm, " "), lambda w: F.length(w) > 0),
    )
    wrapped = (
        "array_join(transform(__bpe_words__, w -> "
        + _wrap("w", eow)
        + "), '')"
    )
    expr = wrapped
    for l, r in pairs:
        expr = f"replace({expr}, '({l})({r})', '({l}{r})')"
    rewritten = with_words.withColumn("__bpe_s__", F.expr(expr))
    toks = (
        "CASE WHEN size(__bpe_words__) = 0"
        " THEN cast(array() AS array<string>)"
        " ELSE split(substring(__bpe_s__, 2, length(__bpe_s__) - 2),"
        r" '\\)\\(') END"
    )
    return (
        rewritten.withColumn(out, F.expr(toks))
        .drop("__bpe_words__", "__bpe_s__")
    )


def bpe_vocab(
    df: DataFrame,
    merges: DataFrame | list,
    textcol: str = "text",
    eow: str = _EOW,
) -> DataFrame:
    """The trained vocabulary: every symbol the tokenizer emits over
    this corpus with its total occurrence count — ``(symbol, n)``.
    Computed over the distinct-word table weighted by word frequency
    (one corpus shuffle for the counts, vocabulary-sized everything
    after), so it is exactly the token distribution ``apply_bpe``
    would produce over the corpus. The artifact you ship with the
    merges: its size is the model's vocab size, its tail is the
    byte-fallback pressure."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("rank").collect()
        pairs = [(r["left"], r["right"]) for r in rows]
    else:
        pairs = [(m[0], m[1]) for m in merges]
    wc = word_counts(df, textcol)
    expr = _wrap("w", eow)
    for l, r in pairs:
        expr = f"replace({expr}, '({l})({r})', '({l}{r})')"
    rewritten = wc.select(F.expr(expr).alias("__s__"), "cnt")
    toks = rewritten.select(
        F.explode(
            F.expr(
                r"split(substring(__s__, 2, length(__s__) - 2), '\\)\\(')"
            )
        ).alias("symbol"),
        "cnt",
    )
    return toks.groupBy("symbol").agg(F.sum("cnt").cast("bigint").alias("n"))


def bpe_token_stats(
    df: DataFrame,
    merges: DataFrame | list,
    byvars: str | list = "source",
    textcol: str = "text",
    eow: str = _EOW,
) -> DataFrame:
    """Compression diagnostic per group: documents tokenized with and
    without the merges — ``n_docs``, initial symbol count (chars +
    one EOW per word), BPE token count, and the compression ratio.
    The number a tokenizer-training run is judged by."""
    from pd_utils_spark.utils import to_list

    byvars_l = to_list(byvars)
    t = apply_bpe(df, merges, textcol=textcol, out="__bpe__", eow=eow)
    norm = _norm(F.col(textcol))
    words = F.filter(F.split(norm, " "), lambda w: F.length(w) > 0)
    initial = F.aggregate(
        F.transform(words, lambda w: F.length(w) + 1),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    per_doc = t.select(
        *byvars_l,
        initial.alias("__init__"),
        F.size("__bpe__").alias("__bpe_n__"),
    )
    return per_doc.groupBy(*byvars_l).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__init__").cast("bigint").alias("n_symbols_initial"),
        F.sum("__bpe_n__").cast("bigint").alias("n_tokens_bpe"),
        F.round(
            F.sum("__bpe_n__") / F.sum("__init__"), 6
        ).alias("compression"),
    )
