"""Property-based tests (hypothesis): operator invariants that must
hold for ANY input, complementing the golden-output tests. Example
counts are kept small — every example runs real Spark jobs."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import pd_utils_spark as pus
from pd_utils_spark.extensions import dedup as D

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

values = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64)
frames = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2), values),
    min_size=4,
    max_size=24,
)


@given(rows=frames, pct=st.floats(min_value=0.01, max_value=0.3))
@settings(**SETTINGS)
def test_winsorize_bounds_and_shape(spark, rows, pct):
    pdf = pd.DataFrame(rows, columns=["g", "x"])
    df = spark.createDataFrame(pdf)
    out = pus.winsorize(df, pct, subset="x", byvars="g").toPandas()
    assert len(out) == len(pdf)
    # every group's winsorized values lie within the group's raw range
    for g, sub in out.groupby("g"):
        raw = pdf[pdf.g == g].x
        assert sub.x.min() >= raw.min() - 1e-9
        assert sub.x.max() <= raw.max() + 1e-9


@given(rows=frames, pct=st.floats(min_value=0.01, max_value=0.3))
@settings(**SETTINGS)
def test_winsorize_approx_bounds_and_shape(spark, rows, pct):
    """The exact=False (percentile_approx) knob keeps the winsorize
    contract: row count preserved, values within each group's raw
    range (the cut points are approximate, the clipping is not)."""
    pdf = pd.DataFrame(rows, columns=["g", "x"])
    df = spark.createDataFrame(pdf)
    out = pus.winsorize(df, pct, subset="x", byvars="g", exact=False).toPandas()
    assert len(out) == len(pdf)
    for g, sub in out.groupby("g"):
        raw = pdf[pdf.g == g].x
        assert sub.x.min() >= raw.min() - 1e-9
        assert sub.x.max() <= raw.max() + 1e-9


@given(rows=frames, ngroups=st.integers(min_value=2, max_value=5))
@settings(**SETTINGS)
def test_portfolio_range_and_monotonicity(spark, rows, ngroups):
    pdf = pd.DataFrame(rows, columns=["g", "x"])
    df = spark.createDataFrame(pdf)
    out = pus.portfolio(df, "x", ngroups=ngroups, byvars="g").toPandas()
    assert out.portfolio.between(0, ngroups).all()
    # within a group, a strictly larger value never gets a lower portfolio
    for g, sub in out[out.portfolio > 0].groupby("g"):
        s = sub.sort_values("x")
        assert s.portfolio.is_monotonic_increasing


@given(rows=frames)
@settings(**SETTINGS)
def test_left_merge_latest_asof_invariant(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "d"])
    pdf["d"] = pdf["d"].abs().round(3)
    left = spark.createDataFrame(pdf)
    right = spark.createDataFrame(
        pdf.assign(payload=pdf.d * 2).rename(columns={"d": "rd"})[["k", "rd", "payload"]]
    )
    out = pus.left_merge_latest(
        left, right, on="k", left_datevar="d", right_datevar="rd"
    ).toPandas()
    # as-of contract: matched right date <= left date, and it is the
    # max eligible right date for that key
    matched = out.dropna(subset=["rd"])
    assert (matched.rd <= matched.d + 1e-12).all()
    rights = pdf.rename(columns={"d": "rd"})
    for _, row in matched.iterrows():
        elig = rights[(rights.k == row.k) & (rights.rd <= row.d + 1e-12)].rd
        assert abs(row.rd - elig.max()) < 1e-9
    # left rows are never lost
    assert out[["k", "d"]].drop_duplicates().shape[0] == pdf.drop_duplicates().shape[0]


def test_left_merge_latest_ties_keep_all_rows(spark):
    # two right rows at the same max eligible date -> BOTH kept,
    # duplicating the left row (reference merge-back semantics)
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "d": [10.0]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 1], "rd": [5.0, 5.0, 2.0], "payload": ["a", "b", "c"]})
    )
    out = pus.left_merge_latest(
        left, right, on="k", left_datevar="d", right_datevar="rd"
    ).toPandas()
    assert len(out) == 2
    assert sorted(out.payload) == ["a", "b"]


doc_texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=30), min_size=2, max_size=10
)


@given(texts=doc_texts)
@settings(**SETTINGS)
def test_exact_dedup_invariants(spark, texts):
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    out = D.exact_dedup(df).toPandas()
    # survivors are a subset, one per normalized text, with the min id
    norm = pdf.text.str.lower().str.split().str.join(" ")
    expected = pdf.groupby(norm, sort=False).doc_id.min()
    assert sorted(out.doc_id) == sorted(expected)


@given(texts=doc_texts)
@settings(**SETTINGS)
def test_minhash_identical_docs_identical_sigs(spark, texts):
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    dup = pd.concat(
        [pdf, pdf.assign(doc_id=pdf.doc_id + 1000)], ignore_index=True
    )
    df = spark.createDataFrame(dup)
    sigs = {
        r.doc_id: tuple(r.minhash_sig)
        for r in D.minhash_signature(df, num_hashes=4).collect()
    }
    for i in range(len(texts)):
        assert sigs[i] == sigs[i + 1000]


ids = st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=30, unique=True)
weight_maps = st.dictionaries(
    st.sampled_from(["a", "b", "c", "d"]),
    st.floats(min_value=0.01, max_value=10, allow_nan=False),
    min_size=1,
    max_size=4,
)


@given(doc_ids=ids, weights=weight_maps, seed=st.integers(min_value=0, max_value=99))
@settings(**SETTINGS)
def test_hash_split_partitions_every_row(spark, doc_ids, weights, seed):
    from pd_utils_spark.extensions import sampling as S

    df = spark.createDataFrame(pd.DataFrame({"doc_id": doc_ids}))
    out = S.hash_split(df, weights=weights, seed=seed).toPandas()
    # total preservation, labels drawn from the weight map, and
    # assignment invariant under repartitioning
    assert len(out) == len(doc_ids)
    assert set(out.split) <= set(weights)
    again = S.hash_split(df.repartition(3), weights=weights, seed=seed).toPandas()
    assert dict(zip(out.doc_id, out.split)) == dict(zip(again.doc_id, again.split))


@given(doc_ids=ids, frac=st.floats(min_value=0.0, max_value=1.0), seed=st.integers(min_value=0, max_value=99))
@settings(**SETTINGS)
def test_stratified_sample_is_monotone_in_fraction(spark, doc_ids, frac, seed):
    from pd_utils_spark.extensions import sampling as S

    df = spark.createDataFrame(pd.DataFrame({"doc_id": doc_ids}))
    kept = set(S.stratified_sample(df, frac, seed=seed).toPandas().doc_id)
    kept_more = set(S.stratified_sample(df, min(1.0, frac + 0.3), seed=seed).toPandas().doc_id)
    # a row kept at rate f is kept at every rate >= f (nested samples)
    assert kept <= kept_more


# ---------------------------------------------------------------- round 2 ops

edge_lists = st.lists(
    st.tuples(st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15)),
    min_size=1,
    max_size=20,
)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min label per node
    return {x: find(x) for x in parent}


@given(edges=edge_lists)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    real = [(a, b) for a, b in edges if a != b]
    if not real:
        return
    pairs = spark.createDataFrame(pd.DataFrame(real, columns=["id_a", "id_b"]))
    got = {r.id_a: r.component for r in D.connected_components(pairs).collect()}
    want = _union_find_components(real)
    assert got == want


@given(
    xs=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        min_size=1,
        max_size=30,
    ),
    bins=st.integers(min_value=1, max_value=12),
)
@settings(**SETTINGS)
def test_numeric_histogram_preserves_mass(spark, xs, bins):
    from pd_utils_spark.extensions.profile import numeric_histogram

    df = spark.createDataFrame(pd.DataFrame({"x": xs}))
    rows = numeric_histogram(df, "x", bins=bins).collect()
    assert len(rows) == bins
    assert sum(r["count"] for r in rows) == len(xs)  # every value lands once


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" .@-:/"
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_redact_pii_idempotent(spark, texts):
    from pd_utils_spark.extensions.pii import redact_pii

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    once = redact_pii(df)
    twice = redact_pii(once)
    a = {r.doc_id: r.text for r in once.collect()}
    b = {r.doc_id: r.text for r in twice.collect()}
    assert a == b  # placeholders are fixed points of the cascade


@given(
    budget_small=st.integers(min_value=0, max_value=20),
    extra=st.integers(min_value=0, max_value=40),
)
@settings(**SETTINGS)
def test_take_token_budget_monotone(spark, budget_small, extra):
    from pd_utils_spark.extensions.sampling import take_token_budget

    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(12), "text": ["tok tok tok"] * 12}  # 3 tokens each
        )
    )
    small = {r.doc_id for r in take_token_budget(df, budget=budget_small).collect()}
    big = {
        r.doc_id
        for r in take_token_budget(df, budget=budget_small + extra).collect()
    }
    assert small <= big  # growing the budget never evicts a doc


multiline_texts = st.lists(
    st.lists(st.text(alphabet="xy z", min_size=0, max_size=8), min_size=1, max_size=4).map(
        "\n".join
    ),
    min_size=2,
    max_size=6,
)


@given(texts=multiline_texts)
@settings(**SETTINGS)
def test_dedup_lines_idempotent_and_subset(spark, texts):
    """dedup_lines is idempotent (after removal every surviving line
    appears in <= max_docs docs, so a second pass is a no-op) and each
    output doc's lines are a subsequence of its input lines."""
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    once = D.dedup_lines(df)
    once_pd = once.toPandas().set_index("doc_id").sort_index()
    twice_pd = D.dedup_lines(once).toPandas().set_index("doc_id").sort_index()
    assert (once_pd.text == twice_pd.text).all()
    norm = lambda s: " ".join(s.lower().split())
    for i, original in enumerate(texts):
        kept = once_pd.loc[i, "text"]
        if kept == "":
            continue
        # subsequence check on normalized lines
        orig_lines = [norm(l) for l in original.split("\n")]
        it = iter(orig_lines)
        assert all(norm(l) in it for l in kept.split("\n"))


@given(texts=multiline_texts)
@settings(**SETTINGS)
def test_c4_line_filter_idempotent(spark, texts):
    """c4_line_filter is a normal form: lines that survive one pass
    survive a second pass unchanged (filtering the cleaned text again
    keeps every line, because survival is a per-line predicate)."""
    from pd_utils_spark.extensions.text import c4_line_filter

    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    once = c4_line_filter(df).select("doc_id", F.col("clean_text").alias("text"))
    twice = c4_line_filter(once)
    a = {r.doc_id: r.text for r in once.collect()}
    b = {r.doc_id: r.clean_text for r in twice.collect()}
    assert a == b


pack_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # doc_id
        st.integers(min_value=0, max_value=64),      # n_tokens
        st.text(alphabet="ab \n", min_size=0, max_size=12),
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda t: t[0],
)


@given(rows=pack_rows, budget=st.integers(min_value=1, max_value=128))
@settings(**SETTINGS)
def test_pack_sequences_conserves_docs_and_tokens(spark, rows, budget):
    """Packing is a partition of the corpus: every doc lands in exactly
    one chunk, token totals are conserved, no chunk's first doc starts
    past the budget line, and every doc's text appears verbatim in its
    chunk's seq_text."""
    from pd_utils_spark.extensions.sampling import pack_chunks, pack_sequences

    pdf = pd.DataFrame(rows, columns=["doc_id", "n_tokens", "text"])
    df = spark.createDataFrame(pdf)
    seqs = pack_sequences(df, budget=budget, buckets=4).toPandas()
    assert int(seqs.n_docs.sum()) == len(pdf)
    assert int(seqs.total_tokens.sum()) == int(pdf.n_tokens.sum())
    # layout twin: chunk membership from pack_chunks matches the
    # materialized counts (each doc in exactly one (bucket, chunk))
    packed = pack_chunks(df, budget=budget, buckets=4).toPandas()
    sizes = packed.groupby(["bucket", "chunk_id"]).size()
    got = seqs.set_index(["bucket", "chunk_id"]).n_docs.sort_index()
    assert (sizes.sort_index() == got).all()
    # member texts concatenate into seq_text (separator-joined)
    member_text = {
        (b, c): sub for (b, c), sub in packed.groupby(["bucket", "chunk_id"])
    }
    for _, row in seqs.iterrows():
        members = member_text[(row.bucket, row.chunk_id)]
        for t in members.text:
            assert (t or "") in row.seq_text


edge_pairs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=8), st.integers(min_value=0, max_value=8)),
    min_size=1,
    max_size=20,
).map(lambda es: [(s, t) for s, t in es if s != t])


@given(edges=edge_pairs.filter(lambda es: len(es) > 0))
@settings(**SETTINGS)
def test_pagerank_mass_and_positivity(spark, edges):
    """On a graph where every node has an outgoing edge, rank mass is
    conserved (sums to 1); ranks are always positive and bounded."""
    from pd_utils_spark.extensions.graph import pagerank

    # close the graph: give sink nodes a self-loop-free out-edge so
    # the no-dangling conservation property applies
    nodes = sorted({n for p in edges for n in p})
    srcs = {s for s, _ in edges}
    for n in nodes:
        if n not in srcs:
            edges = edges + [(n, nodes[0] if n != nodes[0] else nodes[-1])]
    if any(s == t for s, t in edges):
        edges = [(s, t) for s, t in edges if s != t]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]).drop_duplicates())
    ranks = {r.node: r.rank for r in pagerank(e, iters=8).collect()}
    assert all(v > 0 for v in ranks.values())
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)


@given(rows=frames)
@settings(**SETTINGS)
def test_add_missing_group_rows_complete_and_idempotent(spark, rows):
    """After completion every (group, period) combination exists
    exactly once, and a second application is a no-op (the grid is
    already complete, ffill finds nothing new to fill)."""
    pdf = pd.DataFrame(rows, columns=["g", "x"])
    pdf["p"] = [i % 3 for i in range(len(pdf))]
    pdf = pdf.drop_duplicates(["g", "p"])
    df = spark.createDataFrame(pdf[["g", "p", "x"]])
    once = pus.add_missing_group_rows(df, ["g"], ["p"])
    once_pd = once.toPandas().sort_values(["g", "p"]).reset_index(drop=True)
    n_g, n_p = pdf.g.nunique(), pdf.p.nunique()
    assert len(once_pd) == n_g * n_p
    assert not once_pd.duplicated(["g", "p"]).any()
    twice_pd = (
        pus.add_missing_group_rows(once, ["g"], ["p"])
        .toPandas()
        .sort_values(["g", "p"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(once_pd, twice_pd)


@given(rows=frames)
@settings(**SETTINGS)
def test_pivot_melt_roundtrip(spark, rows):
    """wide_to_long(long_to_wide(df)) recovers the original long rows
    (for unique (id, colindex) pairs): pivot and melt are inverses up
    to the NULL rows melt emits for absent cells."""
    pdf = pd.DataFrame(rows, columns=["g", "x"])
    pdf = pdf.assign(k=[f"c{i % 3}" for i in range(len(pdf))])
    pdf = pdf.drop_duplicates(["g", "k"])  # one value per pivot cell
    df = spark.createDataFrame(pdf)
    wide = pus.long_to_wide(df, "g", "x", colindex="k", colindex_only=True)
    back = pus.wide_to_long(wide, "g", var_name="k", value_name="x")
    got = {
        (r.g, r.k): r.x for r in back.collect() if r.x is not None
    }
    expect = {(r.g, r.k): r.x for r in pdf.itertuples(index=False)}
    assert set(got) == set(expect)
    for key, v in expect.items():
        assert got[key] == pytest.approx(v)


@given(
    frac1=st.floats(min_value=0.0, max_value=1.0),
    extra=st.floats(min_value=0.0, max_value=1.0),
)
@settings(**SETTINGS)
def test_filter_top_fraction_monotone(spark, frac1, extra):
    """Growing frac never evicts a selected row (the per-group rank
    cut only moves down), and the keep-count honors ceil(frac * n)."""
    import math

    from pd_utils_spark.extensions.sampling import filter_top_fraction

    frac2 = min(1.0, frac1 + extra)
    pdf = pd.DataFrame(
        {
            "doc_id": range(12),
            "g": ["a"] * 7 + ["b"] * 5,
            "score": [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0, 8.0],
        }
    )
    df = spark.createDataFrame(pdf)
    small = {r.doc_id for r in filter_top_fraction(df, "score", frac1, by="g").collect()}
    big = {r.doc_id for r in filter_top_fraction(df, "score", frac2, by="g").collect()}
    assert small <= big
    assert len(small) == math.ceil(frac1 * 7) + math.ceil(frac1 * 5)


url_texts = st.lists(
    st.from_regex(
        r"https?://[A-Za-z][A-Za-z0-9.]{0,10}(:[0-9]{1,4})?(/[A-Za-z0-9/]{0,8})?"
        r"(\?[a-z]{1,4}=[a-z0-9]{0,3}(&[a-z_]{1,6}=[a-z0-9]{0,3}){0,2})?(#[a-z]{0,4})?",
        fullmatch=True,
    ),
    min_size=1,
    max_size=8,
)


@given(urls=url_texts)
@settings(**SETTINGS)
def test_canonical_url_idempotent(spark, urls):
    """canonical_url is a normal form: applying it twice equals once."""
    from pd_utils_spark.extensions import web as W

    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    once = W.canonicalize_urls(df).select(
        F.col("canonical_url").alias("url")
    )
    twice = W.canonicalize_urls(once).toPandas()
    assert (twice.url == twice.canonical_url).all()


event_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # key
        st.integers(min_value=0, max_value=120),    # ts offset seconds
    ),
    min_size=1,
    max_size=30,
)


@given(rows=event_rows, within=st.integers(min_value=1, max_value=40))
@settings(**SETTINGS)
def test_suppress_repeats_idempotent(spark, rows, within):
    """Suppressing an already-suppressed stream is identity. Under the
    burst rule this is NOT obvious: survivors are burst-firsts, and
    the proof rests on consecutive survivors being separated by more
    than the threshold (first(k+1) - first(k) >= first(k+1) -
    last(k) > within). A greedy 'gap since last survivor' variant
    would also be idempotent, but a buggy hybrid (e.g. burst labels
    recomputed over surviving rows with stale lags) is not — this
    pins the contract."""
    from pd_utils_spark.extensions import events as E

    pdf = pd.DataFrame(rows, columns=["k", "off"])
    pdf["event_id"] = range(len(pdf))
    pdf["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(pdf.off, unit="s")
    df = spark.createDataFrame(pdf[["k", "event_id", "ts"]])
    once = E.suppress_repeats(
        df, "k", "ts", within_seconds=within, tiebreak="event_id"
    )
    twice = E.suppress_repeats(
        once, "k", "ts", within_seconds=within, tiebreak="event_id"
    )
    o = sorted(map(tuple, once.toPandas().itertuples(index=False)))
    t = sorted(map(tuple, twice.toPandas().itertuples(index=False)))
    assert o == t


@given(
    counts=st.lists(st.integers(min_value=1, max_value=8), min_size=1, max_size=5),
    n=st.integers(min_value=1, max_value=4),
)
@settings(**SETTINGS)
def test_session_paths_count_conservation(spark, counts, n):
    """On a gap-free fixture (every user's events 1 s apart -> exactly
    one session per user), the total path occurrences must equal
    sum over users of max(0, len - n + 1) and every path's n_sessions
    is bounded by the user count — the sliding-window conservation law
    that catches off-by-one slicing or dropped tail windows."""
    from pd_utils_spark.extensions import events as E

    recs = []
    eid = 0
    for u, cnt in enumerate(counts):
        for i in range(cnt):
            recs.append(
                (u, eid, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i),
                 f"t{eid % 3}")
            )
            eid += 1
    pdf = pd.DataFrame(recs, columns=["user_id", "event_id", "ts", "event_type"])
    df = spark.createDataFrame(pdf)
    out = E.session_paths(
        df, "user_id", "ts", "event_type", n=n, gap_seconds=1800,
        tiebreak="event_id",
    ).toPandas()
    expect_total = sum(max(0, c - n + 1) for c in counts)
    assert out.n_occurrences.sum() == expect_total
    assert (out.n_sessions <= len(counts)).all()
    assert (out.n_sessions >= 1).all() if len(out) else True


# ------------------------------------------------------------- kmeans

vec_frames = st.integers(min_value=2, max_value=4).flatmap(
    lambda dims: st.lists(
        st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
            min_size=dims,
            max_size=dims,
        ),
        min_size=3,
        max_size=12,
    )
)


def _vec_df(spark, vecs):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(len(vecs)),
                "embedding": [[float(x) for x in v] for v in vecs],
            }
        )
    )


@given(vecs=vec_frames, iters=st.integers(min_value=0, max_value=3))
@settings(**SETTINGS)
def test_kmeans_assignment_is_argmin(spark, vecs, iters):
    """Every point's assigned centroid is (weakly) the nearest one,
    with ties broken to the lowest cid — recomputed independently in
    plain Python against the returned centroids."""
    from pd_utils_spark.extensions import similarity as S

    k = min(2, len(vecs))
    df = _vec_df(spark, vecs)
    cents = S.kmeans_fit(df, k=k, iters=iters)
    got = {
        r.vec_id: r.cluster
        for r in S.kmeans_assign(df, cents).collect()
    }
    for i, v in enumerate(vecs):
        dists = [
            (sum((float(x) - c) * (float(x) - c) for x, c in zip(v, cent)), cid)
            for cid, cent in enumerate(cents)
        ]
        assert got[i] == min(dists)[1]


@given(vecs=vec_frames, iters=st.integers(min_value=1, max_value=3))
@settings(**SETTINGS)
def test_kmeans_fit_composes_one_round_at_a_time(spark, vecs, iters):
    """fit(iters=n) == one Lloyd's round applied to fit(iters=n-1):
    assign with the n-1 centroids, then per-cluster means (empty
    clusters keep their centroid). Catches drift between the Spark
    aggregation and the algorithm's definition."""
    from pd_utils_spark.extensions import similarity as S

    k = min(2, len(vecs))
    df = _vec_df(spark, vecs)
    prev = S.kmeans_fit(df, k=k, iters=iters - 1)
    want = S.kmeans_fit(df, k=k, iters=iters)
    assigned = {
        r.vec_id: r.cluster for r in S.kmeans_assign(df, prev).collect()
    }
    for cid in range(k):
        members = [vecs[i] for i, c in assigned.items() if c == cid]
        if not members:
            expect = prev[cid]
        else:
            expect = [
                sum(float(v[d]) for v in members) / len(members)
                for d in range(len(vecs[0]))
            ]
        assert want[cid] == pytest.approx(expect, rel=1e-9, abs=1e-9)


# ------------------------------------------------ round-5 late ops

@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),     # user
            st.integers(min_value=0, max_value=500),   # seconds offset
            st.integers(min_value=0, max_value=3),     # type index
        ),
        min_size=1,
        max_size=40,
    ),
    model=st.sampled_from(
        ["last_touch", "first_touch", "linear", "position", "time_decay"]
    ),
)
@settings(**SETTINGS)
def test_attribution_credit_conservation(spark, events, model):
    """Total credit across channels == number of conversions that have
    at least one strictly-earlier touch, for EVERY model."""
    import datetime as dt

    from pd_utils_spark.extensions.events import attribution

    types = ["view", "click", "signup", "purchase"]
    rows = [
        (u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), types[t])
        for u, s, t in events
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = attribution(df, model=model, halflife_seconds=60.0)
    total_credit = sum(r.credit for r in out.collect())
    # reference: a conversion is attributed iff some touch's NEXT
    # strictly-later conversion is it
    per_user = {}
    for u, s, t in events:
        per_user.setdefault(u, []).append((s, types[t]))
    n_attr = 0
    for evs in per_user.values():
        convs = sorted(s for s, t in evs if t == "purchase")
        touches = sorted(s for s, t in evs if t != "purchase")
        for c in convs:
            if any(
                x < c and not any(x < c2 < c for c2 in convs)
                for x in touches
            ):
                n_attr += 1
    assert total_credit == pytest.approx(n_attr, abs=1e-9)


@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=1e6, allow_nan=False, width=32),
        min_size=2,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_gini_bounds_and_scale_invariance(spark, vals):
    from pd_utils_spark.extensions.sampling import gini_concentration

    if sum(vals) == 0:
        vals = [v + 1.0 for v in vals]
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], ["id", "v"]
    )
    g = gini_concentration(df, "v").collect()[0].gini
    n = len(vals)
    assert -1e-12 <= g <= (n - 1) / n + 1e-12
    # scale invariance
    df2 = spark.createDataFrame(
        [(i, float(v) * 7.0) for i, v in enumerate(vals)], ["id", "v"]
    )
    g2 = gini_concentration(df2, "v").collect()[0].gini
    assert g2 == pytest.approx(g, abs=1e-9)


@given(
    n=st.integers(min_value=6, max_value=40),
    k=st.integers(min_value=1, max_value=4),
)
@settings(**SETTINGS)
def test_walk_forward_partition_of_rows(spark, n, k):
    """Every (split, row) pair appears exactly once, test blocks are
    contiguous in time, and train ∪ test ∪ future covers everything."""
    import datetime as dt

    from pyspark.sql import functions as F

    from pd_utils_spark.extensions.sampling import walk_forward_splits

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, ["id", "ts"])
    out = walk_forward_splits(df, n_splits=k).collect()
    assert len(out) == n * k
    for s in range(1, k + 1):
        rs = sorted(
            (r.id, r.role) for r in out if r.split == s
        )
        roles = [x[1] for x in rs]
        # train block is a prefix, test follows, future is the suffix
        first_test = roles.index("test") if "test" in roles else n
        assert all(x == "train" for x in roles[:first_test])
        after = roles[first_test:]
        n_test = sum(1 for x in after if x == "test")
        assert all(x == "test" for x in after[:n_test])
        assert all(x == "future" for x in after[n_test:])


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    xs=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=2, max_size=60
    )
)
def test_mann_kendall_antisymmetry_and_bounds(spark, xs):
    """Negating the series negates S exactly (and z); |S| <= C(n,2);
    p in [0, 1]. The merge-count path must satisfy these for ANY
    integer series, ties included."""
    from pd_utils_spark.operators.timeseries import mann_kendall

    rows = [("g", i, float(v)) for i, v in enumerate(xs)]
    neg = [("g", i, -float(v)) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, ["g", "t", "v"])
    dfn = spark.createDataFrame(neg, ["g", "t", "v"])
    r = mann_kendall(df, "v", "t", "g").collect()[0]
    rn = mann_kendall(dfn, "v", "t", "g").collect()[0]
    n = len(xs)
    assert abs(r.s_stat) <= n * (n - 1) // 2
    assert rn.s_stat == -r.s_stat
    assert rn.z == pytest.approx(-r.z, abs=1e-12)
    assert 0.0 <= r.p_value <= 1.0
    assert r.var_s == rn.var_s


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=14),
        ),
        min_size=1,
        max_size=40,
    ),
    k=st.integers(min_value=2, max_value=4),
)
def test_k_core_nesting_and_idempotence(spark, edges, k):
    """The (k+1)-core is contained in the k-core; every member's
    in-core degree is >= k; and re-peeling the core is the identity."""
    from pd_utils_spark.extensions.graph import k_core

    e = spark.createDataFrame(
        [r for r in edges if r[0] != r[1]] or [(0, 1)], ["src", "dst"]
    )
    core_k = {r.node: r.core_degree for r in k_core(e, k=k).collect()}
    core_k1 = {r.node for r in k_core(e, k=k + 1).collect()}
    assert core_k1 <= set(core_k)
    assert all(d >= k for d in core_k.values())
    if core_k:
        # rebuild the core subgraph and peel again: identical result
        pdf = e.toPandas()
        sub = pdf[pdf.src.isin(core_k) & pdf.dst.isin(core_k)]
        e2 = spark.createDataFrame(sub)
        again = {r.node: r.core_degree for r in k_core(e2, k=k).collect()}
        assert again == core_k


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),   # value
            st.integers(min_value=1, max_value=5),   # weight
        ),
        min_size=1,
        max_size=50,
    )
)
def test_weighted_quantiles_unit_weight_and_monotone(spark, rows):
    """With all weights equal the weighted quantile is the type-1
    unweighted quantile, and quantiles are monotone in prob."""
    from pd_utils_spark.extensions.profile import weighted_quantiles

    df = spark.createDataFrame(
        [("g", float(v), float(w)) for v, w in rows], ["g", "v", "w"]
    )
    probs = (0.1, 0.5, 0.9, 1.0)
    got = {
        r.prob: r.value
        for r in weighted_quantiles(df, "v", "w", probs, "g").collect()
    }
    assert got[0.1] <= got[0.5] <= got[0.9] <= got[1.0]
    # unit weights == classic lower quantile
    df1 = spark.createDataFrame(
        [("g", float(v), 1.0) for v, _ in rows], ["g", "v", "w"]
    )
    got1 = {
        r.prob: r.value
        for r in weighted_quantiles(df1, "v", "w", probs, "g").collect()
    }
    import math

    vals = sorted(v for v, _ in rows)
    for p in probs:
        idx = math.ceil(p * len(vals)) - 1
        assert got1[p] == vals[max(idx, 0)], p


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    labels=st.lists(st.booleans(), min_size=20, max_size=80),
)
def test_isotonic_calibration_monotone_and_mass_preserving(spark, labels):
    """For ANY score/label arrangement the fit is monotone and
    preserves total positive mass (the defining PAV properties)."""
    import numpy as np

    from pd_utils_spark.extensions.metrics import isotonic_calibration

    rows = [(float(i), bool(y)) for i, y in enumerate(labels)]
    df = spark.createDataFrame(rows, ["score", "y"])
    out = (
        isotonic_calibration(df, "score", "y", n_bins=5)
        .toPandas()
        .sort_values("bin")
    )
    cal = out["calibrated"].to_numpy()
    assert (np.diff(cal) >= -1e-12).all()
    assert np.isclose(
        float((cal * out["n"].to_numpy()).sum()), float(out["positives"].sum())
    )
    assert ((cal >= -1e-12) & (cal <= 1 + 1e-12)).all()


# --------------------------------------------- round-6 closure properties

_sentence_words = st.sampled_from(["aa", "bb", "cc", "dd"])
_doc_sentences = st.lists(
    st.lists(_sentence_words, min_size=1, max_size=3).map(" ".join),
    min_size=1,
    max_size=8,
)


def _ref_dedup_spans(docs: dict, n: int) -> dict:
    """Pure-Python replay of one dedup_spans pass (the C4 span rule):
    period-split/trim sentences, lowercased n-span fingerprints,
    keeper = global min (doc, pos), remove sentences under non-keeper
    duplicate spans, rebuild with '. '."""
    sents = {
        i: [s.strip() for s in t.split(".") if s.strip()]
        for i, t in docs.items()
    }
    occ: dict = {}
    for i in sorted(sents):
        ss = sents[i]
        for p in range(len(ss) - n + 1):
            occ.setdefault(
                tuple(s.lower() for s in ss[p : p + n]), []
            ).append((i, p))
    removal = set()
    for lst in occ.values():
        if len(lst) > 1:
            keep = min(lst)
            for i, p in lst:
                if (i, p) != keep:
                    removal.update((i, q) for q in range(p, p + n))
    return {
        i: ". ".join(
            s for p, s in enumerate(ss) if (i, p) not in removal
        )
        for i, ss in sents.items()
    }


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(_doc_sentences, min_size=1, max_size=6))
def test_dedup_spans_single_pass_matches_reference(spark, docs):
    """Differential property: one dedup_spans pass equals a
    straightforward pure-Python replay of the C4 span rule for ANY
    corpus — the strongest true single-pass invariant. (The operator
    is NOT idempotent — reassembly creates new sentence adjacencies
    that can collide with kept spans; the r6 idempotence property was
    false and is replaced by this + the fixpoint property below.)"""
    corpus = {i: ". ".join(s) for i, s in enumerate(docs)}
    df = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    got = {
        r.doc_id: r.clean_text
        for r in D.dedup_spans(df, n=2, out="clean_text").collect()
    }
    assert got == _ref_dedup_spans(corpus, 2)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(_doc_sentences, min_size=1, max_size=6))
def test_dedup_spans_to_fixpoint_is_stable(spark, docs):
    """to_fixpoint=True output IS rerun-stable: one more pass over
    the fixpoint changes nothing — the closure property a pipeline
    that re-ingests its own output actually needs."""
    df = spark.createDataFrame(
        [(i, ". ".join(s)) for i, s in enumerate(docs)],
        ["doc_id", "text"],
    )
    fp = D.dedup_spans(df, n=2, out="clean_text", to_fixpoint=True)
    stable = {r.doc_id: r.clean_text for r in fp.collect()}
    again = D.dedup_spans(
        fp.select("doc_id", F.col("clean_text").alias("text")),
        n=2,
        out="clean_text",
    )
    assert {r.doc_id: r.clean_text for r in again.collect()} == stable


def test_dedup_spans_nonidempotence_counterexample(spark):
    """The r6 verdict's deterministic counterexample, pinned: pass 1
    rebuilds doc 2 as 'aa. bb. cc' (a NEW 3-span colliding with doc
    0's kept span), so pass 2 removes it — documented
    non-idempotence, and the fixpoint variant stabilizes it."""
    docs = ["aa. bb. cc. zz", "xx. yy. ww. qq", "aa. xx. yy. ww. bb. cc"]
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    once = D.dedup_spans(df, n=3, out="clean_text")
    first = {r.doc_id: r.clean_text for r in once.collect()}
    assert first[2] == "aa. bb. cc"
    again = D.dedup_spans(
        once.select("doc_id", F.col("clean_text").alias("text")),
        n=3,
        out="clean_text",
    )
    second = {r.doc_id: r.clean_text for r in again.collect()}
    assert second[2] == ""  # pass 2 removes content: NOT idempotent
    fp = D.dedup_spans(df, n=3, out="clean_text", to_fixpoint=True)
    stable = {r.doc_id: r.clean_text for r in fp.collect()}
    rerun = D.dedup_spans(
        fp.select("doc_id", F.col("clean_text").alias("text")),
        n=3,
        out="clean_text",
    )
    assert {r.doc_id: r.clean_text for r in rerun.collect()} == stable


_scd_keys = st.lists(
    st.integers(min_value=0, max_value=9), min_size=1, max_size=8, unique=True
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    dim_vals=st.dictionaries(
        st.integers(min_value=0, max_value=9),
        st.sampled_from(["x", "y", "z"]),
        min_size=1,
        max_size=6,
    ),
    upd_a=st.dictionaries(
        st.integers(min_value=0, max_value=4),
        st.sampled_from(["x", "y", "w"]),
        max_size=5,
    ),
    upd_b=st.dictionaries(
        st.integers(min_value=5, max_value=9),
        st.sampled_from(["x", "y", "w"]),
        max_size=5,
    ),
)
def test_scd2_merge_disjoint_batches_commute(spark, dim_vals, upd_a, upd_b):
    """Two update batches over DISJOINT key ranges (each stamped with
    its own effective_ts) must commute: apply A then B, or B then A —
    the final versioned dimension is identical, because each key's
    history is touched by at most one batch. The guarantee that makes
    out-of-order backfill of partitioned update feeds safe."""
    import datetime as dt

    from pd_utils_spark.extensions.snapshot import scd2_merge

    t0 = dt.datetime(2024, 1, 1)
    dim = spark.createDataFrame(
        [(k, v, t0, None, True) for k, v in dim_vals.items()],
        "k int, attr string, valid_from timestamp, valid_to timestamp, "
        "is_current boolean",
    )
    a = spark.createDataFrame(
        [(k, v) for k, v in upd_a.items()], "k int, attr string"
    )
    b = spark.createDataFrame(
        [(k, v) for k, v in upd_b.items()], "k int, attr string"
    )
    ts_a, ts_b = dt.datetime(2024, 2, 1), dt.datetime(2024, 3, 1)

    def apply(d, batch, ts):
        if batch.count() == 0:
            return d
        return scd2_merge(d, batch, "k", ["attr"], ts)

    ab = apply(apply(dim, a, ts_a), b, ts_b)
    ba = apply(apply(dim, b, ts_b), a, ts_a)
    key = ["k", "attr", "valid_from", "valid_to", "is_current"]
    rows_ab = sorted(map(tuple, ab.select(*key).collect()))
    rows_ba = sorted(map(tuple, ba.select(*key).collect()))
    assert rows_ab == rows_ba


_sub_tokens = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_sub_docs = st.lists(
    st.lists(_sub_tokens, min_size=1, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


def _ref_dedup_substrings(docs: dict, k: int) -> dict:
    """Pure-Python replay of one dedup_substrings pass (ExactSubstr
    token rule): whitespace tokens, k-window fingerprints, keeper =
    global min (doc, pos), remove tokens under non-keeper duplicate
    windows, rebuild space-joined."""
    toks = {i: t.split() for i, t in docs.items()}
    occ: dict = {}
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - k + 1):
            occ.setdefault(tuple(ts[p : p + k]), []).append((i, p))
    removal = set()
    for lst in occ.values():
        if len(lst) > 1:
            keep = min(lst)
            for i, p in lst:
                if (i, p) != keep:
                    removal.update((i, q) for q in range(p, p + k))
    return {
        i: " ".join(t for p, t in enumerate(ts) if (i, p) not in removal)
        for i, ts in toks.items()
    }


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=_sub_docs)
def test_dedup_substrings_single_pass_matches_reference(spark, docs):
    """Differential property: one dedup_substrings pass equals a
    pure-Python replay of the ExactSubstr token rule for ANY corpus.
    (The operator is NOT idempotent — space-joined reassembly creates
    new token adjacencies that can collide with kept windows; the r6
    idempotence property was false and is replaced by this + the
    fixpoint property below.)"""
    corpus = dict(enumerate(docs))
    df = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    got = {
        r.doc_id: r.clean_text
        for r in D.dedup_substrings(df, min_tokens=3, out="clean_text").collect()
    }
    assert got == _ref_dedup_substrings(corpus, 3)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=_sub_docs)
def test_dedup_substrings_to_fixpoint_is_stable(spark, docs):
    """to_fixpoint=True output IS rerun-stable: one more pass over
    the fixpoint removes nothing."""
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    fp = D.dedup_substrings(
        df, min_tokens=3, out="clean_text", to_fixpoint=True
    )
    stable = {r.doc_id: r.clean_text for r in fp.collect()}
    again = D.dedup_substrings(
        fp.withColumnRenamed("clean_text", "text"),
        min_tokens=3,
        out="clean_text",
    )
    assert {r.doc_id: r.clean_text for r in again.collect()} == stable


def test_dedup_substrings_fixpoint_max_passes_exhaustion_raises(spark):
    """A corpus that still changes on pass 2 must raise (not silently
    return a non-fixpoint) when max_passes is too small — the bounded
    loop's contract."""
    docs = [
        "aa",
        "aa aa dd bb cc aa aa aa aa aa aa aa",
        "ee bb cc aa",
        "dd ee bb cc aa bb cc",
    ]
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    with pytest.raises(RuntimeError, match="max_passes"):
        D.dedup_substrings(
            df, min_tokens=3, out="clean_text",
            to_fixpoint=True, max_passes=1,
        ).collect()


def test_dedup_substrings_nonidempotence_counterexample(spark):
    """The r6 verdict's deterministic counterexample, pinned: pass 1
    rebuilds doc 3 as 'dd bb cc' (a NEW adjacency colliding with doc
    1's kept window), so pass 2 empties it — documented
    non-idempotence, and the fixpoint variant stabilizes it."""
    docs = [
        "aa",
        "aa aa dd bb cc aa aa aa aa aa aa aa",
        "ee bb cc aa",
        "dd ee bb cc aa bb cc",
    ]
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    once = D.dedup_substrings(df, min_tokens=3, out="clean_text")
    first = {r.doc_id: r.clean_text for r in once.collect()}
    assert first == _ref_dedup_substrings(dict(enumerate(docs)), 3)
    assert first[3] == "dd bb cc"
    again = D.dedup_substrings(
        once.withColumnRenamed("clean_text", "text"),
        min_tokens=3,
        out="clean_text",
    )
    second = {r.doc_id: r.clean_text for r in again.collect()}
    assert second[3] == ""  # pass 2 removes content: NOT idempotent
    fp = D.dedup_substrings(
        df, min_tokens=3, out="clean_text", to_fixpoint=True
    )
    stable = {r.doc_id: r.clean_text for r in fp.collect()}
    rerun = D.dedup_substrings(
        fp.withColumnRenamed("clean_text", "text"),
        min_tokens=3,
        out="clean_text",
    )
    assert {r.doc_id: r.clean_text for r in rerun.collect()} == stable


_greedy_docs = st.lists(
    st.lists(_sub_tokens, min_size=1, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=_greedy_docs, bands=st.integers(min_value=1, max_value=3))
def test_dedup_bands_greedy_matches_pure_replay(spark, docs, bands):
    """r8 (judge #4) differential property: dedup_bands_greedy equals
    the pure-Python replay of its full pipeline (normalize ->
    k-shingles -> md5 universal-hash minhash -> band keys -> chained
    min-id passes) for ANY corpus and band count. The deep seeded run
    is scripts/fuzz_dedup_reference.py (200 examples per round); this
    is the CI-budget anchor."""
    from scripts.fuzz_dedup_reference import ref_greedy_bands

    corpus = dict(enumerate(docs))
    df = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    got = {
        r.doc_id
        for r in D.dedup_bands_greedy(
            df, k=2, rows_per_band=2, bands=bands
        ).collect()
    }
    assert got == ref_greedy_bands(corpus, k=2, rows_per_band=2, bands=bands)
