"""Tests for DSIR importance resampling (`extensions/selection.py`)
against an independent pure-Python reference implementation."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pd_utils_spark.extensions.selection import (
    _GUMBEL_M,
    dsir_log_weights,
    dsir_select,
    hashed_ngram_features,
)

RAW = [
    (1, "the cat sat on the mat"),
    (2, "le chat est sur le tapis"),
    (3, "the dog sat on the log"),
    (4, "el gato en la alfombra"),
    (5, "a cat and a dog sat"),
    (6, ""),
    (7, "one"),
]
TARGET = [
    (101, "the cat and the dog"),
    (102, "a dog sat on a mat"),
]
B = 512


def _fp60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _feats(text: str, buckets: int = B, ns=(1, 2)) -> list[int]:
    toks = " ".join(text.lower().split()).split()
    if not toks or toks == [""]:
        return []
    grams = []
    for n in ns:
        grams += [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return [_fp60(g) % buckets for g in grams]


def _ref_weights(raw, target, buckets=B, s=1.0):
    rc: dict[int, int] = {}
    tc: dict[int, int] = {}
    per_doc = {}
    for did, text in raw:
        f = _feats(text, buckets)
        per_doc[did] = f
        for b in f:
            rc[b] = rc.get(b, 0) + 1
    for _, text in target:
        for b in _feats(text, buckets):
            tc[b] = tc.get(b, 0) + 1
    R, T = sum(rc.values()), sum(tc.values())
    out = {}
    for did, f in per_doc.items():
        if not f:
            continue
        w = sum(
            math.log((tc.get(b, 0) + s) / (T + s * buckets))
            - math.log((rc[b] + s) / (R + s * buckets))
            for b in f
        )
        out[did] = (len(f), w)
    return out


@pytest.fixture()
def frames(spark):
    return (
        spark.createDataFrame(RAW, ["doc_id", "text"]),
        spark.createDataFrame(TARGET, ["doc_id", "text"]),
    )


def test_features_match_reference(spark, frames):
    raw, _ = frames
    got = (
        hashed_ngram_features(raw, buckets=B)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("bucket")).alias("f"))
        .collect()
    )
    got = {r.doc_id: list(r.f) for r in got}
    exp = {did: sorted(_feats(t)) for did, t in RAW if _feats(t)}
    assert got == exp


def test_log_weights_match_reference(spark, frames):
    raw, target = frames
    got = {
        r.doc_id: (r.n_feats, r.log_weight)
        for r in dsir_log_weights(raw, target, buckets=B).collect()
    }
    exp = _ref_weights(RAW, TARGET)
    assert set(got) == set(exp)
    for did in exp:
        assert got[did][0] == exp[did][0]
        assert got[did][1] == pytest.approx(exp[did][1], rel=1e-12)


def test_select_is_gumbel_topk_of_reference(spark, frames):
    raw, target = frames
    exp_w = _ref_weights(RAW, TARGET)
    scored = sorted(
        (
            (
                w
                - math.log(
                    -math.log((_fp60(str(did)) % _GUMBEL_M + 1) / (_GUMBEL_M + 2))
                ),
                did,
            )
            for did, (_, w) in exp_w.items()
        ),
        key=lambda x: (-x[0], x[1]),
    )
    expect_ids = sorted(did for _, did in scored[:3])
    got = dsir_select(raw, target, 3, buckets=B)
    assert sorted(r.doc_id for r in got.select("doc_id").collect()) == expect_ids
    # keeps every raw column plus the three score columns
    assert got.columns == ["doc_id", "text", "n_feats", "log_weight", "score"]


def test_select_no_gumbel_is_hard_topk(spark, frames):
    raw, target = frames
    exp_w = _ref_weights(RAW, TARGET)
    order = sorted(exp_w, key=lambda d: (-exp_w[d][1], d))
    got = dsir_select(raw, target, 2, buckets=B, gumbel=False)
    assert sorted(r.doc_id for r in got.collect()) == sorted(order[:2])


def test_empty_and_short_docs_excluded_or_kept(spark, frames):
    raw, target = frames
    w = dsir_log_weights(raw, target, buckets=B)
    ids = {r.doc_id for r in w.select("doc_id").collect()}
    assert 6 not in ids  # empty doc: no features
    assert 7 in ids  # one-token doc still has its unigram


def test_validation_errors(spark, frames):
    raw, target = frames
    with pytest.raises(ValueError):
        hashed_ngram_features(raw, buckets=0)
    with pytest.raises(ValueError):
        hashed_ngram_features(raw, ns=())
    with pytest.raises(ValueError):
        dsir_log_weights(raw, target, smoothing=0.0)
    with pytest.raises(ValueError):
        dsir_select(raw, target, 0)
    with pytest.raises(ValueError):
        dsir_select(raw, target, 1, temperature=0.0)


def test_plan_shape_broadcast_ratio_no_cartesian(spark, frames):
    raw, target = frames
    plan = dsir_select(raw, target, 3, buckets=B)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # global top-k must be TakeOrdered, not a total sort
    assert "TakeOrderedAndProject" in plan
