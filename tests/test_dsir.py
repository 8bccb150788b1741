"""DSIR importance weighting parity against a pure-Python reference
(hashed unigram+bigram features, add-lambda categorical models,
per-doc log importance weights) plus selection semantics."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

from embed_rerank_spark.operators.dsir import (
    dsir_select,
    hashed_ngram_features,
    importance_weights,
)

B = 64  # small bucket count so collisions are exercised
LAM = 1.0

RAW = [
    (1, "the cat sat on the mat"),
    (2, "stock market prices rose sharply today"),
    (3, "the dog sat on the log"),
    (4, "quantum entanglement of photon pairs"),
    (5, ""),
    (6, "cat and dog sat together on a mat"),
]
TARGET = [
    (100, "the cat sat quietly"),
    (101, "a dog sat on a mat"),
    (102, "cat dog mat sat"),
]


def _bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B


def _feats(text: str) -> Counter:
    toks = text.strip().lower().split()
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return Counter(_bucket(g) for g in grams)


def _model(texts: list[str]):
    tot: Counter = Counter()
    for t in texts:
        tot += _feats(t)
    denom = sum(tot.values()) + LAM * B
    return {b: math.log((tot.get(b, 0) + LAM) / denom) for b in range(B)}


def _ref_weights():
    p_raw = _model([t for _, t in RAW])
    p_tgt = _model([t for _, t in TARGET])
    out = {}
    for did, t in RAW:
        f = _feats(t)
        if f:
            out[did] = sum(c * (p_tgt[b] - p_raw[b]) for b, c in f.items())
    return out


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string").repartition(5)
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, tgt


def test_features_match_reference(spark, frames):
    raw, _ = frames
    got = {
        (r.doc_id, r.bucket): r.cnt
        for r in hashed_ngram_features(raw, n_buckets=B).collect()
    }
    want = {
        (did, b): c
        for did, t in RAW
        for b, c in _feats(t).items()
    }
    assert got == want


def test_weights_match_reference(spark, frames):
    raw, tgt = frames
    got = {
        r.doc_id: r.weight
        for r in importance_weights(raw, tgt, n_buckets=B, smoothing=LAM).collect()
    }
    want = _ref_weights()
    assert set(got) == set(want)  # empty doc 5 absent from both
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9), d
    # docs sharing the target's vocabulary outrank off-distribution docs
    assert got[6] > got[2] and got[1] > got[4]


def test_select_budget_and_determinism(spark, frames):
    raw, tgt = frames
    out = dsir_select(raw, tgt, budget=3, n_buckets=B).collect()
    assert len(out) == 3
    ranks = sorted((r.sel_rank, r.doc_id) for r in out)
    assert [r for r, _ in ranks] == [1, 2, 3]
    # deterministic under a different partitioning
    out2 = dsir_select(raw.repartition(2), tgt, budget=3, n_buckets=B).collect()
    assert sorted((r.sel_rank, r.doc_id, round(r.weight, 9)) for r in out2) == sorted(
        (r.sel_rank, r.doc_id, round(r.weight, 9)) for r in out
    )
    # order agrees with the weight table
    w = _ref_weights()
    want_order = sorted(w, key=lambda d: (-round(w[d], 6), d))[:3]
    assert [d for _, d in ranks] == want_order
    with pytest.raises(ValueError):
        dsir_select(raw, tgt, budget=0, n_buckets=B)
