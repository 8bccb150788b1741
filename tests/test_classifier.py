"""Hashed-feature logistic regression: exact NumPy parity of the
full-batch GD steps, and the trained filter actually separates a
separable corpus."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.operators.classifier import (
    hashed_features,
    quality_scores,
    train_logreg,
)

ROWS = [
    (0, "good clean prose text", 1.0),
    (1, "good text prose", 1.0),
    (2, "clean good article", 1.0),
    (3, "spam spam buy now", 0.0),
    (4, "buy spam click now", 0.0),
    (5, "click buy spam", 0.0),
]
DIM = 8


def _numpy_ref(rows, dim, iters, lr):
    """Same arithmetic, dense NumPy."""
    def h(term):
        import hashlib

        return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % dim

    X = np.zeros((len(rows), dim))
    y = np.array([r[2] for r in rows])
    for i, (_, text, _) in enumerate(rows):
        toks = text.split()
        for t in toks:
            X[i, h(t)] += 1.0
        X[i] /= len(toks)
    w = np.zeros(dim)
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        w -= lr * (X.T @ (p - y)) / len(rows)
        b -= lr * float(np.mean(p - y))
    return w, b, 1.0 / (1.0 + np.exp(-(X @ w + b)))


def test_train_logreg_matches_numpy(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in ROWS], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in ROWS], "doc_id long, y double"
    )
    feats = hashed_features(docs, dim=DIM)
    w, b = train_logreg(spark, feats, labels, iters=4, lr=0.5)
    wref, bref, pref = _numpy_ref(ROWS, DIM, iters=4, lr=0.5)
    assert b == pytest.approx(bref, abs=1e-12)
    for f in range(DIM):
        assert w.get(f, 0.0) == pytest.approx(wref[f], abs=1e-12)
    scored = {
        r.doc_id: r.p
        for r in quality_scores(
            spark, docs, labels, dim=DIM, iters=4, lr=0.5
        ).collect()
    }
    for i in range(len(ROWS)):
        assert scored[i] == pytest.approx(pref[i], abs=1e-12)
    # the separable corpus separates: every positive above every negative
    pos = [scored[i] for i, _, y in ROWS if y == 1.0]
    neg = [scored[i] for i, _, y in ROWS if y == 0.0]
    assert min(pos) > max(neg)
    with pytest.raises(ValueError):
        train_logreg(spark, feats, labels, iters=-1)


def test_hashed_features_l1_normalized(spark):
    docs = spark.createDataFrame([(0, "a a b")], "doc_id long, text string")
    vals = [r.val for r in hashed_features(docs, dim=64).collect()]
    assert math.isclose(sum(vals), 1.0)
    assert sorted(vals) == [pytest.approx(1 / 3), pytest.approx(2 / 3)]
