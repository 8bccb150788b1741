"""Unit pins for the deterministic rerank scoring semantics
(reference: mlx_reranker_backend.py / reranking_service.py /
mlx_backend.py — see docstrings in functions/scoring.py)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from embed_rerank_spark.functions import scoring


def test_pair_tokenizer_first_seen_vocab_and_sep():
    ids = scoring.tokenize_pairs(["a b", "a b"], ["b c", "x"])
    # vocab: a=3, b=4, <SEP>=2, c=5 then x=6; padded to max len 5
    assert ids.tolist() == [[3, 4, 2, 4, 5], [3, 4, 2, 6, 0]]


def test_pair_tokenizer_truncation_and_empty():
    ids = scoring.tokenize_pairs(["w " * 600], ["p"], max_length=512)
    assert ids.shape == (1, 512)
    ids2 = scoring.tokenize_pairs([""], [""])
    assert ids2.tolist() == [[2]]  # just <SEP>


def test_pooled_embedding_determinism_and_norm():
    ids = scoring.tokenize_pairs(["hello world"], ["foo bar baz"])
    a = scoring.pooled_pseudo_embeddings(ids, hidden=64)
    b = scoring.pooled_pseudo_embeddings(ids, hidden=64)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 64)
    assert abs(np.linalg.norm(a[0]) - 1.0) < 1e-3


def test_cls_pooling_seeds_on_first_token():
    ids = np.array([[7, 1, 2], [7, 9, 9]], dtype=np.int64)
    v = scoring.pooled_pseudo_embeddings(ids, hidden=32, pooling="cls")
    np.testing.assert_array_equal(v[0], v[1])  # same first id -> same vec


def test_linear_head_matches_reference_construction():
    # Pin: sha256(model_name) first-8-bytes-LE seed, unit-norm w/(|w|+1e-6),
    # b=0 (reference mlx_reranker_backend.py:182-188).
    name = "some/model"
    w, b = scoring.linear_head(name, hidden=128)
    h = hashlib.sha256(name.encode()).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    expect = rng.standard_normal(128).astype(np.float32)
    expect /= np.linalg.norm(expect) + 1e-6
    np.testing.assert_array_equal(w, expect)
    assert b == 0.0


def test_head_dim_pad_truncate():
    w = np.ones(4, dtype=np.float32)
    assert scoring.fit_head_dim(w, 6).tolist() == [1, 1, 1, 1, 0, 0]
    assert scoring.fit_head_dim(w, 2).tolist() == [1, 1]


def test_score_norms():
    s = np.array([0.0, 1.0, -1.0])
    sig = scoring.normalize_scores(s, "sigmoid")
    np.testing.assert_allclose(sig, 1 / (1 + np.exp(-s)))
    mm = scoring.normalize_scores(s, "minmax")
    np.testing.assert_allclose(mm, [0.5, 1.0, 0.0])
    # constant scores -> denom 1.0 guard
    mm2 = scoring.normalize_scores(np.array([2.0, 2.0]), "minmax")
    np.testing.assert_allclose(mm2, [0.0, 0.0])
    np.testing.assert_array_equal(scoring.normalize_scores(s, "none"), s)


def test_jaccard_reference_fixture():
    # Fixture from reference app/main.py:636-641 semantics
    # (mlx_backend.py:687-702).
    query = "machine learning"
    passages = [
        "AI and ML are fascinating",
        "I love pizza",
        "Deep learning is a subset of ML",
    ]
    scores = scoring.jaccard_scores(query, passages)
    # q={machine,learning}; p1 5 words, 0 overlap -> 0/7
    # p2 3 words, 0 overlap -> 0/5
    # p3 {deep,learning,is,a,subset,of,ml}: overlap {learning} -> 1/8
    assert scores == [0.0, 0.0, pytest.approx(1 / 8)]


def test_cosine_zero_guard():
    q = np.array([1.0, 0.0], dtype=np.float32)
    p = np.array([[2.0, 0.0], [0.0, 0.0]], dtype=np.float32)
    s = scoring.cosine_scores(q, p)
    np.testing.assert_allclose(s, [1.0, 0.0])


def test_rerank_group_end_to_end_determinism():
    q = "capital of france"
    passages = ["paris is the capital of france", "pizza recipe", "france borders spain"]
    s1 = scoring.rerank_group(q, passages, hidden=256)
    s2 = scoring.rerank_group(q, passages, hidden=256)
    np.testing.assert_array_equal(s1, s2)
    assert s1.shape == (3,)
    # padding is batch-scoped: removing a passage may change others'
    # scores only via padding width — verify group scoping is real
    s3 = scoring.rerank_group(q, passages[:1], hidden=256)
    assert s3.shape == (1,)


def test_gaussian_rows_batch_independent_and_deterministic():
    """gaussian_rows value (i, j) is a pure function of (seed_i, j):
    the same seed yields the same row regardless of batch composition
    or position — the property that makes per-partition scoring
    independent of how Spark batches the rows."""
    import numpy as np

    a = scoring.gaussian_rows(np.array([7, 99, 7], dtype=np.uint64), 64)
    b = scoring.gaussian_rows(np.array([99], dtype=np.uint64), 64)
    np.testing.assert_array_equal(a[1], b[0])
    np.testing.assert_array_equal(a[0], a[2])
    # approximately standard normal
    big = scoring.gaussian_rows(np.arange(200, dtype=np.uint64), 256)
    assert abs(float(big.mean())) < 0.02 and abs(float(big.std()) - 1.0) < 0.02
