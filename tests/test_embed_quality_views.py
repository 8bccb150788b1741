"""Embedding operator (E1/E5/E6 semantics), quality metrics, and
API-dialect views."""

from __future__ import annotations

import base64
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.functions.quality import mrr_at_k, ndcg_at_k, quality_summary
from embed_rerank_spark.functions.views import (
    cohere_rerank_view,
    openai_rerank_view,
    tei_rerank_view,
)
from embed_rerank_spark.operators.embed import (
    base64_embedding_df,
    embed_texts,
    openai_dimensions,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"document number {i} with some text w{i * 7}") for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_embed_deterministic_and_unit_norm(spark, docs):
    a = embed_texts(docs, hidden=32).orderBy("doc_id").collect()
    b = embed_texts(docs, hidden=32).orderBy("doc_id").collect()
    assert [r.embedding for r in a] == [r.embedding for r in b]
    for r in a:
        assert len(r.embedding) == 32
        assert math.isclose(
            float(np.linalg.norm(r.embedding)), 1.0, rel_tol=0, abs_tol=1e-5
        )


def test_embed_guard_layers(spark, docs):
    # On unit-norm inputs the two guards agree to float32 resolution
    # (the deterministic backend always emits unit vectors)...
    svc = embed_texts(docs, hidden=16, guard="service").orderBy("doc_id").first()
    bkd = embed_texts(docs, hidden=16, guard="backend").orderBy("doc_id").first()
    assert np.allclose(svc.embedding, bkd.embedding, atol=1e-6)
    assert float(np.linalg.norm(svc.embedding)) == pytest.approx(1.0, abs=1e-5)


def test_normalize_guard_kernels_differ():
    # ...but the pinned E5 semantics differ on degenerate inputs:
    # service zero-guards (norms[norms==0]=1), backend adds 1e-8
    from embed_rerank_spark.operators.embed import _normalize

    tiny = np.full((1, 4), 1e-12, dtype=np.float64)
    svc = _normalize(tiny.copy(), "service")
    bkd = _normalize(tiny.copy(), "backend")
    assert np.linalg.norm(svc) == pytest.approx(1.0, rel=1e-9)  # exact norm
    assert np.linalg.norm(bkd) < 1e-3  # 1e-8 dominates the denominator
    zero = np.zeros((1, 4))
    assert np.array_equal(_normalize(zero.copy(), "service"), zero)  # 0/1
    assert np.array_equal(_normalize(zero.copy(), "backend"), zero)  # 0/1e-8


def test_embed_pad_or_truncate_before_normalize(spark, docs):
    tr = embed_texts(
        docs, hidden=32, target_dim=8, dimension_strategy="pad_or_truncate"
    ).first()
    assert len(tr.embedding) == 8
    # truncation happens BEFORE normalization -> result re-normalized
    assert float(np.linalg.norm(tr.embedding)) == pytest.approx(1.0, abs=1e-5)
    pad = embed_texts(
        docs, hidden=8, target_dim=12, dimension_strategy="pad_or_truncate"
    ).first()
    assert len(pad.embedding) == 12
    assert pad.embedding[-1] == 0.0


def test_openai_dimensions_after_normalize(spark, docs):
    emb = embed_texts(docs, hidden=32)
    cut = openai_dimensions(emb, 8).first()
    # slice AFTER normalization: norm strictly below 1 (E6 OpenAI variant)
    assert len(cut.embedding) == 8
    assert float(np.linalg.norm(cut.embedding)) < 1.0
    padded = openai_dimensions(emb, 40).first()
    assert len(padded.embedding) == 40
    assert padded.embedding[-1] == 0.0


def test_base64_roundtrip(spark, docs):
    emb = embed_texts(docs, hidden=8)
    rows = {r.doc_id: r.embedding for r in emb.collect()}
    b64 = base64_embedding_df(emb).collect()
    for r in b64:
        decoded = np.frombuffer(base64.b64decode(r.embedding_b64), dtype=np.float32)
        assert np.array_equal(decoded, np.array(rows[r.doc_id], dtype=np.float32))


@pytest.fixture(scope="module")
def ranking(spark):
    return spark.createDataFrame(
        [(1, 1, 10), (1, 2, 20), (1, 3, 30), (2, 1, 40), (2, 2, 50)],
        "query_id long, rank int, doc_id long",
    )


@pytest.fixture(scope="module")
def judgments(spark):
    return spark.createDataFrame(
        [(1, 20, 1), (1, 99, 2), (2, 77, 1)], "query_id long, doc_id long, rel int"
    )


def test_mrr(spark, ranking, judgments):
    rr = {r.query_id: r.rr for r in mrr_at_k(ranking, judgments, k=10).collect()}
    assert rr[1] == pytest.approx(0.5)  # first relevant at rank 2
    assert rr[2] == 0.0  # no relevant retrieved


def test_ndcg(spark, ranking, judgments):
    nd = {r.query_id: r.ndcg for r in ndcg_at_k(ranking, judgments, k=10).collect()}
    # q1: DCG = 1/log2(3); IDCG = 3/log2(2) + 1/log2(3)  (rel 2 ideal first)
    expected = (1 / math.log2(3)) / (3 / math.log2(2) + 1 / math.log2(3))
    assert nd[1] == pytest.approx(expected, abs=1e-9)
    assert nd[2] == 0.0


def test_recall_and_ap(spark, ranking, judgments):
    from embed_rerank_spark.functions.quality import ap_at_k, recall_at_k

    rec = {r.query_id: r.recall for r in recall_at_k(ranking, judgments, k=10).collect()}
    # q1: 1 of 2 relevant retrieved; q2: 0 of 1
    assert rec[1] == pytest.approx(0.5)
    assert rec[2] == 0.0
    ap = {r.query_id: r.ap for r in ap_at_k(ranking, judgments, k=10).collect()}
    # q1: one hit at rank 2 -> precision@2 = 1/2; denom = min(R=2, k) = 2
    assert ap[1] == pytest.approx(0.25)
    assert ap[2] == 0.0


def test_quality_summary(spark, ranking, judgments):
    out = quality_summary(ranking, judgments, k=10)
    assert set(out.columns) == {"query_id", "rr", "ndcg", "recall", "ap"}
    assert out.count() == 2


@pytest.fixture(scope="module")
def rerank_results(spark):
    return spark.createDataFrame(
        [(1, 10, -1.0, "a"), (1, 20, 2.0, "b")],
        "query_id long, doc_id long, score double, text string",
    )


def test_cohere_view(spark, rerank_results):
    v = cohere_rerank_view(rerank_results, return_documents=True)
    assert set(v.columns) == {"query_id", "index", "relevance_score", "document"}
    top = v.first()
    assert top["index"] == 20 and top.relevance_score == 2.0
    assert top.document.text == "b"


def test_tei_view(spark, rerank_results):
    v = tei_rerank_view(rerank_results, return_text=True)
    assert v.columns == ["query_id", "index", "score", "text"]


def test_openai_auto_sigmoid_monotone(spark, rerank_results):
    v = openai_rerank_view(rerank_results, auto_sigmoid=True).collect()
    scores = {r.doc_id: r.score for r in v}
    assert scores[10] == pytest.approx(1 / (1 + math.exp(1.0)))
    assert scores[20] == pytest.approx(1 / (1 + math.exp(-2.0)))
    assert scores[20] > scores[10]  # ranking preserved
    raw = openai_rerank_view(rerank_results, auto_sigmoid=False).collect()
    assert {r.doc_id: r.score for r in raw}[20] == 2.0


def test_explicit_query_universe_scores_absent_queries_zero(spark, ranking, judgments):
    """A query that retrieved ZERO rows is absent from the ranking, so
    by default it silently drops out of every metric and means over
    the returned rows are inflated. Passing an explicit ``queries``
    universe scores it 0 in all four metrics."""
    universe = spark.createDataFrame([(1,), (2,), (3,)], "query_id long")
    out = {
        r.query_id: r
        for r in quality_summary(ranking, judgments, k=10, queries=universe).collect()
    }
    assert set(out) == {1, 2, 3}
    z = out[3]
    assert (z.rr, z.ndcg, z.recall, z.ap) == (0.0, 0.0, 0.0, 0.0)
    # default (no universe) keeps the documented ranking-derived scope
    assert quality_summary(ranking, judgments, k=10).count() == 2
