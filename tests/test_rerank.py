"""Rerank-stage parity: the Spark applyInPandas pipeline must equal an
in-process oracle applying the reference scoring semantics
(scoring.rerank_group et al.) group by group."""

from __future__ import annotations

import numpy as np
import pytest

from embed_rerank_spark.functions import scoring
from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce
from embed_rerank_spark.operators.rerank import rerank_candidates, retrieve_and_rerank
from embed_rerank_spark.queryset import QUERY_SET

SF_DIR = "/root/testdata/sf0.001"
HIDDEN = 256  # smaller dim for test speed; semantics dim-independent


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def candidates(spark, docs):
    return bm25_topk_bruteforce(spark, docs, QUERY_SET, k=20).cache()


def _oracle(docs_pdf, cands_pdf, queries, method, top_k, **kw):
    """Driver-side reimplementation over pandas."""
    txt = dict(zip(docs_pdf.doc_id, docs_pdf.text))
    out = []
    for qid, qtext in queries:
        pool = sorted(cands_pdf[cands_pdf.query_id == qid].doc_id.tolist())
        if not pool:
            continue
        passages = [txt[d] or "" for d in pool]
        if method == "cross_encoder_lite":
            s = scoring.rerank_group(qtext, passages, hidden=HIDDEN, **kw)
        elif method == "cosine":
            qv = scoring.text_pseudo_embeddings([qtext], HIDDEN)[0]
            s = scoring.cosine_scores(qv, scoring.text_pseudo_embeddings(passages, HIDDEN))
        else:
            s = np.array(scoring.jaccard_scores(qtext, passages))
        ranked = sorted(zip(pool, s), key=lambda x: (-round(float(x[1]), 6), x[0]))[:top_k]
        out.extend((qid, r + 1, d, float(sc)) for r, (d, sc) in enumerate(ranked))
    return sorted(out)


@pytest.mark.parametrize("method", ["cross_encoder_lite", "cosine", "jaccard"])
def test_rerank_matches_oracle(spark, docs, candidates, method):
    got = rerank_candidates(
        candidates, docs, QUERY_SET, top_k=5, method=method, hidden=HIDDEN
    )
    got_rows = sorted(
        (r.query_id, r.rank, r.doc_id, r.score) for r in got.collect()
    )
    exp = _oracle(docs.toPandas(), candidates.toPandas(), QUERY_SET, method, 5)
    assert [(q, r, d) for q, r, d, _ in got_rows] == [(q, r, d) for q, r, d, _ in exp]
    for (_, _, _, gs), (_, _, _, es) in zip(got_rows, exp):
        assert gs == pytest.approx(es, abs=1e-9)


def test_rerank_score_norms(spark, docs, candidates):
    sig = rerank_candidates(
        candidates, docs, QUERY_SET[:2], top_k=5, method="cross_encoder_lite",
        hidden=HIDDEN, score_norm="sigmoid",
    ).collect()
    assert all(0.0 < r.score < 1.0 for r in sig)
    mm = rerank_candidates(
        candidates, docs, QUERY_SET[:2], top_k=20, method="cross_encoder_lite",
        hidden=HIDDEN, score_norm="minmax",
    ).collect()
    assert all(0.0 <= r.score <= 1.0 for r in mm)
    # minmax is per-query stateful: each query's pool spans [0, 1]
    for qid in (1, 2):
        ss = [r.score for r in mm if r.query_id == qid]
        assert max(ss) == pytest.approx(1.0) and min(ss) == pytest.approx(0.0)


def test_rerank_determinism(spark, docs, candidates):
    a = rerank_candidates(candidates, docs, QUERY_SET, top_k=5, hidden=HIDDEN).collect()
    b = rerank_candidates(candidates, docs, QUERY_SET, top_k=5, hidden=HIDDEN).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_full_pipeline(spark, docs):
    out = retrieve_and_rerank(
        spark, docs, QUERY_SET, k_candidates=30, top_k=5, hidden=HIDDEN
    )
    rows = out.collect()
    assert len(rows) > 0
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_pool_caps_quarantine(spark, docs):
    """Reference request caps (requests.py:92-121,173-190) as a batch
    quarantine stage: oversized pools / overlong passages or queries
    knock out the whole query (request-level 422 mirror) with counted
    reasons; clean queries rerank untouched."""
    from pyspark.sql import functions as F

    from embed_rerank_spark.operators.rerank import (
        rerank_candidates_with_metrics,
        validate_rerank_pool,
    )

    # unit-level: synthetic pool exercising every cap
    rows = []
    rows += [(1, i, "fine text", "ok query") for i in range(5)]          # clean
    rows += [(2, i, "fine text", "q" * 3000) for i in range(3)]          # query_too_long
    rows += [(3, i, "x" * 5000 if i == 0 else "fine", "ok") for i in range(3)]  # passage_too_long
    rows += [(4, i, "   " if i == 1 else "fine", "ok") for i in range(3)]       # empty_passage
    rows += [(5, i, "fine", "ok") for i in range(12)]                    # pool_too_large (cap 10)
    pool = spark.createDataFrame(rows, "query_id long, doc_id long, text string, query string")
    clean, quarantine = validate_rerank_pool(pool, max_passages=10)
    q = {(r.query_id, r.reason): r.n_rows for r in quarantine.collect()}
    assert q == {
        (2, "query_too_long"): 1,
        (3, "passage_too_long"): 1,
        (4, "empty_passage"): 1,
        (5, "pool_too_large"): 12,
    }
    assert sorted(r.query_id for r in clean.select("query_id").distinct().collect()) == [1]

    # pipeline-level: an overlong query is dropped from rerank output
    cands = bm25_topk_bruteforce(spark, docs, QUERY_SET[:2], k=10)
    long_query = [(QUERY_SET[0][0], QUERY_SET[0][1]), (QUERY_SET[1][0], "z " * 2000)]
    out, metrics = rerank_candidates_with_metrics(
        cands, docs, long_query, top_k=5, hidden=HIDDEN
    )
    got_q = {r.query_id for r in out.collect()}
    assert got_q == {QUERY_SET[0][0]}
    m = {(r.query_id, r.reason) for r in metrics.collect()}
    assert (QUERY_SET[1][0], "query_too_long") in m


def test_token_limits_from_model_metadata():
    """recommended = min(max_pos // 4, 2048), absolute = max_pos
    (reference model_metadata.py:245-247)."""
    from embed_rerank_spark.functions.text_processing import token_limits

    assert token_limits(512) == (128, 512)
    assert token_limits(8192) == (2048, 8192)
    assert token_limits(32768) == (2048, 32768)
