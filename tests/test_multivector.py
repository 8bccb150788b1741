"""Multi-vector / long-document retrieval (operators/multivector.py):
pooling arithmetic vs numpy, MaxP and MaxSim rankings vs a
brute-force numpy replay, permutation invariance, and plan shape
(query side broadcasts)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.operators.multivector import (
    max_sim_topk,
    maxp_topk,
    pool_embeddings,
)

SEED = 7
N_DOCS = 12
CHUNKS = 3
DIM = 8


def _corpus():
    rng = np.random.default_rng(SEED)
    vecs = rng.normal(size=(N_DOCS * CHUNKS, DIM)).astype(np.float64)
    rows = [
        (int(i // CHUNKS), int(i), [float(x) for x in vecs[i]])
        for i in range(len(vecs))
    ]
    return rows, vecs


@pytest.fixture(scope="module")
def chunks_df(spark):
    rows, _ = _corpus()
    return spark.createDataFrame(
        rows, "doc_id long, vec_id long, embedding array<double>"
    )


def test_mean_pooling_matches_numpy(spark, chunks_df):
    _, vecs = _corpus()
    got = {
        r["doc_id"]: (r["n_chunks"], np.array(r["embedding"]))
        for r in pool_embeddings(chunks_df, pooling="mean").collect()
    }
    assert set(got) == set(range(N_DOCS))
    for d in range(N_DOCS):
        n, pooled = got[d]
        assert n == CHUNKS
        want = vecs[d * CHUNKS : (d + 1) * CHUNKS].mean(axis=0)
        np.testing.assert_allclose(pooled, want, rtol=1e-12)


def test_max_pooling_matches_numpy(spark, chunks_df):
    _, vecs = _corpus()
    got = {
        r["doc_id"]: np.array(r["embedding"])
        for r in pool_embeddings(chunks_df, pooling="max").collect()
    }
    for d in range(N_DOCS):
        want = vecs[d * CHUNKS : (d + 1) * CHUNKS].max(axis=0)
        np.testing.assert_allclose(got[d], want, rtol=1e-12)


def test_single_chunk_doc_pools_to_itself(spark):
    df = spark.createDataFrame(
        [(0, [1.0, -2.0, 3.0])], "doc_id long, embedding array<double>"
    )
    row = pool_embeddings(df, pooling="mean").collect()[0]
    assert row["n_chunks"] == 1
    assert row["embedding"] == [1.0, -2.0, 3.0]


def test_pooling_rejects_unknown_mode(chunks_df):
    with pytest.raises(ValueError):
        pool_embeddings(chunks_df, pooling="median")


def _cos_matrix(q, m):
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    return qn @ mn.T


def test_maxp_matches_numpy(spark, chunks_df):
    _, vecs = _corpus()
    queries = spark.createDataFrame(
        [(100, [float(x) for x in vecs[0]]), (101, [float(x) for x in vecs[7]])],
        "query_id long, qvec array<double>",
    )
    out = maxp_topk(chunks_df, queries, k=5).collect()
    sims = _cos_matrix(np.stack([vecs[0], vecs[7]]), vecs)
    per_doc = sims.reshape(2, N_DOCS, CHUNKS).max(axis=2)
    for qi, qid in enumerate((100, 101)):
        got = [(r["doc_id"], r["rank"]) for r in out if r["query_id"] == qid]
        order = sorted(
            range(N_DOCS), key=lambda d: (-round(per_doc[qi, d], 6), d)
        )[:5]
        assert [d for d, _ in sorted(got, key=lambda t: t[1])] == order
    # best chunk IS the query vector itself -> cosine 1.0 at rank 1
    top = [r for r in out if r["query_id"] == 100 and r["rank"] == 1][0]
    assert top["doc_id"] == 0 and abs(top["cosine"] - 1.0) < 1e-9


def test_max_sim_matches_numpy(spark, chunks_df):
    _, vecs = _corpus()
    qvecs = spark.createDataFrame(
        [(0, [float(x) for x in vecs[i]]) for i in range(CHUNKS)],
        "query_id long, qvec array<double>",
    )
    out = sorted(
        max_sim_topk(chunks_df, qvecs, k=N_DOCS).collect(),
        key=lambda r: r["rank"],
    )
    sims = _cos_matrix(vecs[:CHUNKS], vecs)  # (CHUNKS, n_chunks)
    per_doc = sims.reshape(CHUNKS, N_DOCS, CHUNKS).max(axis=2).sum(axis=0)
    order = sorted(range(N_DOCS), key=lambda d: (-round(per_doc[d], 6), d))
    assert [r["doc_id"] for r in out] == order
    # the query doc matches itself perfectly: score == CHUNKS
    assert out[0]["doc_id"] == 0 and abs(out[0]["score"] - CHUNKS) < 1e-9
    for r in out:
        np.testing.assert_allclose(r["score"], per_doc[r["doc_id"]], rtol=1e-9)


def test_query_side_broadcasts(spark, chunks_df):
    queries = chunks_df.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    plan = maxp_topk(chunks_df, queries, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
