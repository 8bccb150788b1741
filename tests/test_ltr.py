"""LTR feature logging: internal consistency of the feature vector
against independently computed signals."""

from __future__ import annotations

from embed_rerank_spark.operators.ltr import ltr_features


def test_features_consistent_with_brute_scorer(spark):
    from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    queries = [(0, "fast hash join"), (1, "slow table scan")]
    out = ltr_features(spark, docs, queries, k_candidates=15).collect()
    assert out
    # bm25 feature == the brute scorer's ranking, rank for rank
    brute = {
        (r.query_id, r.rank): (r.doc_id, round(r.score, 6))
        for r in bm25_topk_bruteforce(spark, docs, queries, k=15).collect()
    }
    for r in out:
        assert brute[(r.query_id, r.rank)] == (r.doc_id, round(r.bm25, 6))
        # coverage in (0, 1]; both queries have 3 unique terms
        assert 0 < r.query_coverage <= 1.0
        assert round(r.query_coverage, 9) == round(r.matched_terms / 3, 9)
        # structural sanity: tf mass >= distinct matches, dl bounds sum_tf
        assert r.sum_tf >= r.matched_terms
        assert r.dl >= r.sum_tf
        assert r.min_df >= 1 and r.max_idf > 0
