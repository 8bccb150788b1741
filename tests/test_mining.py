"""Hard-negative mining: positives excluded, rank compaction, and the
no-positives degenerate case (== plain BM25 ranking)."""

from __future__ import annotations

from embed_rerank_spark.operators.mining import mine_hard_negatives


def test_positives_excluded_and_ranks_compact(spark):
    docs = spark.createDataFrame(
        [
            (1, "scan scan scan"),
            (2, "scan scan"),
            (3, "scan"),
            (4, "scan table"),
        ],
        "doc_id long, text string",
    )
    q = [(0, "scan")]
    out = sorted(
        (r.neg_rank, r.doc_id)
        for r in mine_hard_negatives(spark, docs, q, [(0, [1])], k=3).collect()
    )
    # doc 1 (top BM25 hit) is the positive -> excluded; ranks re-compact
    assert [d for _, d in out] != []
    assert 1 not in {d for _, d in out}
    assert [r for r, _ in out] == [1, 2, 3]


def test_no_positives_equals_bm25(spark):
    from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce

    docs = spark.createDataFrame(
        [(i, f"w{i % 4} scan") for i in range(12)], "doc_id long, text string"
    )
    q = [(0, "scan w1")]
    got = sorted(
        (r.query_id, r.neg_rank, r.doc_id, round(r.score, 6))
        for r in mine_hard_negatives(spark, docs, q, [], k=5).collect()
    )
    want = sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 6))
        for r in bm25_topk_bruteforce(spark, docs, q, k=5).collect()
    )
    assert got == want and got
