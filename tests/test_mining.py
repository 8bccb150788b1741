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


def test_association_rules_directional(spark):
    from embed_rerank_spark.operators.mining import association_rules

    # 'cookie' appears in 4 docs, always with 'privacy';
    # 'privacy' appears in 8 docs, only half with 'cookie'
    rows = [(i, "cookie privacy banner") for i in range(4)]
    rows += [(i, "privacy policy page") for i in range(4, 8)]
    rows += [(i, "totally unrelated words") for i in range(8, 12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(docs, min_support=2, min_confidence=0.9).collect()
    }
    # cookie -> privacy: confidence 4/4 = 1.0, lift = 1.0 / (8/12)
    r = out[("cookie", "privacy")]
    assert r["pair_count"] == 4
    assert r["confidence"] == 1.0
    assert r["lift"] == 1.5
    assert r["support"] == round(4 / 12, 6)
    # the reverse direction fails min_confidence (4/8 = 0.5)
    assert ("privacy", "cookie") not in out


def test_association_rules_df_cap_drops_hot_terms(spark):
    from embed_rerank_spark.operators.mining import association_rules

    rows = [(i, f"hot w{i % 2}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = association_rules(
        docs, min_support=1, min_confidence=0.0, max_term_df=5
    ).collect()
    # 'hot' (df=10) exceeds the cap -> no rule mentions it
    assert out == [] or all(
        "hot" not in (r["antecedent"], r["consequent"]) for r in out
    )
