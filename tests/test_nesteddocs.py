"""Parent-child retrieval: ES has_child/has_parent semantics.

Hand-computed BM25 aggregates over a tiny child table, score-mode
truth table, min/max_children gating, and the degenerate parity
(one child per parent => has_child max == plain child BM25 with ids
renamed).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.operators.nesteddocs import (
    has_child_topk,
    has_parent_topk,
)


@pytest.fixture(scope="module")
def children(spark):
    # parents: 10 has two matching chunks, 20 one, 30 none, 40 two
    # (one matching), child corpus is what BM25 norms see
    rows = [
        (10, 101, "alpha beta gamma"),
        (10, 102, "alpha alpha delta"),
        (20, 201, "alpha epsilon zeta"),
        (30, 301, "eta theta iota"),
        (40, 401, "beta kappa"),
        (40, 402, "mu nu xi"),
    ]
    return spark.createDataFrame(
        rows, "parent_id long, child_id long, text string"
    )


def _bm25(tf, df, dl, n_docs, avgdl, k1=1.2, b=0.75):
    idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_score_modes_truth_table(spark, children):
    # corpus stats: 6 children, total tokens 17, avgdl 17/6
    avgdl = 17 / 6
    s101 = _bm25(1, 3, 3, 6, avgdl)  # alpha tf=1 df=3
    s102 = _bm25(2, 3, 3, 6, avgdl)  # alpha tf=2
    s201 = _bm25(1, 3, 3, 6, avgdl)
    queries = [(0, "alpha")]
    for mode, want10 in [
        ("max", max(s101, s102)),
        ("sum", s101 + s102),
        ("avg", (s101 + s102) / 2),
        ("min", min(s101, s102)),
    ]:
        out = {
            r.parent_id: (r.score, r.n_matching)
            for r in has_child_topk(
                spark, children, queries, score_mode=mode
            ).collect()
        }
        assert set(out) == {10, 20}, mode
        assert out[10][0] == pytest.approx(want10, abs=1e-9), mode
        assert out[10][1] == 2 and out[20][1] == 1
        assert out[20][0] == pytest.approx(s201, abs=1e-9)


def test_children_count_gates(spark, children):
    queries = [(0, "alpha beta")]
    # min_children=2 keeps only parent 10 (alpha x2 + beta chunk 101
    # is the same chunk — matching children of 10: 101, 102)
    out = has_child_topk(spark, children, queries, min_children=2).collect()
    assert {r.parent_id for r in out} == {10}
    # max_children=1 keeps the single-match parents only
    out = has_child_topk(
        spark, children, queries, max_children=1
    ).collect()
    assert {r.parent_id for r in out} == {20, 40}
    with pytest.raises(ValueError):
        has_child_topk(spark, children, queries, min_children=0)
    with pytest.raises(ValueError):
        has_child_topk(spark, children, queries, score_mode="median")


def test_single_child_parity_with_plain_bm25(spark):
    """One child per parent => has_child(max) is plain BM25 over the
    child corpus with parent ids substituted."""
    from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce

    docs = spark.range(40).select(
        (F.col("id") + 1000).alias("parent_id"),
        F.col("id").alias("child_id"),
        F.concat(
            F.lit("w"), (F.col("id") % 7).cast("string"),
            F.lit(" w"), (F.col("id") % 3).cast("string"),
        ).alias("text"),
    )
    queries = [(0, "w1 w2"), (1, "w0")]
    got = sorted(
        (r.query_id, r.rank, r.parent_id, round(r.score, 6))
        for r in has_child_topk(spark, docs, queries, k=5).collect()
    )
    want = sorted(
        (r.query_id, r.rank, r.doc_id + 1000, round(r.score, 6))
        for r in bm25_topk_bruteforce(
            spark,
            docs.select(F.col("child_id").alias("doc_id"), "text"),
            queries,
            k=5,
        ).collect()
    )
    assert got == want and got


def test_has_parent_fans_parent_score_to_children(spark, children):
    parents = spark.createDataFrame(
        [
            (10, "query term here"),
            (20, "query only"),
            (30, "nothing relevant"),
            (40, "term term"),
        ],
        "doc_id long, text string",
    )
    out = has_parent_topk(spark, parents, children, [(0, "query term")], k=10)
    rows = out.collect()
    by_child = {r.child_id: r.score for r in rows}
    # children of the same parent share its score
    assert by_child[101] == by_child[102]
    assert by_child[401] == by_child[402]
    # parent 30 matches nothing -> its child absent
    assert 301 not in by_child
    # ranks are child_id-asc within tied scores
    ranks = {r.child_id: r.rank for r in rows}
    assert ranks[101] < ranks[102]
    assert set(out.columns) == {"query_id", "rank", "child_id", "score"}


def test_inner_hits_block(spark, children):
    out = has_child_topk(
        spark, children, [(0, "alpha")], score_mode="max", inner_hits=2
    ).collect()
    hits = {r.parent_id: [(h.child_id, round(h.score, 6)) for h in r.hits] for r in out}
    assert set(hits) == {10, 20}
    # parent 10: chunk 102 (alpha tf=2) outranks 101 (tf=1)
    assert [c for c, _ in hits[10]] == [102, 101]
    assert [c for c, _ in hits[20]] == [201]
    # hit scores descend and the parent's max-mode score == best hit
    by_parent = {r.parent_id: round(r.score, 6) for r in out}
    for p, hs in hits.items():
        assert hs == sorted(hs, key=lambda t: (-t[1], t[0]))
        assert by_parent[p] == hs[0][1]
    # inner_hits=1 truncates per parent
    one = has_child_topk(
        spark, children, [(0, "alpha")], inner_hits=1
    ).collect()
    assert all(len(r.hits) == 1 for r in one)
