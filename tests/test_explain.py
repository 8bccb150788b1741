"""Score-explain decomposition: per-term contributions reproduce the
ranking scores exactly."""

from __future__ import annotations

import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from embed_rerank_spark.operators.postings import InvertedIndex, build_postings  # noqa: E402
from embed_rerank_spark.operators.wand import explain_topk, wand_topk  # noqa: E402

DOCS = [
    (1, "fast hash join beats sort merge join"),
    (2, "slow table scan over the table"),
    (3, "hash table lookup the fast path"),
    (4, "merge sort merge the slow path"),
    (5, "a lone row"),
]


def test_contributions_sum_to_scores(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    built = build_postings(docs, n_shards=2)
    cs = built["corpus_stats"].collect()[0]
    index = InvertedIndex(
        postings=built["postings"],
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )
    queries = [(1, "fast join"), (2, "the table scan"), (3, "zyzzyva")]
    ranked = wand_topk(index, queries, k=4).collect()
    rows = explain_topk(index, queries, k=4).collect()

    sums: dict[tuple[int, int], float] = defaultdict(float)
    terms: dict[tuple[int, int], set] = defaultdict(set)
    for r in rows:
        sums[(r["query_id"], r["doc_id"])] += r["contribution"]
        terms[(r["query_id"], r["doc_id"])].add(r["term"])

    assert len(ranked) > 0
    for r in ranked:
        key = (r["query_id"], r["doc_id"])
        assert key in sums
        assert abs(sums[key] - r["score"]) < 1e-9, key
    # exactly the top-k doc set is explained, nothing else
    assert set(sums) == {(r["query_id"], r["doc_id"]) for r in ranked}
    # a doc matching both query terms shows both rows
    assert terms[(1, 1)] == {"fast", "join"}


def test_best_window_snippets_policy(spark):
    from embed_rerank_spark.operators.positions import (
        best_window_snippets,
        build_positional_postings,
        load_positional_index,
    )

    # doc 1: "fast" and "join" within 3 tokens at positions 4/6 (the
    # best window); an isolated "fast" earlier must lose to it
    docs_rows = [
        (1, "fast x y z fast q join a b c"),
        (2, "join j j j j j j fast"),
        (3, "nothing relevant here"),
    ]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    index = load_positional_index(build_positional_postings(docs, n_shards=2))
    out = {
        r["doc_id"]: r
        for r in best_window_snippets(
            docs=docs, index=index, queries=[(1, "fast join")], k=3, window=4
        ).collect()
    }
    # doc 1: window starting at pos 4 covers "fast q join a" -> both terms
    assert out[1]["win_start"] == 4 and out[1]["n_terms"] == 2
    assert out[1]["snippet"] == "fast q join a"
    # doc 2: no 4-token window holds both; earliest single-term start wins
    assert out[2]["win_start"] == 0 and out[2]["n_terms"] == 1
    assert out[2]["snippet"] == "join j j j"
    assert 3 not in out
    # snippet clamps at doc end
    docs2 = spark.createDataFrame([(9, "a b fast")], "doc_id long, text string")
    idx2 = load_positional_index(build_positional_postings(docs2, n_shards=1))
    row = best_window_snippets(
        docs=docs2, index=idx2, queries=[(1, "fast")], k=1, window=4
    ).collect()[0]
    assert row["snippet"] == "fast"
