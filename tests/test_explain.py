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
