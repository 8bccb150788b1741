"""Impact-ordered index (Lucene index sorting + early termination):
exact parity with a Python brute top-k-by-static-score, and proof that
the decoded block set is O(k/block_size) per (term, shard) — NOT
proportional to document frequency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.operators.impact import (
    early_termination_blocks,
    impact_dictionary,
    impact_ordered_topk,
    with_impact_ids,
)
from embed_rerank_spark.operators.postings import InvertedIndex, build_postings


def _brute(rows, queries, k):
    """rows: (doc_id, text, static). Top-k by (static desc, doc_id asc)
    among docs containing any query term."""
    out = {}
    for qid, q in queries:
        terms = set(q.strip().lower().split())
        hits = [
            (doc_id, float(static))
            for doc_id, text, static in rows
            if terms & set(text.strip().lower().split())
        ]
        hits.sort(key=lambda t: (-t[1], t[0]))
        out[qid] = [
            (rank + 1, doc_id, static)
            for rank, (doc_id, static) in enumerate(hits[:k])
        ]
    return out


def _build(spark, rows, block_size=8):
    docs = spark.createDataFrame(rows, "doc_id long, text string, static long")
    dictionary = impact_dictionary(docs, score_col="static")
    built = build_postings(
        with_impact_ids(docs, dictionary), n_shards=4, block_size=block_size
    )
    cs = built["corpus_stats"].collect()[0]
    index = InvertedIndex(
        postings=built["postings"].localCheckpoint(eager=True),
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )
    return docs, dictionary, index


ROWS = [
    # 'common' is in every doc (the stopword case early termination is
    # for); 'rare' in a few; statics include ties
    (i, ("common rare" if i % 17 == 0 else "common word" + str(i % 5)),
     (i * 7919) % 101)
    for i in range(120)
]
QUERIES = [(1, "common"), (2, "rare"), (3, "rare common"), (4, "zzz_oov"),
           (5, "word1 zzz_oov")]


def test_impact_topk_matches_brute(spark):
    docs, dictionary, index = _build(spark, ROWS)
    got = {}
    out = impact_ordered_topk(index, dictionary, QUERIES, k=10).collect()
    for r in out:
        got.setdefault(r.query_id, []).append((r["rank"], r.doc_id, r.static))
    for qid in got:
        got[qid].sort()
    want = {qid: v for qid, v in _brute(ROWS, QUERIES, 10).items() if v}
    assert got == want
    assert 4 not in got  # all-OOV query: no rows
    with pytest.raises(ValueError):
        impact_ordered_topk(index, dictionary, QUERIES, k=0)


def test_early_termination_block_bound(spark):
    """The stopword's posting list spans ~n_docs/(shards*block) blocks;
    the kept set per (term, shard) must be bounded by the k-prefix —
    ceil(k/block)+1 — independent of df."""
    docs, dictionary, index = _build(spark, ROWS, block_size=8)
    k = 10
    total = (
        index.postings.filter(F.col("term") == "common").count()
    )
    part_keys, kept = early_termination_blocks(index, {"common"}, k)
    per_shard = (
        kept.groupBy("shard").count().collect()
    )
    assert total >= 12  # the stopword really is multi-block (120/4/8)
    bound = -(-k // 8) + 1
    assert per_shard and all(r["count"] <= bound for r in per_shard)
    assert sum(r["count"] for r in per_shard) < total


def test_impact_dictionary_is_dense_rank(spark):
    docs = spark.createDataFrame(
        [(10, "a", 5), (11, "b", 9), (12, "c", 5), (13, "d", 1)],
        "doc_id long, text string, static long",
    ).repartition(3)
    d = {r.doc_id: r.impact_id for r in impact_dictionary(docs, "static").collect()}
    # score desc, doc_id asc: 11(9) -> 0, 10(5) -> 1, 12(5) -> 2, 13(1) -> 3
    assert d == {11: 0, 10: 1, 12: 2, 13: 3}
