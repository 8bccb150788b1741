"""BM25F field-weighted retrieval (weighted token stream)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from embed_rerank_spark.operators.bm25 import (  # noqa: E402
    bm25_topk_bruteforce,
    bm25f_topk_bruteforce,
    fielded_weighted_docs,
)
from embed_rerank_spark.operators.postings import InvertedIndex, build_postings  # noqa: E402
from embed_rerank_spark.operators.wand import wand_topk  # noqa: E402

# doc 1: "join" only in the BODY (beyond the 3-token title window);
# doc 2: "join" in the TITLE. Same tf otherwise, so plain BM25 scores
# them closely while BM25F must put the title match first.
DOCS = [
    (1, "alpha beta gamma join join delta epsilon zeta"),
    (2, "join join alpha beta gamma delta epsilon zeta"),
    (3, "alpha beta gamma delta epsilon zeta eta theta"),
]


def test_title_weight_reorders_and_paths_agree(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = [(1, "join")]

    brute = bm25f_topk_bruteforce(
        spark, docs, queries, k=3, title_len=3, title_weight=3
    ).collect()
    assert [r["doc_id"] for r in sorted(brute, key=lambda r: r["rank"])] == [2, 1]

    # plain BM25 ties the two docs (same tf/dl) -> doc_id asc breaks it
    plain = bm25_topk_bruteforce(spark, docs, queries, k=3).collect()
    s = {r["doc_id"]: round(r["score"], 6) for r in plain}
    assert s[1] == s[2]

    # index path over the weighted stream == brute force
    built = build_postings(
        fielded_weighted_docs(docs, title_len=3, title_weight=3), n_shards=2
    )
    cs = built["corpus_stats"].collect()[0]
    index = InvertedIndex(
        postings=built["postings"],
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )
    wand = wand_topk(index, queries, k=3).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in sorted(wand, key=key)
    ] == [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in sorted(brute, key=key)
    ]


def test_short_docs_title_only(spark):
    # docs shorter than the title window: every token is title, body
    # slice is empty — weighting scales tf AND dl uniformly
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a a")], "doc_id long, text string"
    )
    out = bm25f_topk_bruteforce(
        spark, docs, [(1, "a")], k=2, title_len=8, title_weight=2
    ).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [2, 1]
