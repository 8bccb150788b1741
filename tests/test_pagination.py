"""Keyset (search_after) pagination over the WAND index."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce  # noqa: E402
from embed_rerank_spark.operators.postings import InvertedIndex, build_postings  # noqa: E402
from embed_rerank_spark.operators.wand import search_after_topk, wand_topk  # noqa: E402

VOCAB = ["fast", "hash", "join", "scan", "slow", "table", "merge", "sort", "row"]


def _mkdocs(n: int) -> list[tuple[int, str]]:
    docs = []
    for i in range(n):
        words = [VOCAB[(i * 7 + j * 3) % len(VOCAB)] for j in range(5 + i % 11)]
        docs.append((i + 1, " ".join(words)))
    return docs


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(_mkdocs(120), "doc_id long, text string")
    built = build_postings(docs, n_shards=4)
    cs = built["corpus_stats"].collect()[0]
    index = InvertedIndex(
        postings=built["postings"],
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )
    return docs, index


def _rows(df):
    return [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in sorted(df.collect(), key=lambda r: (r["query_id"], r["rank"]))
    ]


def test_pages_tile_the_full_ranking(spark, corpus):
    docs, index = corpus
    queries = [(1, "fast join"), (2, "scan slow table")]
    full = _rows(bm25_topk_bruteforce(spark, docs, queries, k=30))
    for page in (1, 2, 3):
        got = _rows(search_after_topk(index, queries, page_size=10, page=page))
        expect = [
            (qid, rk - (page - 1) * 10, d, s)
            for qid, rk, d, s in full
            if (page - 1) * 10 < rk <= page * 10
        ]
        assert got == expect, f"page {page}"


def test_short_result_set_has_empty_next_page(spark, corpus):
    docs, index = corpus
    # a term matching < page_size docs: page 2 must be empty, not wrap
    sub = [(1, "fast")]
    n = wand_topk(index, sub, k=1000).count()
    page = n // 10 + 2
    got = search_after_topk(index, sub, page_size=10, page=page)
    assert got.count() == 0


def test_cursor_is_strict_no_overlap_no_gap(spark, corpus):
    _docs, index = corpus
    queries = [(7, "hash merge sort")]
    p1 = _rows(search_after_topk(index, queries, page_size=7, page=1))
    p2 = _rows(search_after_topk(index, queries, page_size=7, page=2))
    top14 = _rows(wand_topk(index, queries, k=14))
    assert p1 + [(q, r + 7, d, s) for q, r, d, s in p2] == top14
