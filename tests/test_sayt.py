"""Search-as-you-type edge-n-gram field (operators/sayt.py): the gram
table's cap/ordering law and rank-identity with the query-time
dictionary scan (prefix_topk) inside and beyond the indexed gram
length."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from embed_rerank_spark.operators.postings import (  # noqa: E402
    InvertedIndex,
    build_postings,
)
from embed_rerank_spark.operators.sayt import (  # noqa: E402
    build_edge_grams,
    edge_ngram_topk,
)
from embed_rerank_spark.operators.wand import prefix_topk  # noqa: E402

DOCS = [
    (1, "fast hash join beats sort merge join"),
    (2, "slow table scan over the table"),
    (3, "hash table lookup the fast path"),
    (4, "merge sort merge the slow path"),
    (5, "scan scan scan row row"),
    (6, "a lone row span sp spa"),
    (7, "stream sort streaming streams the stream"),
]


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    built = build_postings(docs, n_shards=2)
    cs = built["corpus_stats"].collect()[0]
    return InvertedIndex(
        postings=built["postings"],
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )


def test_gram_table_lists_every_edge_prefix(index):
    grams = build_edge_grams(index.term_stats, min_gram=1, max_gram=4)
    got = {
        (r["gram"], r["term"]) for r in grams.filter(F.col("term") == "scan").collect()
    }
    assert got == {("s", "scan"), ("sc", "scan"), ("sca", "scan"), ("scan", "scan")}


def test_gram_table_cap_keeps_highest_df(index):
    # cap 2 on the hot single-letter gram 's': survivors must be the
    # 2 highest-df s-terms (ties term-asc), same rule as expand_prefix
    grams = build_edge_grams(index.term_stats, min_gram=1, max_gram=4, max_expansion=2)
    s_terms = [
        (r["term"], r["df"])
        for r in grams.filter(F.col("gram") == "s").orderBy(F.desc("df"), "term").collect()
    ]
    assert len(s_terms) == 2
    all_s = sorted(
        [
            (r["df"], r["term"])
            for r in index.term_stats.filter(F.col("term").startswith("s")).collect()
        ],
        key=lambda t: (-t[0], t[1]),
    )
    assert [t for _, t in all_s[:2]] == [t for t, _ in s_terms]


def test_rank_identical_to_prefix_topk(spark, index):
    queries = [(1, "s"), (2, "st"), (3, "jo"), (4, "zzz"), (5, "table")]
    grams = build_edge_grams(index.term_stats, min_gram=1, max_gram=4)
    # 'table' (len 5) exceeds max_gram=4 -> dictionary-scan fallback
    got = edge_ngram_topk(index, grams, queries, k=5, max_gram=4).collect()
    want = prefix_topk(index, queries, k=5).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(
        [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6)) for r in got]
    ) == sorted(
        [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6)) for r in want]
    )


def test_query_time_cap_tighter_than_build_time(spark, index):
    """A gram table built with a loose cap queried with a tighter
    max_expansion must re-cap after the join (df-desc/term-asc) and
    stay rank-identical to prefix_topk at that tighter cap."""
    queries = [(1, "s"), (2, "st")]
    grams = build_edge_grams(index.term_stats, min_gram=1, max_gram=4, max_expansion=64)
    got = edge_ngram_topk(index, grams, queries, k=5, max_gram=4, max_expansion=2).collect()
    want = prefix_topk(index, queries, k=5, max_expansion=2).collect()
    assert sorted(
        [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6)) for r in got]
    ) == sorted(
        [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6)) for r in want]
    )


def test_rejects_bad_gram_bounds(index):
    with pytest.raises(ValueError):
        build_edge_grams(index.term_stats, min_gram=0, max_gram=4)
    with pytest.raises(ValueError):
        build_edge_grams(index.term_stats, min_gram=5, max_gram=4)
