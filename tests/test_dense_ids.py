"""Dense-id dictionary: deterministic dense 0..N-1 assignment, ranking
equivalence vs hash ids, and the measured index-size win."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce
from embed_rerank_spark.operators.postings import build_postings, lineage_manifest
from embed_rerank_spark.operators.wand import wand_topk
from embed_rerank_spark.plans.build_index import extract_pages
from embed_rerank_spark.plans.dense_ids import (
    build_url_dictionary,
    index_bytes_per_posting,
    with_dense_ids,
)
from embed_rerank_spark.sources.pages import generate_pages

QUERIES = [(1, "w1 w2 the"), (2, "w40 data w7"), (3, "w3 w9 w200 a")]


@pytest.fixture(scope="module")
def corpus(spark):
    pages = generate_pages(spark, 900, seed=5, n_snapshots=2)
    return extract_pages(pages).filter(F.col("error").isNull()).select(
        "url", "doc_id", "text"
    ).cache()


def test_dictionary_is_dense_deterministic_sorted(spark, corpus):
    d1 = build_url_dictionary(corpus)
    n = corpus.select("url").distinct().count()
    rows = sorted((r.url, r.dense_id) for r in d1.collect())
    assert sorted(i for _, i in rows) == list(range(n))  # dense 0..N-1
    # dense_id = rank in sorted url order
    assert [i for _, i in rows] == list(range(n))
    # stable across re-runs and partitionings
    d2 = build_url_dictionary(corpus, num_partitions=3)
    assert rows == sorted((r.url, r.dense_id) for r in d2.collect())


def test_dense_index_rank_identical_and_smaller(spark, corpus):
    """Same query answers (by url) from the dense-id index as from the
    hash-id index, with measurably fewer bytes/posting."""
    spark_ = spark
    dictionary = build_url_dictionary(corpus).cache()
    dense_docs = with_dense_ids(corpus, dictionary).select("url", "doc_id", "text")

    from embed_rerank_spark.operators.postings import InvertedIndex

    def make_index(docs):
        built = build_postings(docs, n_shards=4)
        cs = built["corpus_stats"].collect()[0]
        return built, InvertedIndex(
            postings=built["postings"],
            term_stats=built["term_stats"],
            doc_stats=built["doc_stats"],
            n_docs=cs["n_docs"],
            avgdl=float(cs["avgdl"]),
        )

    built_h, idx_h = make_index(corpus.select("doc_id", "text"))
    built_d, idx_d = make_index(dense_docs.select("doc_id", "text"))

    # compare by URL with k large enough to avoid tie-cutoff effects
    k = 15
    id2url_h = {r.doc_id: r.url for r in corpus.select("doc_id", "url").collect()}
    id2url_d = {r.doc_id: r.url for r in dense_docs.select("doc_id", "url").collect()}
    wh = wand_topk(idx_h, QUERIES, k=k).collect()
    wd = wand_topk(idx_d, QUERIES, k=k).collect()
    by_q_h = {}
    for r in wh:
        by_q_h.setdefault(r.query_id, set()).add((id2url_h[r.doc_id], round(r.score, 6)))
    by_q_d = {}
    for r in wd:
        by_q_d.setdefault(r.query_id, set()).add((id2url_d[r.doc_id], round(r.score, 6)))
    assert by_q_h == by_q_d and len(by_q_h) == len(QUERIES)

    # hash ids also agree with brute force (sanity anchor)
    brute = bm25_topk_bruteforce(spark_, corpus.select("doc_id", "text"), QUERIES, k=k).collect()
    assert {(r.query_id, r.doc_id) for r in brute} == {(r.query_id, r.doc_id) for r in wh}

    size_h = index_bytes_per_posting(lineage_manifest(built_h["postings"], built_h["doc_stats"]))
    size_d = index_bytes_per_posting(lineage_manifest(built_d["postings"], built_d["doc_stats"]))
    assert size_h["postings"] == size_d["postings"]
    # dense deltas compress doc ids: meaningfully smaller postings
    assert size_d["bytes_per_posting"] < 0.75 * size_h["bytes_per_posting"], (size_h, size_d)


def test_extend_dictionary_append_only(spark):
    from embed_rerank_spark.plans.dense_ids import (
        build_url_dictionary,
        extend_url_dictionary,
    )

    old = spark.createDataFrame(
        [(f"https://e.org/{c}",) for c in "dcba"], "url string"
    )
    d0 = build_url_dictionary(old).cache()
    base = {r.url: r.dense_id for r in d0.collect()}
    assert sorted(base.values()) == [0, 1, 2, 3]

    new = spark.createDataFrame(
        [(f"https://e.org/{c}",) for c in "bxayz"], "url string"
    )
    d1 = extend_url_dictionary(d0, new).cache()
    got = {r.url: r.dense_id for r in d1.collect()}
    # old assignments byte-identical
    for u, i in base.items():
        assert got[u] == i
    # new urls (x, y, z) take 4, 5, 6 in sorted order among themselves
    assert [got[f"https://e.org/{c}"] for c in "xyz"] == [4, 5, 6]
    # idempotent: extending again with the same urls adds nothing
    d2 = extend_url_dictionary(d1, new)
    assert d2.count() == d1.count()
    # collision-free overall
    assert d1.select("dense_id").distinct().count() == d1.count()


def test_extend_dictionary_from_empty(spark):
    from embed_rerank_spark.plans.dense_ids import extend_url_dictionary

    empty = spark.createDataFrame([], "url string, dense_id long")
    docs = spark.createDataFrame([("u2",), ("u1",)], "url string")
    got = {r.url: r.dense_id for r in extend_url_dictionary(empty, docs).collect()}
    assert got == {"u1": 0, "u2": 1}
