"""Minimum-should-match retrieval (mm-WAND): the index-side pivot
extension and the vectorized TAAT count path must match the
declarative brute-force plan exactly, across msm levels, and msm at
the boundaries must degenerate to the existing operators."""

from __future__ import annotations

import pytest

from embed_rerank_spark.operators.bm25 import (
    bm25_topk_bruteforce,
    bm25_topk_conjunctive_bruteforce,
    bm25_topk_msm_bruteforce,
)
from embed_rerank_spark.operators.postings import InvertedIndex, build_postings
from embed_rerank_spark.operators.wand import conjunctive_topk, wand_topk
from embed_rerank_spark.queryset import QUERY_SET

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index(spark):
    built = build_postings(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), n_shards=4
    )
    cs = built["corpus_stats"].collect()[0]
    return InvertedIndex(
        postings=built["postings"],
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )


def _canon(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in df.collect()
    )


@pytest.mark.parametrize("msm", [2, 3])
def test_msm_index_matches_bruteforce_both_paths(spark, index, msm):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    want = _canon(bm25_topk_msm_bruteforce(spark, docs, QUERY_SET, k=10, msm=msm))
    assert want, f"msm={msm} fixture produced no matches at all"
    # force the block-max WAND walk
    wand = _canon(
        wand_topk(index, QUERY_SET, k=10, taat_threshold=0, min_should_match=msm)
    )
    # force the vectorized TAAT count path
    taat = _canon(
        wand_topk(index, QUERY_SET, k=10, taat_threshold=10**9, min_should_match=msm)
    )
    assert wand == want
    assert taat == want


def test_msm_one_is_plain_disjunctive(spark, index):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = _canon(wand_topk(index, QUERY_SET, k=10, min_should_match=1))
    want = _canon(bm25_topk_bruteforce(spark, docs, QUERY_SET, k=10))
    assert got == want


def test_msm_at_query_length_equals_conjunctive(spark, index):
    """For a query of n unique in-vocab terms, msm=n is AND retrieval
    (and the msm brute-force equals the conjunctive brute-force)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = [(1, "fast hash join")]  # 3 unique, all in-vocab
    got = _canon(wand_topk(index, q, k=10, taat_threshold=0, min_should_match=3))
    conj = _canon(conjunctive_topk(index, q, k=10))
    assert got == conj and got
    bf_msm = _canon(bm25_topk_msm_bruteforce(spark, docs, q, k=10, msm=3))
    bf_conj = _canon(bm25_topk_conjunctive_bruteforce(spark, docs, q, k=10))
    assert bf_msm == bf_conj == got


def test_msm_above_vocab_terms_is_empty(spark, index):
    """OOV terms never count toward the minimum: a 2-term query where
    one term is OOV returns nothing at msm=2, on both paths."""
    q = [(1, "scalable zzzznotaterm")]
    for thr in (0, 10**9):
        got = wand_topk(
            index, q, k=10, taat_threshold=thr, min_should_match=2
        ).collect()
        assert got == []


def test_msm_monotone_result_shrinkage(spark, index):
    """Raising msm can only shrink each query's qualifying doc set:
    every (query, doc) at msm=3 must also appear at msm=2."""
    at2 = {
        (q, d)
        for q, _r, d, _s in _canon(
            wand_topk(index, QUERY_SET, k=1000, min_should_match=2)
        )
    }
    at3 = {
        (q, d)
        for q, _r, d, _s in _canon(
            wand_topk(index, QUERY_SET, k=1000, min_should_match=3)
        )
    }
    assert at3 <= at2
