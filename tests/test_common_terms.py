"""Lucene CommonTermsQuery / ES cutoff_frequency semantics: terms
whose df exceeds cutoff * n_docs score but cannot gate matching. The
match set comes from the low-frequency terms; a query with no low
terms falls back to an OR over its common terms; a query whose only
low terms are out-of-vocabulary matches nothing (the Lucene behavior:
the low-freq subquery exists but hits zero docs)."""

from __future__ import annotations

import pytest

from embed_rerank_spark.operators.bm25 import (
    bm25_topk_bruteforce,
    common_terms_topk,
)
from embed_rerank_spark.queryset import QUERY_SET

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    # "the" in 5/6 docs (df 0.83 > 0.5 -> common); "dup" in 1 (low).
    rows = [
        (1, "the quick dup"),
        (2, "the quick fox"),
        (3, "the lazy fox"),
        (4, "the fox"),
        (5, "the lazy"),
        (6, "quick lazy"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in df.collect()
    )


def test_low_terms_gate_common_terms_still_score(spark, docs):
    out = common_terms_topk(spark, docs, [(1, "dup the")], cutoff=0.5, k=10)
    rows = _rows(out)
    # only doc 1 contains the low term "dup"
    assert [r[2] for r in rows] == [1]
    # the common term "the" contributed: score strictly above dup-only
    dup_only = _rows(common_terms_topk(spark, docs, [(1, "dup")], cutoff=0.5, k=10))
    assert rows[0][3] > dup_only[0][3]


def test_all_common_query_falls_back_to_or(spark, docs):
    out = common_terms_topk(spark, docs, [(1, "the")], cutoff=0.5, k=10)
    assert sorted(r[2] for r in _rows(out)) == [1, 2, 3, 4, 5]


def test_oov_low_term_matches_nothing(spark, docs):
    # "zzz" is low (df 0) so it gates matching -- and matches no docs,
    # even though "the" alone would match five.
    out = common_terms_topk(spark, docs, [(1, "zzz the")], cutoff=0.5, k=10)
    assert out.count() == 0


def test_cutoff_one_degenerates_to_plain_bm25(spark):
    corpus = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # cutoff 1.0: df can never exceed n_docs, so no term is common and
    # the operator must reproduce the plain OR-mode BM25 exactly.
    got = _rows(common_terms_topk(spark, corpus, QUERY_SET, cutoff=1.0, k=10))
    want = _rows(bm25_topk_bruteforce(spark, corpus, QUERY_SET, k=10))
    assert got == want
