"""Conjunctive (AND) retrieval: the index-side leapfrog/vectorized
paths must match the declarative brute-force plan exactly, and the two
index paths must match each other."""

from __future__ import annotations

import pytest

from embed_rerank_spark.operators.bm25 import bm25_topk_conjunctive_bruteforce
from embed_rerank_spark.operators.postings import InvertedIndex, build_postings
from embed_rerank_spark.operators.wand import conjunctive_topk
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


def test_conjunctive_index_matches_bruteforce(spark, index):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = _canon(conjunctive_topk(index, QUERY_SET, k=10))
    want = _canon(bm25_topk_conjunctive_bruteforce(spark, docs, QUERY_SET, k=10))
    assert got == want
    assert want, "conjunctive fixture produced no matches at all"
    # q2 contains 'strategy' (out of vocabulary) -> AND semantics: empty
    assert not any(q == 2 for q, _r, _d, _s in want)
    # q7 ('the a') is all-hot-terms: AND of stopwords must match many docs
    assert sum(1 for q, _r, _d, _s in want if q == 7) == 10


def test_leapfrog_and_vectorized_paths_identical(spark, index):
    """Force each path via the taat threshold; results must be
    bit-identical (same formula, same tie order)."""
    leap = _canon(conjunctive_topk(index, QUERY_SET, k=10, taat_threshold=0))
    vect = _canon(conjunctive_topk(index, QUERY_SET, k=10, taat_threshold=10**9))
    assert leap == vect


def test_conjunctive_salted_index_same_results(spark):
    """Salt runs are contiguous doc ranges of one term: ordered by
    first_doc they form ONE ascending run, so the leapfrog cursor must
    return identical results on a salted build."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def mk(n_salts):
        built = build_postings(docs, n_shards=4, n_salts=n_salts)
        cs = built["corpus_stats"].collect()[0]
        return InvertedIndex(
            postings=built["postings"],
            term_stats=built["term_stats"],
            doc_stats=built["doc_stats"],
            n_docs=cs["n_docs"],
            avgdl=float(cs["avgdl"]),
        )

    a = _canon(conjunctive_topk(mk(1), QUERY_SET, k=10, taat_threshold=0))
    b = _canon(conjunctive_topk(mk(4), QUERY_SET, k=10, taat_threshold=0))
    assert a == b


def test_diversify_topk_caps_per_group(spark):
    """Host-crowding rule: at most n results per source per query,
    and survivors keep relative score order."""
    from embed_rerank_spark.operators.bm25 import (
        bm25_topk_bruteforce,
        diversify_topk,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    deep = bm25_topk_bruteforce(spark, docs, QUERY_SET, k=30)
    out = diversify_topk(
        deep.select("query_id", "doc_id", "score"),
        docs.select("doc_id", "source"),
        n_per_group=2,
        k=10,
    ).collect()
    assert out
    from collections import Counter

    per = Counter((r["query_id"], r["source"]) for r in out)
    assert max(per.values()) <= 2
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], round(r["score"], 6)))
    for rows in by_q.values():
        rows.sort()
        scores = [s for _r, s in rows]
        assert scores == sorted(scores, reverse=True)


def test_prefix_topk_expansion_and_cap(spark, index):
    """Wildcard retrieval: expansion is df-desc capped; an unmatched
    prefix returns nothing; results equal an explicit OR query over
    the expansion."""
    from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce
    from embed_rerank_spark.operators.wand import expand_prefix, prefix_topk

    exp = expand_prefix(index, "s", max_expansion=4)
    assert len(exp) == 4 and all(t.startswith("s") for t in exp)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = _canon(prefix_topk(index, [(1, "sca"), (2, "zzz")], k=10))
    full = expand_prefix(index, "sca", max_expansion=64)
    want = _canon(bm25_topk_bruteforce(spark, docs, [(1, " ".join(full))], k=10))
    assert got == want and got
    assert not any(q == 2 for q, _r, _d, _s in got)


def test_conj_vectorized_duplicate_docs_keep_max_tf_dl_winner():
    """A re-crawled doc appearing in two tiered units collapses to the
    max-(tf, dl) posting — deterministic and identical to the merge
    encoder's rule, regardless of unit concatenation order."""
    import numpy as np

    from embed_rerank_spark.operators.wand import _conj_vectorized, _tfpart

    for order in ([0, 1], [1, 0]):
        docs = np.array([5, 5], dtype=np.int64)[order]
        tf = np.array([2, 3], dtype=np.int64)[order]
        dl = np.array([10, 9], dtype=np.int64)[order]
        cache = {"a": (docs, tf, dl)}
        out = _conj_vectorized(cache, [("a", 1.0)], k=5, avgdl=9.5, k1=1.2, b=0.75)
        assert len(out) == 1
        d, s = out[0]
        assert d == 5
        assert s == float(_tfpart(3.0, 9.0, 9.5, 1.2, 0.75))


def test_suffix_topk_expansion_and_empty(spark, index):
    """*suffix expands via endswith over the dictionary and scores as
    the OR query; a no-match suffix returns zero rows."""
    from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce
    from embed_rerank_spark.operators.wand import expand_suffix, suffix_topk

    terms = expand_suffix(index, "an", max_expansion=64)
    assert terms and all(t.endswith("an") for t in terms)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = _canon(suffix_topk(index, [(1, "an"), (2, "qqq")], k=10))
    want = _canon(bm25_topk_bruteforce(spark, docs, [(1, " ".join(terms))], k=10))
    assert got == want and got
    assert not any(q == 2 for q, _r, _d, _s in got)


def test_constant_score_topk_filter_semantics(spark, index):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from embed_rerank_spark.functions.udfs import tokenize_for_scoring
    from embed_rerank_spark.operators.wand import constant_score_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    queries = [(qid, q) for qid, q in QUERY_SET[:6]] + [(99, "zzzneverseen")]
    k, boost = 10, 1.7

    # declarative brute force: docs containing every query term,
    # k smallest doc_ids, uniform score
    toks = docs.select(
        "doc_id", F.array_distinct(tokenize_for_scoring(F.col("text"))).alias("ts")
    )
    want = []
    for qid, q in queries:
        terms = list(dict.fromkeys(t for t in q.strip().lower().split() if t))
        cond = None
        for t in terms:
            c = F.array_contains("ts", t)
            cond = c if cond is None else (cond & c)
        rows = (
            toks.filter(cond).orderBy("doc_id").limit(k).collect()
            if cond is not None
            else []
        )
        want += [(qid, i + 1, r["doc_id"], boost) for i, r in enumerate(rows)]

    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in constant_score_topk(index, queries, k=k, boost=boost).collect()
    )
    assert got == sorted(want)
    assert not any(q == 99 for q, *_ in got)  # OOV term -> no matches
