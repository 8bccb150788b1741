"""ES _termvectors API (per-doc term vectors with corpus term stats)
and function_score field_value_factor (multiply/sum boost_mode,
max_boost clamp, min_score pruning)."""

from __future__ import annotations

import math

import pytest

from embed_rerank_spark.operators.bm25 import (
    bm25_topk_bruteforce,
    function_score_topk,
)
from embed_rerank_spark.operators.termvectors import term_vectors


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "fox the fox", 30),
        (2, "the lazy dog", 60),
        (3, "fox dog", 120),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, n_chars long")


def test_term_vectors_positions_and_corpus_stats(spark, docs):
    out = {
        (r["doc_id"], r["term"]): r
        for r in term_vectors(docs, [1, 3]).collect()
    }
    # doc 2 not requested
    assert all(d in (1, 3) for d, _ in out)
    r = out[(1, "fox")]
    assert (r["tf"], r["positions"]) == (2, "0,2")
    # corpus-wide stats include the unrequested doc 2
    assert (r["df"], r["ttf"]) == (2, 3)
    assert (out[(3, "dog")]["df"], out[(3, "dog")]["ttf"]) == (2, 2)
    assert out[(1, "the")]["positions"] == "1"


def _scores(df):
    return {(r["query_id"], r["doc_id"]): round(r["score"], 6) for r in df.collect()}


def test_function_score_multiply_and_clamp(spark, docs):
    q = [(1, "fox")]
    base = _scores(bm25_topk_bruteforce(spark, docs, q, k=10))
    # max_boost 2.0 clamps every fvf (log1p(n_chars) > 3 here), so the
    # blend is exactly 2x BM25 for every hit
    out = _scores(
        function_score_topk(
            spark, docs, q, "n_chars", factor=1.0, modifier="log1p",
            boost_mode="multiply", max_boost=2.0,
        )
    )
    assert set(out) == set(base)
    for key, s in out.items():
        assert s == pytest.approx(2.0 * base[key], abs=1e-6)


def test_function_score_sum_mode_and_min_score(spark, docs):
    q = [(1, "dog")]
    base = _scores(bm25_topk_bruteforce(spark, docs, q, k=10))
    out = _scores(
        function_score_topk(
            spark, docs, q, "n_chars", factor=0.5, modifier="sqrt",
            boost_mode="sum",
        )
    )
    for (qid, d), s in out.items():
        nc = {1: 30, 2: 60, 3: 120}[d]
        assert s == pytest.approx(base[(qid, d)] + 0.5 * math.sqrt(nc), abs=1e-6)
    # min_score above the weakest hit prunes it
    lo = min(out.values())
    pruned = _scores(
        function_score_topk(
            spark, docs, q, "n_chars", factor=0.5, modifier="sqrt",
            boost_mode="sum", min_score=lo + 1e-6,
        )
    )
    assert len(pruned) == len(out) - 1 and lo not in pruned.values()


def test_function_score_rejects_bad_knobs(spark, docs):
    with pytest.raises(ValueError):
        function_score_topk(spark, docs, [(1, "fox")], "n_chars", modifier="exp")
    with pytest.raises(ValueError):
        function_score_topk(spark, docs, [(1, "fox")], "n_chars", boost_mode="avg")
    with pytest.raises(ValueError):
        function_score_topk(spark, docs, [(1, "fox")], "n_chars", factor=-1.0)


def test_match_bool_prefix_semantics(spark):
    from embed_rerank_spark.operators.bm25 import (
        bm25_topk_bruteforce,
        match_bool_prefix_bruteforce,
    )

    corpus = spark.createDataFrame(
        [
            (1, "fast car"),       # fixed match + prefix match (ca*)
            (2, "fast dog"),       # fixed only
            (3, "cat cargo"),      # prefix only
            (4, "dog house"),      # neither
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: round(r["score"], 6)
        for r in match_bool_prefix_bruteforce(spark, corpus, [(1, "fast ca")]).collect()
    }
    base = {
        r["doc_id"]: round(r["score"], 6)
        for r in bm25_topk_bruteforce(spark, corpus, [(1, "fast")]).collect()
    }
    # pure shoulds: prefix-only docs match; "dog house" does not
    assert set(out) == {1, 2, 3}
    # constant-score prefix: +1.0 exactly, regardless of expansion count
    assert out[1] == pytest.approx(base[1] + 1.0)
    assert out[2] == pytest.approx(base[2])
    assert out[3] == pytest.approx(1.0)
    # prefix-only query: every match scores the bare constant
    only = {
        r["doc_id"]: round(r["score"], 6)
        for r in match_bool_prefix_bruteforce(spark, corpus, [(1, "ca")]).collect()
    }
    assert only == {1: 1.0, 3: 1.0}


def test_pmi_segmentation_filters_collocations(spark):
    from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce
    from embed_rerank_spark.operators.rewrite import (
        segment_queries_by_pmi,
        segmented_topk_bruteforce,
    )

    # "new york" is a strong collocation (always adjacent); "dog" and
    # "cat" are independent fillers
    rows = [(i, "new york trip") for i in range(1, 7)]
    rows += [(7, "york new order"), (8, "new car york plate"), (9, "dog cat")]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    seg = segment_queries_by_pmi(
        spark, corpus, [(1, "new york dog")], min_pmi=0.1, min_count=3
    )
    assert seg == {1: [("new", "york")]}
    out = segmented_topk_bruteforce(
        spark, corpus, [(1, "new york dog")], k=100, min_pmi=0.1, min_count=3
    )
    got = sorted(r["doc_id"] for r in out.collect())
    # docs 7 (reversed) and 8 (non-adjacent) carry both terms but fail
    # the phrase filter; doc 9 matches "dog" but not the phrase
    assert got == [1, 2, 3, 4, 5, 6]
    # scores are the plain BM25 of the full term set (filter adds none)
    base = {
        r["doc_id"]: round(r["score"], 6)
        for r in bm25_topk_bruteforce(spark, corpus, [(1, "new york dog")], k=100).collect()
    }
    for r in out.collect():
        assert round(r["score"], 6) == base[r["doc_id"]]
