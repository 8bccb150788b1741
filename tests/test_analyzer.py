"""Stop analyzer (Lucene StopFilter parity): index- and query-time
token filtering, with corpus statistics recomputed over the analyzed
stream."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from embed_rerank_spark.functions.udfs import (  # noqa: E402
    STOPWORDS_EN,
    analyze_query_stop,
    analyze_stop,
)
from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce  # noqa: E402


def test_analyze_stop_filters_tokens(spark):
    docs = spark.createDataFrame(
        [(1, "The fast HASH join of the a an"), (2, "the a an of")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text"] for r in analyze_stop(docs).collect()}
    assert got[1] == "fast hash join"
    assert got[2] == ""  # all-stopword doc analyzes to empty


def test_analyze_query_stop_mirrors_index_side(spark):
    qs = analyze_query_stop([(1, "The FAST join"), (2, "the a")])
    assert qs == [(1, "fast join"), (2, "")]
    for s in STOPWORDS_EN:
        assert s not in qs[0][1].split()


def test_analyzed_bm25_recomputes_stats_and_drops_stop_queries(spark):
    docs = spark.createDataFrame(
        [
            (1, "the fast hash join"),
            (2, "the the the slow scan"),
            (3, "a hash table"),
            (4, "the a an"),  # vanishes from the analyzed corpus
        ],
        "doc_id long, text string",
    )
    queries = [(1, "hash"), (2, "the a"), (3, "the hash")]
    out = bm25_topk_bruteforce(
        spark, analyze_stop(docs), analyze_query_stop(queries), k=10
    ).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    # all-stopword query matches nothing
    assert 2 not in by_q
    # 'the' contributes nothing after analysis: q3 == q1 rankings
    assert [(r["doc_id"], r["score"]) for r in sorted(by_q[1], key=lambda r: r["rank"])] == [
        (r["doc_id"], r["score"]) for r in sorted(by_q[3], key=lambda r: r["rank"])
    ]
    # analyzed corpus stats: n_docs=3 (doc 4 gone), df(hash)=2 ->
    # idf = ln((3-2+0.5)/(2+0.5)+1) — dl(doc1)=3 after stop removal.
    import math

    n, df_, tf, dl, avgdl = 3, 2, 1, 3, (3 + 2 + 2) / 3
    want = math.log((n - df_ + 0.5) / (df_ + 0.5) + 1.0) * (
        tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    )
    got = {r["doc_id"]: r["score"] for r in by_q[1]}
    assert abs(got[1] - want) < 1e-6


def test_s_stem_collapses_plurals(spark):
    """Stemmed retrieval: 'tables' queries match 'table' docs and vice
    versa; df reflects the collapsed form."""
    from embed_rerank_spark.functions.udfs import (
        analyze_query_s_stem,
        analyze_s_stem,
        _s_stem_py,
    )
    from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce

    # rule table (Harman 1991): stems needn't be words
    # rule-1-excluded "eies" falls through the cascade to rule 2
    assert [_s_stem_py(w) for w in
            ["tables", "queries", "trees", "bus", "class", "eies", "cat"]] == [
        "table", "query", "tree", "bus", "class", "eie", "cat"
    ]
    docs = spark.createDataFrame(
        [(1, "table scan"), (2, "tables everywhere"), (3, "other words")],
        "doc_id long, text string",
    )
    out = bm25_topk_bruteforce(
        spark,
        analyze_s_stem(docs),
        analyze_query_s_stem([(0, "tables")]),
        k=5,
    ).collect()
    assert {r.doc_id for r in out} == {1, 2}
    # the stemmed stream is what norms see: both docs have df(table)=2
    stemmed = {r.doc_id: r.text for r in analyze_s_stem(docs).collect()}
    assert stemmed[2] == "table everywhere"
