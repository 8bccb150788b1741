"""Round-3 operators: regexp term queries, doc-value range filter,
recency rescore window."""

from __future__ import annotations

from pyspark.sql import functions as F

from embed_rerank_spark.operators.bm25 import (
    bm25_topk_bruteforce,
    docvalue_range_topk,
    rescore_by_recency,
)
from embed_rerank_spark.operators.postings import (
    InvertedIndex,
    build_postings,
    write_index,
)
from embed_rerank_spark.operators.wand import expand_regexp, regexp_topk, wand_topk


def _corpus(spark):
    rows = [
        (1, "join join scan the"),
        (2, "jointly scanning sort"),
        (3, "join sort merge"),
        (4, "table scan slow"),
        (5, "the a the a"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _index(spark, docs, tmp_path):
    path = str(tmp_path / "idx")
    write_index(build_postings(docs, n_shards=2), path)
    return InvertedIndex.load(spark, path)


def test_expand_regexp_whole_term_only(spark, tmp_path):
    # Lucene RegexpQuery semantics: 'jo.n' matches 'join' but must NOT
    # match the longer 'jointly' (unanchored Java regex would).
    index = _index(spark, _corpus(spark), tmp_path)
    assert expand_regexp(index, "jo.n") == ["join"]
    assert expand_regexp(index, "s(can|ort)") == ["scan", "sort"]
    assert expand_regexp(index, "zz+") == []


def test_expand_regexp_cap_orders_df_desc(spark, tmp_path):
    index = _index(spark, _corpus(spark), tmp_path)
    # '.*' matches everything; the cap keeps the df-desc/term-asc head.
    top2 = expand_regexp(index, ".*", max_expansion=2)
    full = expand_regexp(index, ".*", max_expansion=1000)
    assert top2 == full[:2]


def test_regexp_topk_matches_bruteforce_of_expansion(spark, tmp_path):
    docs = _corpus(spark)
    index = _index(spark, docs, tmp_path)
    got = regexp_topk(index, [(1, "jo.n"), (2, "zz+")], k=5).collect()
    # qid 2 expands to nothing -> no rows at all for it
    assert {r["query_id"] for r in got} == {1}
    want = bm25_topk_bruteforce(spark, docs, [(1, "join")], k=5).collect()
    assert [(r["rank"], r["doc_id"]) for r in sorted(got, key=lambda r: r["rank"])] == [
        (r["rank"], r["doc_id"]) for r in sorted(want, key=lambda r: r["rank"])
    ]


def test_docvalue_range_keeps_full_corpus_scores(spark):
    # Filter-context semantics: in-range docs keep EXACTLY their
    # unfiltered BM25 scores (idf/avgdl/N computed over the whole
    # corpus, not the filtered subset).
    docs = _corpus(spark)
    dv = docs.select("doc_id", (F.col("doc_id") * 10.0).alias("value"))
    unfiltered = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_topk_bruteforce(spark, docs, [(1, "join scan")], k=10).collect()
    }
    got = docvalue_range_topk(
        spark, docs, dv, [(1, "join scan")], lo=15.0, hi=45.0, k=10
    ).collect()
    assert {r["doc_id"] for r in got} <= {2, 3, 4}
    for r in got:
        assert r["score"] == unfiltered[(r["query_id"], r["doc_id"])]


def test_docvalue_range_filter_is_distributed(spark):
    # The in-range doc set must never be collected to the driver: the
    # plan is a semi-join, no local (driver-materialized) relation of
    # corpus size.
    docs = _corpus(spark)
    dv = docs.select("doc_id", F.col("doc_id").cast("double").alias("value"))
    out = docvalue_range_topk(spark, docs, dv, [(1, "join")], lo=0.0, hi=10.0, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_rescore_by_recency_reorders_within_window_only(spark, tmp_path):
    docs = _corpus(spark)
    index = _index(spark, docs, tmp_path)
    queries = [(1, "join scan sort")]
    window = wand_topk(index, queries, k=2)
    in_window = {r["doc_id"] for r in window.collect()}
    # Give every doc OUTSIDE the window an enormous recency boost;
    # the rescore contract says they still can't appear.
    dv = docs.select(
        "doc_id",
        F.when(F.col("doc_id").isin(list(in_window)), F.lit(0.0))
        .otherwise(F.lit(10_000.0))
        .alias("value"),
    )
    got = rescore_by_recency(window, dv, k=2, now=365.0, half_life=90.0).collect()
    assert {r["doc_id"] for r in got} == in_window


def test_rescore_by_recency_decay_formula(spark):
    cands = spark.createDataFrame(
        [(1, 10, 2.0), (1, 20, 2.0)], "query_id long, doc_id long, score double"
    )
    # doc 20 is one half-life fresher -> exactly 2x the combined score.
    dv = spark.createDataFrame(
        [(10, 185.0), (20, 275.0)], "doc_id long, value double"
    )
    got = {
        r["doc_id"]: (r["rank"], r["score"])
        for r in rescore_by_recency(cands, dv, k=2, now=365.0, half_life=90.0).collect()
    }
    assert got[20][0] == 1 and got[10][0] == 2
    assert abs(got[20][1] / got[10][1] - 2.0) < 1e-12


def test_sort_by_docvalue_orders_matches_by_field(spark):
    from embed_rerank_spark.operators.bm25 import sort_by_docvalue_topk

    docs = _corpus(spark).withColumn("n_chars", F.length("text"))
    # "join" matches docs 1 and 3; descending text length: doc 1 first
    got = sort_by_docvalue_topk(spark, docs, [(1, "join")], "n_chars", k=5).collect()
    assert [(r["rank"], r["doc_id"]) for r in got] == [(1, 1), (2, 3)]
    # ascending flips the order
    asc = sort_by_docvalue_topk(
        spark, docs, [(1, "join")], "n_chars", k=5, ascending=True
    ).collect()
    assert [(r["rank"], r["doc_id"]) for r in asc] == [(1, 3), (2, 1)]
    # relevance plays no role: "the" matches 1 and 5 and the tf-heavy
    # doc 5 sorts purely by field; k caps output
    the1 = sort_by_docvalue_topk(spark, docs, [(1, "the")], "n_chars", k=1).collect()
    assert len(the1) == 1 and the1[0]["doc_id"] == 1
    # no matches -> no rows
    assert sort_by_docvalue_topk(spark, docs, [(1, "zzz")], "n_chars", k=5).count() == 0


def test_sort_by_docvalue_tiebreak_doc_id_asc(spark):
    from embed_rerank_spark.operators.bm25 import sort_by_docvalue_topk

    rows = [(1, "tie x"), (2, "tie y"), (3, "tie z")]
    docs = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "val", F.lit(7.0)
    )
    got = sort_by_docvalue_topk(spark, docs, [(1, "tie")], "val", k=3).collect()
    assert [(r["rank"], r["doc_id"]) for r in got] == [(1, 1), (2, 2), (3, 3)]
