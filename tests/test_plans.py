"""Physical-plan guards: the scale-critical plan properties must not
regress (term pushdown into the postings scan, broadcast of the tiny
query side — SURVEY.md §2.5 joins / §4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    from embed_rerank_spark.operators.postings import build_postings, write_index

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path_factory.mktemp("planidx"))
    write_index(build_postings(docs, n_shards=4), path)
    from embed_rerank_spark.operators.postings import InvertedIndex

    return InvertedIndex.load(spark, path)


def test_term_filter_pushed_into_postings_scan(spark, index):
    plan = _plan(index.postings.filter(F.col("term").isin(["the", "data"])))
    assert "PushedFilters: [In(term" in plan, plan


def test_postings_scan_prunes_columns(spark, index):
    plan = _plan(index.postings.select("term", "n_docs"))
    # ReadSchema should not include the binary payload columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "docs_bin" not in read_schema, read_schema


def test_bm25_broadcasts_query_side(spark):
    from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(bm25_topk_bruteforce(spark, docs, [(0, "the data")], k=5))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_embedding_near_dup_has_no_allpairs_join(spark):
    """The LSH-bucketed near-dup must plan as equi-joins on
    (table, bucket) / ids — never a CartesianProduct or
    BroadcastNestedLoopJoin (the O(n^2) shapes)."""
    from embed_rerank_spark.operators.dedup import embedding_near_dup

    vectors = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(embedding_near_dup(vectors, threshold=0.5, bits=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rerank_validation_scans_candidates_once(spark, tmp_path):
    """The cap-validation stage must not multiply the candidate
    subtree: the rerank output plan reads the candidates source exactly
    once (the quarantine metrics branch is separate and lazy)."""
    from embed_rerank_spark.operators.rerank import rerank_candidates
    from embed_rerank_spark.sources.pages import generate_pages
    from embed_rerank_spark.plans.build_index import extract_pages

    docs = extract_pages(generate_pages(spark, 60, seed=2, n_snapshots=1)).select(
        "doc_id", "text"
    )
    cands_path = str(tmp_path / "cands")
    docs.select("doc_id").limit(20).crossJoin(
        spark.range(2).withColumnRenamed("id", "query_id")
    ).write.parquet(cands_path)
    cands = spark.read.parquet(cands_path)
    out = rerank_candidates(cands, docs, [(0, "q one"), (1, "q two")], top_k=5, hidden=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("cands") == 1, plan


def test_positional_scan_pushes_term_filter_and_wand_prunes_pos(
    spark, tmp_path_factory
):
    """Phrase retrieval reads only the phrase terms' blocks (term
    pushdown reaches the parquet scan of the positional postings), and
    the BM25/WAND path over the SAME positional index never reads the
    pos_bin payload (column pruning)."""
    from embed_rerank_spark.operators.positions import build_positional_postings
    from embed_rerank_spark.operators.postings import InvertedIndex, write_index
    from embed_rerank_spark.operators.wand import wand_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path_factory.mktemp("posidx"))
    write_index(build_positional_postings(docs, n_shards=4), path)
    index = InvertedIndex.load(spark, path)

    plan = _plan(index.postings.filter(F.col("term").isin(["fast", "table"])))
    assert "PushedFilters: [In(term" in plan, plan

    wplan = _plan(wand_topk(index, [(0, "fast table")], k=5))
    read_schema = [l for l in wplan.splitlines() if "ReadSchema" in l and "docs_bin" in l]
    assert read_schema and all("pos_bin" not in l for l in read_schema), wplan


def test_hash_sample_is_shuffle_free(spark):
    """Deterministic sampling must stay a stateless filter: no
    Exchange in the plan (embarrassingly parallel at any scale)."""
    from embed_rerank_spark.operators.sampling import hash_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(hash_sample(docs, 100))
    assert "Exchange" not in plan, plan


def test_span_dedup_plans_as_equijoins(spark):
    """Exact-substring span dedup must join dup fingerprints back by
    fp equality — never an all-pairs shape — and the window-df agg
    must be a hash aggregate (map-side combinable)."""
    from embed_rerank_spark.operators.dedup import duplicate_span_coverage

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(duplicate_span_coverage(docs, window=16))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan


def test_anchor_stream_plans_as_equijoins(spark):
    """Anchor aggregation: edges join sources and group by target via
    equi-joins/hash aggregation only."""
    from embed_rerank_spark.operators.graph import anchor_token_stream

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    edges = docs.selectExpr("doc_id as src", "(doc_id + 1) % 100 as dst")
    plan = _plan(anchor_token_stream(docs, edges))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_unigram_ce_broadcasts_total_and_joins_vocab_by_term(spark):
    """The corpus-total side is a 1-row broadcast; the vocabulary join
    keys on term (no nested-loop shapes beyond that broadcast)."""
    from embed_rerank_spark.operators.textstats import unigram_cross_entropy

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(unigram_cross_entropy(docs))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the 1-row total only


def test_suffix_expansion_uses_stored_reversed_term_prefix(spark, index):
    """*suffix must plan as a string-PREFIX predicate on the stored
    ``rterm`` column, pushed into the term_stats parquet scan — never
    a full-dictionary endswith (which no scan statistic can prune)."""
    from embed_rerank_spark.operators.wand import expand_suffix

    assert "rterm" in index.term_stats.columns
    plan = _plan(index.term_stats.filter(F.col("rterm").startswith("re")))
    assert "StringStartsWith(rterm,re)" in plan, plan
    # semantics: identical expansion to a plain endswith dictionary scan
    got = expand_suffix(index, "er", max_expansion=16)
    want = [
        r["term"]
        for r in index.term_stats.filter(F.col("term").endswith("er"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(16)
        .collect()
    ]
    assert got == want and got


def test_shard_file_layout_skips_query_shuffle(spark, index):
    """A shard-file index (write_index layout marker + LAYOUT.json)
    must answer WAND batches straight off the term-filtered scan — no
    repartition exchange feeding the kernel — and produce EXACTLY the
    rows of the explicit-shuffle fallback."""
    from dataclasses import replace

    from embed_rerank_spark.operators.wand import wand_topk

    assert index.shard_files and index.whole_shard_scan_ok()
    qs = [(i, f"the data w{i} w{i * 7 % 300}") for i in range(8)]
    fast = wand_topk(index, qs, k=10)
    assert "rangepartitioning(shard" not in _plan(fast)

    slow_idx = replace(index, shard_files=False, _scan_ok=None)
    slow = wand_topk(slow_idx, qs, k=10)
    assert "rangepartitioning(shard" in _plan(slow)
    key = lambda r: (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))  # noqa: E731
    assert sorted(map(key, fast.collect())) == sorted(map(key, slow.collect()))


def test_shard_scan_fast_path_disabled_when_files_could_split(spark, index):
    """If any postings file exceeds the session's effective max split
    size, the planner may split a shard across tasks — the fast path
    must refuse and fall back to the explicit shuffle."""
    from dataclasses import replace

    probe = replace(index, _scan_ok=None)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
        spark.conf.set("spark.sql.files.openCostInBytes", "1024")
        assert not probe.whole_shard_scan_ok()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)


def test_round3_ops_broadcast_and_no_cartesian(spark):
    """The round-3 query-surface ops keep the scale-critical shape:
    tiny query side broadcast, no cartesian products, no sort-merge
    joins in the match path."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from embed_rerank_spark.operators.bm25 import (
        bm25_scores_bruteforce,
        collapse_topk,
        dismax_topk_bruteforce,
        hit_counts,
        query_terms,
    )
    from embed_rerank_spark.operators.facets import range_facets

    qs = [(0, "the data")]
    for df in (
        dismax_topk_bruteforce(spark, docs, qs, k=5),
        range_facets(spark, docs, qs, "n_chars", [100.0, 300.0]),
        hit_counts(spark, docs, qs),
        collapse_topk(
            bm25_scores_bruteforce(docs, query_terms(spark, qs)),
            docs.select("doc_id", "source"),
            k=5,
        ),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan


def test_bigram_ce_joins_by_gram_no_corpus_window(spark):
    """bigram_ce must be aggs + gram/term-keyed joins — no window over
    corpus rows, no cartesian (the broadcast of the 1-row total is the
    only nested loop)."""
    from embed_rerank_spark.operators.textstats import bigram_cross_entropy

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(bigram_cross_entropy(docs))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_trigram_expansion_filters_dictionary_scan(spark, index):
    """The infix candidate scan must push the tiny trigram IN-filter
    into the dictionary scan (never a full-vocab contains pass)."""
    from embed_rerank_spark.operators.wand import build_trigram_dictionary

    td = build_trigram_dictionary(index)
    cand = (
        td.filter(F.col("tri").isin(["has", "ash"]))
        .groupBy("term", "df")
        .agg(F.count_distinct("tri").alias("n_tri"))
        .filter(F.col("n_tri") == 2)
    )
    plan = _plan(cand)
    assert "CartesianProduct" not in plan
    assert "Exchange" in plan  # one agg shuffle over candidates only


def test_session2_ops_broadcast_and_no_cartesian(spark):
    """Session-2 round-3 operators keep the scale shape: the small
    side (registered queries / foreground window / mix targets /
    doc-value candidates) broadcasts, and nothing plans a cartesian."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from embed_rerank_spark.operators.bm25 import (
        docvalue_range_topk,
        rescore_by_recency,
    )
    from embed_rerank_spark.operators.facets import stats_facets
    from embed_rerank_spark.operators.mlt import significant_terms
    from embed_rerank_spark.operators.percolate import percolate
    from embed_rerank_spark.operators.sampling import temperature_mix

    qs = [(0, "the data")]
    dv = docs.select("doc_id", F.col("n_chars").cast("double").alias("value"))
    cands = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 0.5)], "query_id long, doc_id long, score double"
    )
    for df in (
        percolate(docs, [(0, "+the data")]),
        significant_terms(spark, docs, qs, window=10),
        temperature_mix(docs, 0.5, 100, domain_col="lang"),
        docvalue_range_topk(spark, docs, dv, qs, 100, 300),
        rescore_by_recency(cands, dv, k=2),
        stats_facets(spark, docs, qs, "n_chars", cardinality_col="source"),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan


def test_docvalue_range_pushes_predicate_to_docvalues_scan(spark):
    """The [lo, hi) predicate must reach the doc-values side as a
    plain filter (partition-prunable on a time-partitioned table),
    not be evaluated post-join."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from embed_rerank_spark.operators.bm25 import docvalue_range_topk

    dv = docs.select("doc_id", F.col("n_chars").cast("double").alias("value"))
    out = docvalue_range_topk(spark, docs, dv, [(0, "data")], 100.0, 300.0)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # Catalyst collapses the 'value' alias back to the source column:
    # the filter sits directly on the n_chars scan, both bounds intact
    assert ">= 100.0" in plan and "< 300.0" in plan, plan
    pushed = [
        ln for ln in plan.splitlines()
        if "Filter" in ln and ">= 100.0" in ln and "< 300.0" in ln
    ]
    assert pushed and "n_chars" in pushed[0], plan


def test_session3_ops_broadcast_and_no_cartesian(spark):
    """Session-3 query/agg ops keep the scale-critical shape: tiny
    query side broadcast, no cartesian products; chunking stays
    shuffle-free."""
    from embed_rerank_spark.operators.bm25 import (
        boosting_topk_bruteforce,
        rank_feature_topk,
    )
    from embed_rerank_spark.operators.facets import (
        date_histogram,
        percentiles_facets,
        top_hits_by_bucket,
    )
    from embed_rerank_spark.operators.packing import chunk_documents

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs_ts = docs.withColumn(
        "warc_ts",
        F.to_timestamp(
            F.date_add(F.lit("2024-01-01").cast("date"), (F.col("n_chars") % 365).cast("int"))
        ),
    )
    qs = [(0, "the data")]
    for df in (
        boosting_topk_bruteforce(spark, docs, [(0, "the data", "slow")], k=5),
        rank_feature_topk(spark, docs, qs, "n_chars", k=5, pivot=300.0),
        date_histogram(spark, docs_ts, qs, "warc_ts"),
        top_hits_by_bucket(spark, docs, qs, "lang", k_hits=2, top_buckets=2),
        percentiles_facets(spark, docs, qs, "n_chars", [0.5]),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan
    assert "Exchange" not in _plan(chunk_documents(docs, 32, 8))


def test_session5_ops_broadcast_and_no_cartesian(spark):
    """Session-5 ops keep the scale shape: query/model sides broadcast,
    no cartesian products anywhere (the decay/boolquery CROSS JOINs of
    one-row stats plan as broadcast nested loops, never a shuffle
    cartesian)."""
    from embed_rerank_spark.operators.bm25 import (
        most_fields_topk_bruteforce,
        random_score_topk,
    )
    from embed_rerank_spark.operators.boolquery import Bool, nested_bool_topk
    from embed_rerank_spark.operators.dsir import dsir_select, importance_weights
    from embed_rerank_spark.operators.nesteddocs import (
        has_child_topk,
        has_parent_topk,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    children = docs.selectExpr(
        "doc_id as parent_id", "doc_id * 2 as child_id", "text"
    )
    qs = [(0, "the data")]
    trees = [(0, Bool(must=["data"], should=["scan", "table"]))]
    tgt = docs.filter("source = 'src0'")
    for df in (
        has_child_topk(spark, children, qs, k=5),
        has_parent_topk(spark, docs, children, qs, k=5),
        most_fields_topk_bruteforce(spark, docs, qs, k=5),
        random_score_topk(spark, docs, qs, k=5),
        nested_bool_topk(spark, docs, trees, k=5),
        importance_weights(docs, tgt, n_buckets=64),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan
    # the DSIR prefix-count cut materializes eagerly; guard its
    # weights stage instead (above) and its output size here
    sel = dsir_select(docs, tgt, budget=10, n_buckets=64)
    assert sel.count() == 10


def test_constant_score_filter_is_term_pruned_and_rank_by_doc_id(spark, index):
    """constant_score must feed its kernel from the SAME term-filtered
    postings scan the scorers use (term pushdown reaches parquet) and
    rank hits purely by doc_id — no score-ordered exchange."""
    from embed_rerank_spark.operators.wand import constant_score_topk

    out = constant_score_topk(index, [(1, "the data")], k=5, boost=3.0)
    plan = _plan(out)
    assert "PushedFilters" in plan
    assert "In(term" in plan or "in(term" in plan.lower(), plan
    rows = out.collect()
    assert rows and all(r["score"] == 3.0 for r in rows)
    ids = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert ids == sorted(ids)


def test_relational_plans_broadcast_dims_and_push_filters(spark):
    """TPC-H-shaped entries: tiny dims broadcast, the date filter
    reaches the lineitem parquet scan, and no cartesian appears."""
    from embed_rerank_spark.operators.relational import (
        nation_revenue_rank,
        pricing_summary,
        top_unshipped_orders,
    )

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    nation = spark.read.parquet(f"{sf}/nation.parquet")
    region = spark.read.parquet(f"{sf}/region.parquet")

    p1 = _plan(pricing_summary(li))
    assert "PushedFilters" in p1 and "l_shipdate" in p1
    assert "CartesianProduct" not in p1

    p2 = _plan(top_unshipped_orders(cust, orders, li))
    assert "BroadcastHashJoin" in p2 or "BroadcastExchange" in p2
    assert "CartesianProduct" not in p2

    p3 = _plan(nation_revenue_rank(cust, orders, li, nation, region))
    assert "BroadcastHashJoin" in p3 or "BroadcastExchange" in p3
    assert "CartesianProduct" not in p3
    # shares within a region sum to ~1
    rows = nation_revenue_rank(cust, orders, li, nation, region).collect()
    by_region = {}
    for r in rows:
        by_region.setdefault(r["r_name"], 0.0)
        by_region[r["r_name"]] += r["region_share"]
    assert all(abs(s - 1.0) < 1e-4 for s in by_region.values())
