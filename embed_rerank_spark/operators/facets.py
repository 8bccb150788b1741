"""Faceted search: per-query value counts over the FULL matching doc
set (Lucene/Solr facet semantics — a facet counts every document that
matches the query, not just the returned page, so the UI can render
"lang: de (1,234)" drill-down chips next to the top-k list).

Reference parity note: the reference (joonsoome/embed-rerank) serves
rerank-only requests and has no facet endpoint; faceting is part of the
fulltext query surface this engine adds around the BM25 index
(SURVEY.md §2.6 query-surface extensions).

Scale shape (100 TB):
- The matching-doc set is computed as broadcast(query terms) ⋈ the
  (doc_id, term) tf table — the same join the brute-force scorer uses;
  no new table is materialized.
- ``groupBy(query_id, doc_id)`` collapses multi-term matches BEFORE
  the facet join, so the facet-value join sees at most one row per
  (query, matching doc) — map-side combinable.
- The facet column rides in from the doc table via a doc_id join that
  Catalyst plans as a shuffle-hash/sort-merge join on doc_id; at
  10^12 docs this is the one big join, identical in shape to the
  scorer's dl join, and prunes to exactly two columns.
- ``top_n`` caps the per-query output with a window over the (tiny)
  aggregated (query, facet_value) counts, never over doc rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .bm25 import query_terms, term_freqs


def facet_counts(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    facet_col: str = "lang",
    top_n: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, facet_value, n_docs [, facet_rank]) — for each query,
    the number of DISTINCT documents matching >= 1 unique query term,
    bucketed by ``facet_col``. With ``top_n`` set, keeps the top-n
    facet values per query with engine tie semantics (count desc,
    value asc) and emits their 1-based ``facet_rank``."""
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    facets = matched.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(facet_col).alias("facet_value")),
        "doc_id",
    )
    counts = facets.groupBy("query_id", "facet_value").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    if top_n is None:
        return counts
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_docs"), F.asc("facet_value")
    )
    return (
        counts.withColumn("facet_rank", F.row_number().over(w))
        .filter(F.col("facet_rank") <= top_n)
    )


def range_facets(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    facet_col: str,
    boundaries: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, bucket, lo, n_docs): numeric range facets
    (Lucene/ES ``range`` aggregation) — per query, the count of
    distinct matching docs whose ``facet_col`` falls in each
    half-open bucket [b_i, b_{i+1}), plus the open tails
    (-inf, b_0) and [b_last, +inf). ``bucket`` is the human label
    ("[200,400)"); ``lo`` its numeric sort key (the bucket's lower
    bound, -inf tail = a value below every boundary).

    Same matching-set shape as ``facet_counts`` (broadcast query terms
    -> distinct matching docs -> doc-keyed metadata join); the
    bucketing itself is one chained ``when`` expression — codegen'd,
    no UDF, and only emitted buckets appear (count 0 rows are absent,
    Lucene semantics with ``min_doc_count=1``)."""
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    v = F.col("val")
    bs = sorted(boundaries)
    bucket = F.when(v < bs[0], F.lit(f"(-inf,{bs[0]:g})"))
    lo = F.when(v < bs[0], F.lit(float(bs[0]) - 1.0))
    for i, b in enumerate(bs):
        hi_label = f"{bs[i + 1]:g}" if i + 1 < len(bs) else "inf"
        hi_cond = v < bs[i + 1] if i + 1 < len(bs) else F.lit(True)
        lab = f"[{b:g},{hi_label})" if i + 1 < len(bs) else f"[{b:g},inf)"
        bucket = bucket.when((v >= b) & hi_cond, F.lit(lab))
        lo = lo.when((v >= b) & hi_cond, F.lit(float(b)))
    vals = docs.select(
        F.col(id_col).alias("doc_id"), F.col(facet_col).cast("double").alias("val")
    )
    return (
        matched.join(vals, "doc_id")
        .select("query_id", bucket.alias("bucket"), lo.alias("lo"))
        .groupBy("query_id", "bucket", "lo")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def stats_facets(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    cardinality_col: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, n_docs, min_v, max_v, sum_v, avg_v [, n_distinct]) —
    the Elasticsearch ``stats`` aggregation (plus an exact
    ``cardinality`` over ``cardinality_col`` when given) computed over
    each query's FULL matching doc set, same match semantics as
    ``facet_counts`` (>= 1 unique query term).

    Scale shape: identical to ``facet_counts`` — the match set
    collapses to one row per (query, doc) before the value join, then
    ONE combinable aggregation produces every stat (min/max/sum/count
    are all partial-aggregatable; avg derives from sum/count so no
    second pass). Exact distinct (cardinality) is the one
    non-combinable piece — Spark plans it as the standard two-level
    expand, still bounded by matches x 2. Output is n_queries rows."""
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    cols = [F.col(id_col).alias("doc_id"), F.col(value_col).alias("_v")]
    if cardinality_col is not None:
        cols.append(F.col(cardinality_col).alias("_c"))
    joined = matched.join(docs.select(*cols), "doc_id")
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.min("_v").alias("min_v"),
        F.max("_v").alias("max_v"),
        F.sum("_v").alias("sum_v"),
        F.avg("_v").alias("avg_v"),
    ]
    if cardinality_col is not None:
        aggs.append(F.countDistinct("_c").alias("n_distinct"))
    return joined.groupBy("query_id").agg(*aggs)
