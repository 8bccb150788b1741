"""Parent-child retrieval — the Elasticsearch ``has_child`` /
``nested`` query family (join fields, nested docs) over a
(parent_id, child_id, text) child table.

ES models sub-documents (chunks, reviews, comments) as separate
Lucene docs with their own norms, then joins at query time:
``has_child`` returns PARENTS ranked by an aggregate
(``score_mode`` = max | sum | avg | min) of their matching
children's scores, optionally gated by ``min_children`` /
``max_children``; ``has_parent`` returns CHILDREN carrying their
parent's score. The reference engine has no sub-document model
(its unit is the passage, ``app/models.py``), but every RAG corpus
this engine indexes is chunked (``packing.chunk_documents``), and
"which DOCUMENT answers this query, judged by its best chunk" is
the canonical retrieval shape over chunked corpora.

Pinned semantics (Lucene ToParentBlockJoinQuery / HasChildQuery):

- a child matches iff it shares >= 1 query term (BM25 score > 0
  computed over the CHILD corpus statistics — child df/dl/avgdl,
  exactly Lucene's separate-doc norms);
- parent score = score_mode-aggregate over its MATCHING children
  only; parents qualify iff their matching-child count lies in
  [min_children, max_children];
- ranking uses the engine tie rule (rounded score desc, parent_id
  asc).

Scale shape (100 TB): the child scorer is the declarative brute
pipeline (two combinable hash aggs + broadcast query side); the
child->parent hop is ONE keyed join from the score agg's output to
the (child_id, parent_id) projection of the same table, followed by
one combinable (query, parent) agg — no self-joins, nothing
driver-sized but the query set. Child tables co-partitioned/bucketed
by parent_id make the hop shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bm25 import (
    BM25_B,
    BM25_K1,
    bm25_scores_bruteforce,
    query_terms,
    topk,
)

SCORE_MODES = ("max", "sum", "avg", "min")


def has_child_topk(
    spark: SparkSession,
    children: DataFrame,
    queries: list[tuple[int, str]],
    score_mode: str = "max",
    k: int = 10,
    min_children: int = 1,
    max_children: int | None = None,
    inner_hits: int | None = None,
    k1: float = BM25_K1,
    b: float = BM25_B,
    parent_col: str = "parent_id",
    id_col: str = "child_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, parent_id, score, n_matching[, hits]): top-k
    parents per query under ``score_mode`` over matching-child BM25
    scores. ``inner_hits=m`` appends each parent's top-m matching
    children as an ordered array of (child_id, score) structs — the
    ES ``inner_hits`` response block ("which chunk matched"). The
    per-(query, parent) child window runs over candidate-sized rows
    and the hit arrays are built only for surviving parents (semi-join
    on the ranked output)."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    if min_children < 1:
        raise ValueError("min_children must be >= 1")
    qterms = query_terms(spark, queries)
    child_scores = bm25_scores_bruteforce(
        children, qterms, k1=k1, b=b, id_col=id_col, text_col=text_col
    )
    link = children.select(
        F.col(id_col).alias("doc_id"), F.col(parent_col).alias("parent_id")
    )
    agg = {
        "max": F.max("score"),
        "sum": F.sum("score"),
        "avg": F.avg("score"),
        "min": F.min("score"),
    }[score_mode]
    linked = child_scores.join(link, "doc_id")
    per_parent = (
        linked.groupBy("query_id", "parent_id")
        .agg(agg.alias("score"), F.count("*").alias("n_matching"))
        .filter(F.col("n_matching") >= min_children)
    )
    if max_children is not None:
        per_parent = per_parent.filter(F.col("n_matching") <= max_children)
    ranked = topk(
        per_parent.withColumnRenamed("parent_id", "doc_id"), k
    ).withColumnRenamed("doc_id", "parent_id")
    out = ranked.select("query_id", "rank", "parent_id", "score", "n_matching")
    if inner_hits is None:
        return out
    from pyspark.sql import Window  # noqa: PLC0415

    survivors = out.select("query_id", "parent_id")
    cw = Window.partitionBy("query_id", "parent_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id")
    )
    hits = (
        linked.join(survivors, ["query_id", "parent_id"], "left_semi")
        .withColumn("_cr", F.row_number().over(cw))
        .filter(F.col("_cr") <= inner_hits)
        .groupBy("query_id", "parent_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_cr", F.col("doc_id").alias("child_id"), "score"))
            ).alias("_h")
        )
        .select(
            "query_id",
            "parent_id",
            F.transform(
                F.col("_h"), lambda h: F.struct(h.child_id.alias("child_id"), h.score.alias("score"))
            ).alias("hits"),
        )
    )
    return out.join(hits, ["query_id", "parent_id"]).select(
        "query_id", "rank", "parent_id", "score", "n_matching", "hits"
    )


def has_parent_topk(
    spark: SparkSession,
    parents: DataFrame,
    children: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    parent_id_col: str = "doc_id",
    parent_text_col: str = "text",
    child_parent_col: str = "parent_id",
    child_id_col: str = "child_id",
) -> DataFrame:
    """(query_id, rank, child_id, score): top-k CHILDREN per query,
    each scored by its parent's BM25 match (the ES ``has_parent``
    query: "find chunks whose document matches") — ties broken by
    child_id asc. One parent-score pipeline + one keyed join fanning
    the parent score out to its children."""
    qterms = query_terms(spark, queries)
    parent_scores = bm25_scores_bruteforce(
        parents, qterms, k1=k1, b=b, id_col=parent_id_col, text_col=parent_text_col
    ).withColumnRenamed("doc_id", "_parent")
    fanned = parent_scores.join(
        children.select(
            F.col(child_parent_col).alias("_parent"),
            F.col(child_id_col).alias("doc_id"),
        ),
        "_parent",
    )
    return (
        topk(fanned.select("query_id", "doc_id", "score"), k)
        .withColumnRenamed("doc_id", "child_id")
        .select("query_id", "rank", "child_id", "score")
    )
