"""Hybrid retrieval: reciprocal-rank fusion (RRF) of ranked lists.

The standard way to combine a sparse (BM25) and a dense (embedding)
retriever without score calibration — RRF (Cormack et al., SIGIR'09)
sums 1/(k0 + rank) per document across lists, so only RANKS matter
and the lists' incomparable score scales never meet. This is the
fusion behind Elasticsearch/OpenSearch hybrid search and the natural
composition point for this engine: WAND produces the sparse ranking,
cosine/LSH-ANN the dense one, Jaccard a lexical-overlap one — any
(query_id, rank, doc_id) DataFrames fuse.

No reference analogue (SURVEY.md §2.6): the reference runs embed-only
or rerank-only stages; fusion replaces its "pick one backend" switch
with rank-level combination.

Scale design: each input ranking is already tiny (n_queries x depth
rows — the retrievers did the heavy lifting), so fusion is a union +
one hash aggregation on (query_id, doc_id) + the global top-k window.
No corpus-sized data moves; the fusion cost is independent of corpus
size, which is what lets it sit in the query path at 10^12 docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bm25 import topk

RRF_K0 = 60


def rrf_fuse(
    rankings: list[DataFrame], k: int = 10, k0: int = RRF_K0
) -> DataFrame:
    """(query_id, rank, doc_id, score): fuse N ranked lists — each
    input holds (query_id, rank, doc_id) — by summed reciprocal rank
    1/(k0 + rank), re-ranked with the engine tie semantics (rounded
    score desc, doc_id asc). A doc absent from a list simply
    contributes nothing for it (the standard RRF convention)."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contribs = [
        r.select(
            "query_id",
            "doc_id",
            (F.lit(1.0) / (F.lit(float(k0)) + F.col("rank"))).alias("contrib"),
        )
        for r in rankings
    ]
    u = contribs[0]
    for c in contribs[1:]:
        u = u.unionByName(c)
    fused = u.groupBy("query_id", "doc_id").agg(F.sum("contrib").alias("score"))
    return topk(fused, k)


def linear_fuse(
    rankings: list[tuple[DataFrame, float]], k: int = 10
) -> DataFrame:
    """(query_id, rank, doc_id, score): weighted CONVEX combination of
    score-bearing ranked lists — the other standard hybrid besides RRF
    (Elasticsearch 8.18 "linear" retriever / OpenSearch hybrid
    min_max+arithmetic_mean normalization). Each input (query_id,
    doc_id, score) list is min-max normalized PER QUERY over its own
    retrieved pool (a degenerate pool where max == min normalizes to
    1.0 — every retrieved doc is equally best), then blended as
    sum(weight_i * norm_i); a doc absent from a list contributes 0
    for it. Unlike RRF this preserves score MAGNITUDE within each
    list, so a dominant-score hit stays dominant after fusion.

    Scale: inputs are n_queries x depth rows; normalization windows,
    the union and the blend agg all run over that planning-sized set —
    fusion cost independent of corpus size, same as ``rrf_fuse``."""
    if not rankings:
        raise ValueError("linear_fuse needs at least one ranking")
    from pyspark.sql import Window  # noqa: PLC0415

    wq = Window.partitionBy("query_id")
    parts = []
    for df, weight in rankings:
        nrm = (
            df.select("query_id", "doc_id", "score")
            .withColumn("mn", F.min("score").over(wq))
            .withColumn("mx", F.max("score").over(wq))
            .select(
                "query_id",
                "doc_id",
                (
                    F.lit(float(weight))
                    * F.when(
                        F.col("mx") > F.col("mn"),
                        (F.col("score") - F.col("mn"))
                        / (F.col("mx") - F.col("mn")),
                    ).otherwise(F.lit(1.0))
                ).alias("contrib"),
            )
        )
        parts.append(nrm)
    u = parts[0]
    for c in parts[1:]:
        u = u.unionByName(c)
    fused = u.groupBy("query_id", "doc_id").agg(F.sum("contrib").alias("score"))
    return topk(fused, k)
