"""Multi-vector / long-document retrieval over chunk embeddings.

Real corpora are longer than one encoder window, so every serving
stack built on the reference's embed endpoint (reference:
app/services/embedding_service.py — one vector per input text) ends
up with CHUNK-level vectors and needs a doc-level answer. Three
standard compositions, all pure JVM arithmetic over ``array<float>``
columns:

- ``pool_embeddings`` — collapse chunk vectors to one doc vector
  (elementwise mean or max), the "represent then retrieve" path.
  Index stays corpus-sized, quality bounded by pooling loss.
- ``maxp_topk`` — score every chunk, doc score = best chunk
  (Dai & Callan 2019, "Deeper Text Understanding for IR with
  Contextual Neural Language Modeling": BERT-MaxP). The "retrieve
  then collapse" path: index is chunk-sized, no pooling loss.
- ``max_sim_topk`` — ColBERT-style late interaction (Khattab &
  Zaharia 2020): the QUERY is multi-vector too; score(q, d) =
  sum over query vectors of the max cosine against any doc vector.

Scale shape: the query side broadcasts in all three (queries are
request-sized, never corpus-sized). Chunk vectors are scored where
they sit — the only shuffles move scalar partial scores keyed by
(query_id, doc_id), never the vectors, and both aggregations
(max per doc, sum over query positions) are combinable, so map-side
partial aggregation bounds shuffle rows by distinct keys per
partition. Pooling shuffles each doc's chunk vectors once, keyed by
doc_id — chunk counts per doc are bounded by the chunker config
(operators/packing.py::chunk_documents), so no hot key can exceed
doc_len/stride rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from embed_rerank_spark.operators.similarity import _as_double, _dot, _norm


def pool_embeddings(
    chunks: DataFrame,
    group_col: str = "doc_id",
    vec_col: str = "embedding",
    pooling: str = "mean",
) -> DataFrame:
    """(doc_id, n_chunks, embedding): one vector per doc —
    elementwise ``mean`` or ``max`` over the doc's chunk vectors.
    Both poolings are permutation-invariant, so the collect order
    inside the group doesn't matter and the agg needs no sort.

    One hash-aggregate shuffle keyed by doc_id; the folded arrays are
    (n_chunks x dim) per group, bounded by the chunker config. The
    fold itself is ``zip_with`` inside ``aggregate`` — JVM codegen,
    no Python."""
    if pooling not in ("mean", "max"):
        raise ValueError(f"unknown pooling {pooling!r}")
    g = chunks.select(
        F.col(group_col).alias("doc_id"),
        _as_double(F.col(vec_col)).alias("_v"),
    ).groupBy("doc_id").agg(
        F.collect_list("_v").alias("_vs"), F.count("*").alias("n_chunks")
    )
    vs = F.col("_vs")
    # fold tail onto head (slice start+length must not overflow int32)
    tail = F.slice(vs, F.lit(2), F.greatest(F.size(vs) - 1, F.lit(1)))
    if pooling == "mean":
        pooled = F.aggregate(
            tail,
            F.element_at(vs, 1),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
            lambda acc: F.transform(acc, lambda a: a / F.col("n_chunks")),
        )
    else:
        pooled = F.aggregate(
            tail,
            F.element_at(vs, 1),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: F.greatest(a, b)),
        )
    return g.select("doc_id", "n_chunks", pooled.alias("embedding"))


def maxp_topk(
    chunks: DataFrame,
    queries: DataFrame,
    k: int = 10,
    group_col: str = "doc_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """(query_id, rank, doc_id, cosine): doc score = max cosine over
    the doc's chunks (MaxP). Ties rank by doc_id asc on
    round(cos, 6) — same stable-tie contract as
    ``cosine_topk_bruteforce``.

    Plan: broadcast queries x chunk scan -> scalar cosine ->
    combinable max keyed (query_id, doc_id) -> per-query top-k
    window. Vectors never shuffle; the window input is
    n_queries x n_docs scalars."""
    c = chunks.select(
        F.col(group_col).alias("doc_id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("vnorm", _norm(F.col("v")))
    q = queries.select(
        F.col(qid_col).alias("query_id"),
        _as_double(F.col(qvec_col)).alias("qv"),
    ).withColumn("qnorm", _norm(F.col("qv")))
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "doc_id",
        (_dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("vnorm"))).alias("_cos"),
    )
    best = scored.groupBy("query_id", "doc_id").agg(F.max("_cos").alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cosine"), 6)), F.asc("doc_id")
    )
    return (
        best.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "cosine")
    )


def max_sim_topk(
    chunks: DataFrame,
    query_vectors: DataFrame,
    k: int = 10,
    group_col: str = "doc_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """(query_id, rank, doc_id, score): ColBERT-style late
    interaction. ``query_vectors`` carries SEVERAL rows per query_id
    (one per query-side vector); score(q, d) = sum over the query's
    vectors of the max cosine against any chunk of d. Ties rank by
    doc_id asc on round(score, 6).

    Plan: broadcast the multi-vector query table (rows =
    sum of per-query vector counts — request-sized) x chunk scan ->
    scalar cosine per (query vector, chunk) -> combinable max keyed
    (query_id, qpos, doc_id) -> combinable sum keyed
    (query_id, doc_id) -> top-k window. Two scalar-only shuffles,
    both with map-side partial agg."""
    c = chunks.select(
        F.col(group_col).alias("doc_id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("vnorm", _norm(F.col("v")))
    q = query_vectors.select(
        F.col(qid_col).alias("query_id"),
        F.monotonically_increasing_id().alias("_qpos"),
        _as_double(F.col(qvec_col)).alias("qv"),
    ).withColumn("qnorm", _norm(F.col("qv")))
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "_qpos",
        "doc_id",
        (_dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("vnorm"))).alias("_cos"),
    )
    per_qvec = scored.groupBy("query_id", "_qpos", "doc_id").agg(
        F.max("_cos").alias("_best")
    )
    total = per_qvec.groupBy("query_id", "doc_id").agg(F.sum("_best").alias("score"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id")
    )
    return (
        total.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
