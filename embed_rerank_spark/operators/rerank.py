"""Second-stage rerank over the BM25 candidate pool.

Reproduces the reference's embed-then-rerank ordering semantics
(joonsoome/embed-rerank) as a batch Spark stage: one reference HTTP
rerank request = one (query, candidate set) group here, scored inside
``applyInPandas`` with the NumPy kernels of ``functions/scoring.py``
(Arrow-batched; no per-row Python).

Scoring methods (reference dispatch chain,
``reranking_service.py:105-129`` + backend fallbacks):

- ``cross_encoder_lite`` — pair tokenize -> pooled sha256-seeded
  pseudo-embedding -> linear head -> optional score norm
  (``mlx_reranker_backend.py:300-364``); the engine default
- ``cosine`` — deterministic per-text pseudo-embeddings + cosine
  (service fallback, ``reranking_service.py:131-162``)
- ``jaccard`` — word-set overlap (last resort,
  ``mlx_backend.py:687-702``); also available as pure Spark SQL in
  ``__spark_entry__.q_jaccard_rerank``

Engine-pinned group semantics: candidates are scored in ascending
doc_id order. The reference scores passages in request order; a batch
engine has no request order, so ascending doc_id is the engine's
canonical candidate order (it feeds the pair tokenizer's first-seen
vocab and the batch pad width — both order-sensitive by reference
semantics). Final ranking: score desc (rounded, see bm25.topk),
doc_id asc — the reference's stable-sort tie behavior.

Scale: the shuffle key is query_id; each group is one query's <= ~1k
candidates, so groups parallelize across executors and no group can
exceed task memory. The doc-text join is a shuffle join on doc_id
against the (already small) candidate set — at 10^12 docs the text
lookup hits only n_queries * k_candidates rows thanks to the
candidate-side semi-join pushdown.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import scoring
from .bm25 import topk

RERANK_SCHEMA = "query_id long, doc_id long, score double"

# Reference request caps (app/models/requests.py:92-121,173-190):
# query 1..2048 chars, <= 1000 passages per request, each passage
# non-blank and <= 4096 chars. The reference 422s the WHOLE request on
# any violation; the batch mirror quarantines the whole query's pool.
MAX_PASSAGES_PER_QUERY = 1000
MAX_PASSAGE_CHARS = 4096
MAX_QUERY_CHARS = 2048


def validate_rerank_pool(
    pool: DataFrame,
    max_passages: int = MAX_PASSAGES_PER_QUERY,
    max_passage_chars: int = MAX_PASSAGE_CHARS,
    max_query_chars: int = MAX_QUERY_CHARS,
) -> tuple[DataFrame, DataFrame]:
    """Request-cap validation of a joined candidate pool
    (query_id, doc_id, text, query) before rerank scoring.

    Returns (clean_pool, quarantine) where quarantine is
    (query_id, reason, n_rows): one row per violated cap per query —
    the batch analogue of the reference's per-request 422
    (``requests.py:92-121,173-190``). A query with ANY violation is
    quarantined whole, mirroring request-level rejection; its
    passages never reach the scorer. ``n_rows`` counts the offending
    passages (pool size for pool-level caps), surfacing the same
    information the reference's error message carries.

    Plan shape matters here: ``clean`` is ONE windowed pass over the
    pool plus a filter — no join back against an aggregated branch,
    which would re-evaluate the (possibly expensive: a WAND run)
    candidate subtree once per branch. The window's query_id hash
    clustering is what the downstream rerank groupBy needs anyway.
    ``quarantine`` is a separate lazy branch evaluated only when the
    caller consumes the metrics."""
    from pyspark.sql import Window  # noqa: PLC0415

    empty_p = (F.col("text").isNull() | (F.length(F.trim("text")) == 0)).cast("int")
    long_p = (F.length("text") > max_passage_chars).cast("int")
    w = Window.partitionBy("query_id")
    flagged = (
        pool.withColumn("_n_pass", F.count(F.lit(1)).over(w))
        .withColumn("_n_empty", F.sum(empty_p).over(w))
        .withColumn("_n_long", F.sum(long_p).over(w))
    )
    ok = (
        (F.length(F.trim("query")) > 0)
        & (F.length("query") <= max_query_chars)
        & (F.col("_n_pass") <= max_passages)
        & (F.col("_n_empty") == 0)
        & (F.col("_n_long") == 0)
    )
    clean = flagged.filter(ok).drop("_n_pass", "_n_empty", "_n_long")

    per_query = pool.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.first("query").alias("query"),
        F.sum(empty_p).alias("n_empty_passage"),
        F.sum(long_p).alias("n_passage_too_long"),
    )

    def reason(cond, name, n_col):
        return per_query.filter(cond).select(
            "query_id", F.lit(name).alias("reason"), n_col.cast("int").alias("n_rows")
        )

    quarantine = (
        reason(F.length(F.trim("query")) == 0, "empty_query", F.lit(1))
        .unionByName(
            reason(
                (F.length(F.trim("query")) > 0) & (F.length("query") > max_query_chars),
                "query_too_long",
                F.lit(1),
            )
        )
        .unionByName(
            reason(F.col("n_passages") > max_passages, "pool_too_large", F.col("n_passages"))
        )
        .unionByName(
            reason(F.col("n_empty_passage") > 0, "empty_passage", F.col("n_empty_passage"))
        )
        .unionByName(
            reason(
                F.col("n_passage_too_long") > 0,
                "passage_too_long",
                F.col("n_passage_too_long"),
            )
        )
    )
    return clean, quarantine


def _candidate_pool(
    candidates: DataFrame,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    enforce_limits: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Join the (query_id, doc_id) candidate set with doc text and
    query text -> (pool, quarantine). Shared by the scoring path and
    the pooled-vector materializer so both see the exact same groups."""
    spark = candidates.sparkSession
    qdf = spark.createDataFrame(queries, "query_id long, query string")
    pool = (
        candidates.select("query_id", "doc_id")
        .join(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")), "doc_id")
        .join(F.broadcast(qdf), "query_id")
    )
    if enforce_limits:
        return validate_rerank_pool(pool)
    return pool, spark.createDataFrame([], "query_id long, reason string, n_rows int")


def rerank_pooled_vectors(
    candidates: DataFrame,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    hidden: int = scoring.DEFAULT_HIDDEN,
    pooling: str = "mean",
    max_length: int = scoring.DEFAULT_MAX_LENGTH,
    id_col: str = "doc_id",
    text_col: str = "text",
    enforce_limits: bool = True,
) -> DataFrame:
    """(query_id, doc_id, pooled: array<double>) — the deterministic
    pooled pseudo-embedding of every (query, candidate) pair, computed
    in the SAME per-query groups (same ascending-doc_id order, same
    batch-scoped pair vocab and pad width) the cross_encoder_lite
    scorer uses. Exists so an external SQL oracle can re-derive the
    rerank scores as ``pooled @ w`` and value-check the rerank path
    end-to-end; values are f32 semantics widened to f64 on output so
    the oracle's f64 dot product matches ``scoring.head_scores``."""
    pool, _ = _candidate_pool(candidates, docs, queries, id_col, text_col, enforce_limits)

    def pool_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pooled = scoring.group_pooled(
            pdf["query"].iloc[0], pdf["text"].fillna("").tolist(),
            hidden, pooling, max_length,
        )
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"],
                "doc_id": pdf["doc_id"],
                "pooled": [row.astype("float64") for row in pooled],
            }
        )

    n_parts = pool.sparkSession.sparkContext.defaultParallelism
    return (
        pool.repartition(n_parts, "query_id")
        .groupBy("query_id")
        .applyInPandas(pool_group, "query_id long, doc_id long, pooled array<double>")
    )


def rerank_candidates(
    candidates: DataFrame,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    top_k: int = 10,
    method: str = "cross_encoder_lite",
    model_name: str = "embed-rerank-spark",
    hidden: int = scoring.DEFAULT_HIDDEN,
    pooling: str = "mean",
    score_norm: str = "none",
    max_length: int = scoring.DEFAULT_MAX_LENGTH,
    id_col: str = "doc_id",
    text_col: str = "text",
    enforce_limits: bool = True,
) -> DataFrame:
    """(query_id, rank, doc_id, score): rerank ``candidates``
    (query_id, doc_id) with the chosen deterministic scorer.
    ``enforce_limits`` applies the reference request caps
    (``validate_rerank_pool``); use ``rerank_candidates_with_metrics``
    to also get the quarantine counts."""
    out, _ = rerank_candidates_with_metrics(
        candidates, docs, queries, top_k, method, model_name, hidden,
        pooling, score_norm, max_length, id_col, text_col, enforce_limits,
    )
    return out


def rerank_candidates_with_metrics(
    candidates: DataFrame,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    top_k: int = 10,
    method: str = "cross_encoder_lite",
    model_name: str = "embed-rerank-spark",
    hidden: int = scoring.DEFAULT_HIDDEN,
    pooling: str = "mean",
    score_norm: str = "none",
    max_length: int = scoring.DEFAULT_MAX_LENGTH,
    id_col: str = "doc_id",
    text_col: str = "text",
    enforce_limits: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Like ``rerank_candidates`` but also returns the quarantine
    DataFrame (query_id, reason, n_rows) from the request-cap
    validation stage — the rerank metrics surface."""
    spark = candidates.sparkSession
    # S2: the deterministic scoring head is computed once on the driver
    # and BROADCAST to executors (reference loads weights once at
    # startup; re-deriving per group would repeat the sha256+rng work)
    head_bc = (
        spark.sparkContext.broadcast(scoring.linear_head(model_name, hidden))
        if method == "cross_encoder_lite"
        else None
    )
    pool, quarantine = _candidate_pool(
        candidates, docs, queries, id_col, text_col, enforce_limits
    )

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        query = pdf["query"].iloc[0]
        passages = pdf["text"].fillna("").tolist()
        if method == "cross_encoder_lite":
            s = scoring.rerank_group(
                query, passages, model_name, hidden, pooling, score_norm,
                max_length, head=head_bc.value,
            )
        elif method == "cosine":
            qv = scoring.text_pseudo_embeddings([query], hidden)[0]
            pv = scoring.text_pseudo_embeddings(passages, hidden)
            s = scoring.cosine_scores(qv, pv)
            s = scoring.normalize_scores(s, score_norm)
        elif method == "jaccard":
            s = scoring.normalize_scores(
                pd.Series(scoring.jaccard_scores(query, passages)).to_numpy(), score_norm
            )
        else:
            raise ValueError(f"unknown rerank method: {method}")
        return pd.DataFrame(
            {"query_id": pdf["query_id"], "doc_id": pdf["doc_id"], "score": s}
        )

    # explicit pre-partition by the group key: the pool is small in
    # BYTES, so AQE would coalesce the groupBy shuffle to a couple of
    # partitions and serialize the per-group scoring (the expensive
    # part) onto as few cores; a sized HashPartitioning(query_id)
    # already satisfies applyInPandas' clustering, so no second
    # exchange is added
    n_parts = spark.sparkContext.defaultParallelism
    pool = pool.repartition(n_parts, "query_id")
    scored = pool.groupBy("query_id").applyInPandas(score_group, RERANK_SCHEMA)
    out = topk(scored, top_k).select("query_id", "rank", "doc_id", "score")
    return out, quarantine


def retrieve_and_rerank(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k_candidates: int = 100,
    top_k: int = 10,
    index=None,
    **rerank_kwargs,
) -> DataFrame:
    """Full two-stage pipeline: BM25 first stage (WAND over a prebuilt
    index when given, else the brute-force scorer) -> deterministic
    rerank of the candidate pool."""
    if index is not None:
        from .wand import wand_topk

        cands = wand_topk(index, queries, k=k_candidates)
    else:
        from .bm25 import bm25_topk_bruteforce

        cands = bm25_topk_bruteforce(spark, docs, queries, k=k_candidates)
    return rerank_candidates(cands, docs, queries, top_k=top_k, **rerank_kwargs)
