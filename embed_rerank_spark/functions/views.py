"""API-dialect output views: thin column-rename/transform layers over
the engine's result DataFrames.

The reference serves four dialects of the same rerank/embed results
(native, Cohere, OpenAI, TEI) that differ only in field names and
post-processing (SURVEY.md §1.1). In a batch engine those become
zero-cost projection views — Catalyst collapses them into the parent
plan:

- Cohere: ``relevance_score`` + ``top_n`` naming
  (``app/models/cohere_models.py:17-107``)
- TEI: flat list ordered by score, ``{index, score, text?}``
  (``app/routers/tei_router.py:70-131``)
- OpenAI: optional post-hoc sigmoid on rerank scores
  (auto-sigmoid R8: ``app/routers/reranking_router.py:107-131``,
  ``app/routers/openai_router.py:628-637``)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sigmoid(col):
    """R8 post-hoc sigmoid (``reranking_router.py:118-124``)."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-col))


def cohere_rerank_view(results: DataFrame, return_documents: bool = False) -> DataFrame:
    """(index, relevance_score[, document]) per query — Cohere v2
    rerank response shape (``cohere_models.py:88-107``)."""
    cols = [
        F.col("query_id"),
        F.col("doc_id").alias("index"),
        F.col("score").alias("relevance_score"),
    ]
    if return_documents and "text" in results.columns:
        cols.append(F.struct(F.col("text").alias("text")).alias("document"))
    return results.select(*cols).orderBy("query_id", F.desc("relevance_score"))


def tei_rerank_view(results: DataFrame, return_text: bool = False) -> DataFrame:
    """(index, score[, text]) — TEI rerank shape
    (``tei_router.py:103-131``)."""
    cols = [F.col("query_id"), F.col("doc_id").alias("index"), F.col("score")]
    if return_text and "text" in results.columns:
        cols.append(F.col("text"))
    return results.select(*cols).orderBy("query_id", F.desc("score"))


def openai_rerank_view(results: DataFrame, auto_sigmoid: bool = True) -> DataFrame:
    """Native shape with the OpenAI-compat post-hoc sigmoid applied to
    scores when ``auto_sigmoid`` (config ``OPENAI_RERANK_AUTO_SIGMOID``,
    ``app/config.py:66-70``); ranking is unchanged (sigmoid is
    monotone), only the reported score transforms."""
    out = results
    if auto_sigmoid:
        out = out.withColumn("score", sigmoid(F.col("score")))
    return out


def openai_embedding_view(embedded: DataFrame) -> DataFrame:
    """(index, embedding, object='embedding') — OpenAI embeddings data
    rows (``openai_router.py:389-399``)."""
    return embedded.select(
        F.col("doc_id").alias("index"),
        "embedding",
        F.lit("embedding").alias("object"),
    )
