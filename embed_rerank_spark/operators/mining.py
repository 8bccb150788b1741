"""Hard-negative mining — the training-data step for embedding /
reranker models (DPR, Karpukhin et al. 2020; SentenceTransformers
MNRL recipes): for each training query, the top BM25-ranked documents
that are NOT labeled positives are the "hard" negatives — lexically
close enough to fool a weak model, which is exactly what contrastive
training needs (random negatives are trivially separable).

The reference engine is the SERVING side of an embed-then-rerank
stack (``app/services/reranking_service.py``); this operator is the
upstream pipeline that builds such a model's training pairs from the
same corpus + retriever the engine already owns.

Scale shape: one brute/WAND retrieval (the corpus-sized work that
exists anyway), a planning-sized broadcast anti-join of the positive
labels, and the per-query re-rank window over candidate-sized rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from .bm25 import TIE_DECIMALS, bm25_scores_bruteforce, query_terms


def mine_hard_negatives(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    positives: list[tuple[int, list[int]]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, neg_rank, doc_id, score): the k highest-BM25 docs
    per query that are not in the query's positive set (engine tie
    rule). Queries with no positives listed still mine (everything
    retrieved is a candidate negative)."""
    qterms = query_terms(spark, queries)
    scored = bm25_scores_bruteforce(
        docs, qterms, id_col=id_col, text_col=text_col
    )
    pos_rows = [(qid, did) for qid, ids in positives for did in ids]
    pos = spark.createDataFrame(
        pos_rows or [(None, None)], "query_id long, doc_id long"
    ).filter(F.col("query_id").isNotNull())
    negs = scored.join(F.broadcast(pos), ["query_id", "doc_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), TIE_DECIMALS)), F.asc("doc_id")
    )
    return (
        negs.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select("query_id", "neg_rank", "doc_id", "score")
    )
