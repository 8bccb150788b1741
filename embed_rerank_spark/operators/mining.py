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

from ..functions.udfs import tokenize_for_scoring
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


def association_rules(
    docs: DataFrame,
    min_support: int = 5,
    min_confidence: float = 0.5,
    max_term_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Market-basket association rules over per-document DISTINCT term
    sets (ES ``frequent_item_sets`` aggregation analogue, pair-sized
    itemsets): for every DIRECTED pair (antecedent -> consequent) with
    ``pair_count >= min_support`` and ``confidence >= min_confidence``,
    emit ``(antecedent, consequent, pair_count, support, confidence,
    lift)`` where support = pair_count / n_docs, confidence =
    pair_count / df(antecedent), lift = confidence / (df(consequent) /
    n_docs). Unlike ``cooccurrence_pmi`` (symmetric, information-
    theoretic), rules are DIRECTIONAL — "docs mentioning 'cookie'
    almost always mention 'privacy', not vice versa" — the shape
    curation loops use for template/boilerplate discovery and query
    suggestion ("people also searched").

    Reference parity: none (serving loop); pipeline extension.

    Scale shape (100 TB): same two caps as the PMI operator bound the
    quadratic pair hazard — ``max_term_df`` drops corpus-hot terms
    before pairing (hot terms are stopwords, no rule signal),
    ``min_support`` prunes after one map-side-combinable count. The
    per-doc self-join co-partitions on doc_id; df tables broadcast.
    """
    terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokenize_for_scoring(F.col(text_col)))).alias(
            "term"
        ),
    )
    n_docs = docs.select(id_col).distinct().count()
    df_tbl = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_term_df is not None:
        df_tbl = df_tbl.filter(F.col("df") <= max_term_df)
        terms = terms.join(F.broadcast(df_tbl.select("term")), "term")
    a = terms.select("doc_id", F.col("term").alias("antecedent"))
    b = terms.select("doc_id", F.col("term").alias("consequent"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_support)
    )
    dfa = df_tbl.select(F.col("term").alias("antecedent"), F.col("df").alias("df_a"))
    dfc = df_tbl.select(F.col("term").alias("consequent"), F.col("df").alias("df_c"))
    conf = F.col("pair_count") / F.col("df_a")
    return (
        pairs.join(F.broadcast(dfa), "antecedent")
        .join(F.broadcast(dfc), "consequent")
        .filter(conf >= min_confidence)
        .select(
            "antecedent",
            "consequent",
            "pair_count",
            F.round(F.col("pair_count") / F.lit(float(n_docs)), 6).alias("support"),
            F.round(conf, 6).alias("confidence"),
            F.round(
                conf / (F.col("df_c") / F.lit(float(n_docs))), 6
            ).alias("lift"),
        )
    )
