"""Learning-to-rank feature extraction — the feature-logging surface
of a search engine (the Elasticsearch LTR plugin's ``_ltr`` logging,
Lucene's FeatureField): for each (query, candidate) pair, emit the
model-training feature vector so a ranker (LambdaMART, a
cross-encoder distillation target) can be trained offline on the
engine's own signals.

Features per (query_id, doc_id), all already computed by existing
operator pipelines and joined here into one row:

- ``bm25``: full Okapi score (the first-stage ranker),
- ``matched_terms``: distinct query terms present,
- ``query_coverage``: matched_terms / |unique query terms|,
- ``sum_tf``: total query-term occurrences in the doc,
- ``dl``: doc length in scoring tokens,
- ``min_df`` / ``max_idf``: rarity of the doc's rarest matched term.

Scale shape: the feature table is candidate-sized (top-``k_candidates``
per query via the usual rank window), every feature rides the SAME
single matched-terms aggregation the BM25 scorer already does (one
groupBy computes all of them — no second corpus pass), and the query
side broadcasts. Label joins (clicks, judgments) are the caller's
one extra keyed join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bm25 import (
    BM25_B,
    BM25_K1,
    corpus_stats,
    doc_freqs,
    doc_lengths_direct,
    query_terms,
    term_freqs_dl,
    topk,
)


def ltr_features(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k_candidates: int = 100,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, bm25, matched_terms, query_coverage,
    sum_tf, dl, min_df, max_idf) for the top-``k_candidates`` BM25
    candidates per query."""
    qt = query_terms(spark, queries)
    n_qterms = (
        qt.groupBy("query_id").agg(F.count("*").alias("n_qterms"))
    )
    tfdl = term_freqs_dl(docs, id_col, text_col)
    dl = doc_lengths_direct(docs, id_col, text_col)
    stats = corpus_stats(dl)
    df = doc_freqs(tfdl)
    idf = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .select("term", "df", "idf", "avgdl")
    )
    matched = (
        F.broadcast(qt)
        .join(tfdl, "term")
        .join(idf, "term")
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    feats = matched.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").alias("bm25"),
        F.count(F.lit(1)).alias("matched_terms"),
        F.sum("tf").alias("sum_tf"),
        F.first("dl").alias("dl"),
        F.min("df").alias("min_df"),
        F.max("idf").alias("max_idf"),
    )
    ranked = topk(feats, k_candidates, score_col="bm25")
    return ranked.join(F.broadcast(n_qterms), "query_id").select(
        "query_id",
        "rank",
        "doc_id",
        "bm25",
        "matched_terms",
        (F.col("matched_terms") / F.col("n_qterms")).alias("query_coverage"),
        "sum_tf",
        "dl",
        "min_df",
        "max_idf",
    )
