"""Retrieval quality metrics: MRR@k and nDCG@k as DataFrame plans.

The reference ships a quality harness computing MRR@k / nDCG@k over a
judgment set (``tools/tests/quality-rerank-only.py:23-39``); here the
same metrics are pure ``pyspark.sql`` window/aggregation plans over
(ranking, judgments) tables — they run at any scale and are
SQL-expressible for the DuckDB oracle.

Inputs:
- ``ranking``: (query_id, rank, doc_id) with rank starting at 1
- ``judgments``: (query_id, doc_id, rel) graded relevance (rel > 0 =
  relevant for MRR; graded for nDCG gains ``2^rel - 1``)

Per-query metrics join then aggregate; queries with NO relevant docs
score 0 (reference behavior: empty judgment -> 0 contribution).

Query universe: by default the universe is the DISTINCT query_ids of
``ranking`` — a query that retrieved ZERO rows is then absent from the
output and mean recall/MAP over the returned rows are inflated. Pass
``queries`` (any DataFrame with a query_id column) to score such
queries as explicit 0 rows in every metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _query_universe(ranking: DataFrame, queries: DataFrame | None) -> DataFrame:
    """The query set metrics aggregate over: the explicit ``queries``
    universe when given (so a query that retrieved nothing scores 0
    instead of silently dropping out), else the ranking's own ids."""
    src = queries if queries is not None else ranking
    return src.select("query_id").distinct()


def mrr_at_k(
    ranking: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    queries: DataFrame | None = None,
) -> DataFrame:
    """(query_id, rr): reciprocal rank of the FIRST relevant doc within
    the top-k, 0 when none."""
    hits = (
        ranking.filter(F.col("rank") <= k)
        .join(judgments.filter(F.col("rel") > 0), ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg((F.lit(1.0) / F.min("rank")).alias("rr"))
    )
    all_q = _query_universe(ranking, queries)
    return all_q.join(hits, "query_id", "left").select(
        "query_id", F.coalesce("rr", F.lit(0.0)).alias("rr")
    )


def ndcg_at_k(
    ranking: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    queries: DataFrame | None = None,
) -> DataFrame:
    """(query_id, ndcg): DCG with gains ``2^rel - 1`` and log2(rank+1)
    discounts, normalized by the ideal DCG over that query's judgments
    (reference ``quality-rerank-only.py:31-39`` semantics)."""
    gains = (
        ranking.filter(F.col("rank") <= k)
        .join(judgments, ["query_id", "doc_id"], "left")
        .withColumn("rel", F.coalesce("rel", F.lit(0)))
        .withColumn(
            "gain",
            (F.pow(F.lit(2.0), F.col("rel")) - 1.0) / F.log2(F.col("rank") + 1.0),
        )
    )
    dcg = gains.groupBy("query_id").agg(F.sum("gain").alias("dcg"))

    ideal_rank = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    idcg = (
        judgments.filter(F.col("rel") > 0)
        .withColumn("irank", F.row_number().over(ideal_rank))
        .filter(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0) / F.log2(F.col("irank") + 1.0)
            ).alias("idcg")
        )
    )
    all_q = _query_universe(ranking, queries)
    return (
        all_q.join(dcg, "query_id", "left")
        .join(idcg, "query_id", "left")
        .select(
            "query_id",
            F.when(
                F.coalesce("idcg", F.lit(0.0)) > 0.0,
                F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
        )
    )


def recall_at_k(
    ranking: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    queries: DataFrame | None = None,
) -> DataFrame:
    """(query_id, recall): fraction of ALL relevant docs retrieved in
    the top-k (TREC recall@k: denominator = total relevant, not k).
    Queries with no relevant docs score 0."""
    rel = judgments.filter(F.col("rel") > 0)
    n_rel = rel.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    n_hit = (
        ranking.filter(F.col("rank") <= k)
        .join(rel, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    all_q = _query_universe(ranking, queries)
    return (
        all_q.join(n_rel, "query_id", "left")
        .join(n_hit, "query_id", "left")
        .select(
            "query_id",
            F.when(
                F.coalesce("n_rel", F.lit(0)) > 0,
                F.coalesce("n_hit", F.lit(0)) / F.col("n_rel"),
            )
            .otherwise(F.lit(0.0))
            .alias("recall"),
        )
    )


def ap_at_k(
    ranking: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    queries: DataFrame | None = None,
) -> DataFrame:
    """(query_id, ap): average precision at k — mean of precision@i
    over the relevant hits' ranks i, normalized by min(R, k) with R =
    total relevant (TREC AP@k). Queries with no relevant docs score 0."""
    rel = judgments.filter(F.col("rel") > 0)
    n_rel = rel.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    w = Window.partitionBy("query_id").orderBy("rank")
    hits = (
        ranking.filter(F.col("rank") <= k)
        .join(rel.select("query_id", "doc_id"), ["query_id", "doc_id"])
        .withColumn("hit_no", F.row_number().over(w))
        .groupBy("query_id")
        .agg(F.sum(F.col("hit_no") / F.col("rank")).alias("sum_prec"))
    )
    all_q = _query_universe(ranking, queries)
    return (
        all_q.join(n_rel, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.when(
                F.coalesce("n_rel", F.lit(0)) > 0,
                F.coalesce("sum_prec", F.lit(0.0))
                / F.least(F.col("n_rel"), F.lit(k)),
            )
            .otherwise(F.lit(0.0))
            .alias("ap"),
        )
    )


def quality_summary(
    ranking: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Per-query (query_id, rr, ndcg, recall, ap) — the reference
    harness's headline numbers are the means of these columns; MAP@k =
    mean of ``ap``. Pass ``queries`` so zero-retrieval queries appear
    as 0 rows (see module docstring)."""
    return (
        mrr_at_k(ranking, judgments, k, queries)
        .join(ndcg_at_k(ranking, judgments, k, queries), "query_id")
        .join(recall_at_k(ranking, judgments, k, queries), "query_id")
        .join(ap_at_k(ranking, judgments, k, queries), "query_id")
    )


def precision_at_k(
    ranking: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    queries: DataFrame | None = None,
) -> DataFrame:
    """(query_id, precision): the ES rank_eval ``precision`` metric —
    fraction of the RETRIEVED top-k that is relevant (denominator =
    docs actually retrieved within k, the ES default, not k itself).
    Queries that retrieved nothing score 0."""
    per = (
        ranking.filter(F.col("rank") <= k)
        .join(judgments, ["query_id", "doc_id"], "left")
        .groupBy("query_id")
        .agg(
            (
                F.sum(F.when(F.coalesce("rel", F.lit(0)) > 0, 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("precision")
        )
    )
    all_q = _query_universe(ranking, queries)
    return all_q.join(per, "query_id", "left").select(
        "query_id", F.coalesce("precision", F.lit(0.0)).alias("precision")
    )


def err_at_k(
    ranking: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    max_rel: int = 3,
    queries: DataFrame | None = None,
) -> DataFrame:
    """(query_id, err): Expected Reciprocal Rank (Chapelle et al.
    2009; the ES rank_eval ``expected_reciprocal_rank`` metric with
    ``maximum_relevance = max_rel``): ERR = sum_r (p_r / r) *
    prod_{i<r} (1 - p_i) with stop probability p = (2^rel - 1) /
    2^max_rel, unjudged docs rel 0. The cascade product runs as a
    windowed F.product over the preceding ranks — no log/exp rewrite,
    so a p=1 document correctly zeroes everything below it."""
    p = (F.pow(F.lit(2.0), F.least(F.col("rel"), F.lit(max_rel))) - 1.0) / F.lit(
        float(2**max_rel)
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = (
        ranking.filter(F.col("rank") <= k)
        .join(judgments, ["query_id", "doc_id"], "left")
        .withColumn("rel", F.coalesce("rel", F.lit(0)))
        .withColumn("p", p)
        .withColumn("keep", F.coalesce(F.product(1.0 - F.col("p")).over(w), F.lit(1.0)))
        .groupBy("query_id")
        .agg(F.sum(F.col("p") / F.col("rank") * F.col("keep")).alias("err"))
    )
    all_q = _query_universe(ranking, queries)
    return all_q.join(contrib, "query_id", "left").select(
        "query_id", F.coalesce("err", F.lit(0.0)).alias("err")
    )


def rank_eval(
    ranking: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    max_rel: int = 3,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Per-query (query_id, precision, recall, rr, ap, ndcg, err) —
    the ES _rank_eval API response shape (``details`` per query; the
    API's summary value is the mean of a column). One row per query
    in the universe; all six metrics share the same top-k window."""
    return (
        precision_at_k(ranking, judgments, k, queries)
        .join(recall_at_k(ranking, judgments, k, queries), "query_id")
        .join(mrr_at_k(ranking, judgments, k, queries), "query_id")
        .join(ap_at_k(ranking, judgments, k, queries), "query_id")
        .join(ndcg_at_k(ranking, judgments, k, queries), "query_id")
        .join(err_at_k(ranking, judgments, k, max_rel, queries), "query_id")
    )
