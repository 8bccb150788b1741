"""Shard routing via storage partition pruning (ES ``_routing``).

Elasticsearch routes a document to ``hash(routing) % n_shards`` at
index time; a query sent with the same routing value touches ONE shard
instead of fanning out to all of them — the multi-tenant / per-domain
isolation pattern. The Spark-first re-expression keys the STORAGE, not
a hash ring: the document table is written ``partitionBy(routing)``,
so a routed query's ``routing = value`` predicate becomes a partition
filter and the scan reads ONLY that tenant's directory — Catalyst's
partition pruning is the shard router, and ``df.inputFiles()`` /
``explain`` show exactly which tenant directories were touched
(pinned in tests/test_routing.py).

Semantics: each routing value is its own collection — BM25 statistics
(df, avgdl, N) are computed over the TENANT's documents only, the
strictest isolation reading (an un-routed ES query scores with
per-shard stats too, pre-DFS). Results rank with the engine tie rule
(rounded score desc, doc_id asc).

Scale shape (100 TB): the only corpus-sized work is one tokenize +
two combinable aggs over the PRUNED partitions (a 10^4-tenant corpus
routed to one tenant scans ~1/10^4 of the bytes); the query side
(queries x terms x routing) broadcasts; per-tenant stats are one
groupBy over tenant doc rows. Hot tenants skew no worse than the
un-routed scorer — the agg keys carry (routing, term), so AQE's skew
handling applies. The reference engine has no multi-tenant routing;
this is fulltext-index surface (SURVEY.md §2.6 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.udfs import tokenize_for_scoring
from .bm25 import BM25_B, BM25_K1, TIE_DECIMALS


def write_routed(docs: DataFrame, path: str, routing_col: str = "source") -> None:
    """Write the doc table in the routed layout: one directory per
    routing value (hive-style ``routing=<value>`` partitions). At
    build time this is the one shuffle that buys every routed query
    its pruning; high-cardinality routing keys should bucket instead
    (``routing % n_buckets``) to bound directory count."""
    docs.write.partitionBy(routing_col).mode("overwrite").parquet(path)


def routed_topk(
    spark: SparkSession,
    docs: DataFrame,
    routed_queries: list[tuple[int, str, str]],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    routing_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, score): per-tenant BM25 top-k.
    ``routed_queries`` rows are (query_id, routing_value, query); each
    query is answered ONLY from documents whose ``routing_col`` equals
    its routing value, scored with that tenant's own corpus stats.
    ``docs`` should be the routed-layout read (``spark.read.parquet``
    of a ``write_routed`` path) for the pruning to be physical; the
    operator is correct over any doc table."""
    if k < 1:
        raise ValueError("k must be >= 1")
    values = sorted({v for _, v, _ in routed_queries})
    if not values:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    routes = spark.createDataFrame(
        [(qid, v) for qid, v, _ in routed_queries], "query_id long, routing string"
    )
    qt = (
        spark.createDataFrame(
            [(qid, q) for qid, _, q in routed_queries],
            "query_id long, query string",
        )
        .select(
            "query_id",
            F.explode(
                F.array_distinct(tokenize_for_scoring(F.col("query")))
            ).alias("term"),
        )
        .join(routes, "query_id")
    )
    # the routing predicate: a PARTITION FILTER on the routed layout —
    # only the queried tenants' directories are scanned
    pruned = docs.filter(F.col(routing_col).isin(values)).select(
        F.col(routing_col).alias("routing"),
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    toks = pruned.select(
        "routing", "doc_id", F.explode(tokenize_for_scoring(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("routing", "doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("routing", "doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.groupBy("routing").agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = tf.groupBy("routing", "term").agg(F.count(F.lit(1)).alias("df"))
    matched = (
        F.broadcast(qt)
        .join(tf, ["routing", "term"])
        .join(dfreq, ["routing", "term"])
        .join(dl, ["routing", "doc_id"])
        .join(F.broadcast(stats), "routing")
        .withColumn(
            "term_score",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            )
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    scored = matched.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), TIE_DECIMALS)), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
