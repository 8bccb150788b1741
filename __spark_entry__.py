"""Driver contract for the spark-graft builder (PySpark target).

Maps the engine's operator inventory (SURVEY.md §2) onto the
driver-provided parquet tables. Every SQL-expressible operator has a
DuckDB oracle; non-SQL-expressible ones (compressed-postings WAND,
deterministic pseudo-embedding rerank) are registered rows-only and
covered by exact-parity pytest suites instead.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from embed_rerank_spark.queryset import (  # noqa: E402
    QUERY_SET,
    TOP_K,
    query_terms_values_sql,
)

_TOKENIZE_SQL = "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t <> '')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k retrieval over the documents corpus at
    sf0.001 for the engine's reference query set."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


# ---------------- queries ----------------


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force Okapi BM25 top-k (oracle-grade scorer; the WAND path
    must match it exactly — see tests/test_wand.py)."""
    from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce

    out = bm25_topk_bruteforce(spark, _docs(spark, sf_dir), QUERY_SET, k=TOP_K)
    return out.select(
        "query_id", "rank", "doc_id", F.round("score", 6).alias("score")
    )


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts (dl) — the BM25 length normalizer."""
    from embed_rerank_spark.operators.bm25 import doc_lengths, term_freqs

    return doc_lengths(term_freqs(_docs(spark, sf_dir))).orderBy("doc_id")


def q_term_df_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary statistics: document frequency + Okapi idf per term."""
    from embed_rerank_spark.operators.bm25 import (
        corpus_stats,
        doc_freqs,
        doc_lengths,
        term_freqs,
    )

    tf = term_freqs(_docs(spark, sf_dir))
    df = doc_freqs(tf)
    stats = corpus_stats(doc_lengths(tf))
    return (
        df.crossJoin(F.broadcast(stats))
        .select(
            "term",
            "df",
            F.round(
                F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0), 6
            ).alias("idf"),
        )
        .orderBy("term")
    )


def q_jaccard_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-set Jaccard rerank of the whole corpus per query, top-k with
    the engine tie semantics (reference last-resort scorer,
    mlx_backend.py:687-702, as pure Spark SQL builtins)."""
    from embed_rerank_spark.functions.udfs import tokenize_for_scoring
    from embed_rerank_spark.operators.bm25 import topk

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.array_distinct(tokenize_for_scoring(F.col("text"))).alias("ptoks")
    )
    qdf = spark.createDataFrame(QUERY_SET, "query_id long, query string").select(
        "query_id", F.array_distinct(tokenize_for_scoring(F.col("query"))).alias("qtoks")
    )
    scored = F.broadcast(qdf).crossJoin(docs).select(
        "query_id",
        "doc_id",
        (
            F.size(F.array_intersect("qtoks", "ptoks"))
            / F.greatest(F.size(F.array_union("qtoks", "ptoks")), F.lit(1))
        ).alias("score"),
    )
    return topk(scored, TOP_K).select(
        "query_id", "rank", "doc_id", F.round("score", 6).alias("score")
    )


def q_wand_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-max WAND over the compressed inverted index — must equal
    the brute-force BM25 exactly, so it shares bm25_topk's oracle."""
    from pyspark.sql import functions as SF

    from embed_rerank_spark.operators.postings import InvertedIndex, build_postings
    from embed_rerank_spark.operators.wand import wand_topk

    built = build_postings(_docs(spark, sf_dir), n_shards=8)
    cs = built["corpus_stats"].collect()[0]
    index = InvertedIndex(
        postings=built["postings"],
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )
    out = wand_topk(index, QUERY_SET, k=TOP_K)
    return out.select("query_id", "rank", "doc_id", SF.round("score", 6).alias("score"))


def q_bm25_jaccard_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage pipeline, fully SQL-expressible: BM25 top-20 candidate
    pool -> word-set Jaccard rerank -> top-10 (reference fallback chain
    reranking_service.py:105-129 -> mlx_backend.py:687-702)."""
    from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce
    from embed_rerank_spark.operators.rerank import rerank_candidates

    docs = _docs(spark, sf_dir)
    cands = bm25_topk_bruteforce(spark, docs, QUERY_SET, k=20)
    out = rerank_candidates(cands, docs, QUERY_SET, top_k=TOP_K, method="jaccard")
    return out.select("query_id", "rank", "doc_id", F.round("score", 6).alias("score"))


def q_score_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score normalization operators over the Jaccard rerank scores:
    sigmoid (reference R8, reranking_router.py:107-131) and per-query
    minmax (reference R5, mlx_reranker_backend.py:358-362)."""
    from pyspark.sql import Window

    base = q_jaccard_rerank(spark, sf_dir)
    w = Window.partitionBy("query_id")
    rng = F.max("score").over(w) - F.min("score").over(w)
    return base.select(
        "query_id",
        "doc_id",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score"))), 6).alias("sigmoid"),
        F.round(
            (F.col("score") - F.min("score").over(w))
            / F.when(rng > 1e-8, rng).otherwise(F.lit(1.0)),
            6,
        ).alias("minmax"),
    )


def q_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic cross-encoder-lite rerank of the BM25 pool
    (sha256-seeded pooled pseudo-embeddings + linear head — not
    SQL-expressible; exact-parity pytest oracle in tests/test_rerank.py)."""
    from embed_rerank_spark.operators.rerank import retrieve_and_rerank

    out = retrieve_and_rerank(
        spark, _docs(spark, sf_dir), QUERY_SET, k_candidates=20, top_k=TOP_K, hidden=256
    )
    return out.select("query_id", "rank", "doc_id", F.round("score", 6).alias("score"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk": q_bm25_topk,
        "wand_topk": q_wand_topk,
        "doc_stats": q_doc_stats,
        "term_df_idf": q_term_df_idf,
        "jaccard_rerank": q_jaccard_rerank,
        "bm25_jaccard_rerank": q_bm25_jaccard_rerank,
        "score_norm": q_score_norm,
        "rerank_topk": q_rerank_topk,
    }


# ---------------- oracles ----------------

_TOKS_CTE = f"""
toks AS (
    SELECT doc_id, unnest({_TOKENIZE_SQL}) AS term
    FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
"""


def oracle_sql() -> dict[str, str]:
    qt = query_terms_values_sql()
    bm25 = f"""
WITH {_TOKS_CTE},
matched AS (
    SELECT qt.query_id, tf.doc_id,
           ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * (tf.tf * (1.2 + 1.0))
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS term_score
    FROM {qt}
    JOIN tf USING (term) JOIN df USING (term) JOIN dl USING (doc_id)
    CROSS JOIN stats
),
scored AS (
    SELECT query_id, doc_id, sum(term_score) AS score
    FROM matched GROUP BY query_id, doc_id
),
ranked AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
    FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INTEGER) AS rank,
       doc_id, round(score, 6) AS score
FROM ranked WHERE rank <= {TOP_K}
"""
    doc_stats = (
        f"WITH {_TOKS_CTE} SELECT doc_id, CAST(dl AS BIGINT) AS dl FROM dl ORDER BY doc_id"
    )
    term_df_idf = f"""
WITH {_TOKS_CTE}
SELECT term, df,
       round(ln((stats.n_docs - df + 0.5) / (df + 0.5) + 1.0), 6) AS idf
FROM df CROSS JOIN stats ORDER BY term
"""
    jaccard = f"""
WITH q AS (
    SELECT query_id, list_distinct(list_filter(
        regexp_split_to_array(trim(lower(query)), '\\s+'), t -> t <> '')) AS qtoks
    FROM {_queries_values()}
),
d AS (
    SELECT doc_id, list_distinct({_TOKENIZE_SQL}) AS ptoks FROM documents
),
scored AS (
    SELECT q.query_id, d.doc_id,
           CAST(len(list_intersect(qtoks, ptoks)) AS DOUBLE)
             / greatest(len(list_distinct(list_concat(qtoks, ptoks))), 1) AS score
    FROM q CROSS JOIN d
),
ranked AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
    FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INTEGER) AS rank,
       doc_id, round(score, 6) AS score
FROM ranked WHERE rank <= {TOP_K}
"""
    jaccard_core = f"""
q AS (
    SELECT query_id, list_distinct(list_filter(
        regexp_split_to_array(trim(lower(query)), '\\s+'), t -> t <> '')) AS qtoks
    FROM {_queries_values()}
),
d AS (
    SELECT doc_id, list_distinct({_TOKENIZE_SQL}) AS ptoks FROM documents
)
"""
    bm25_jaccard = f"""
WITH {_TOKS_CTE},
matched AS (
    SELECT qt.query_id, tf.doc_id,
           ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * (tf.tf * (1.2 + 1.0))
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS term_score
    FROM {qt}
    JOIN tf USING (term) JOIN df USING (term) JOIN dl USING (doc_id)
    CROSS JOIN stats
),
bm AS (
    SELECT query_id, doc_id, sum(term_score) AS score
    FROM matched GROUP BY query_id, doc_id
),
cand AS (
    SELECT query_id, doc_id FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id ASC) AS rnk
        FROM bm
    ) WHERE rnk <= 20
),
{jaccard_core},
jac AS (
    SELECT c.query_id, c.doc_id,
           CAST(len(list_intersect(qtoks, ptoks)) AS DOUBLE)
             / greatest(len(list_distinct(list_concat(qtoks, ptoks))), 1) AS score
    FROM cand c JOIN q USING (query_id) JOIN d USING (doc_id)
),
ranked AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
    FROM jac
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INTEGER) AS rank,
       doc_id, round(score, 6) AS score
FROM ranked WHERE rank <= {TOP_K}
"""
    score_norm = f"""
WITH {jaccard_core},
jac AS (
    SELECT q.query_id, d.doc_id,
           CAST(len(list_intersect(qtoks, ptoks)) AS DOUBLE)
             / greatest(len(list_distinct(list_concat(qtoks, ptoks))), 1) AS raw
    FROM q CROSS JOIN d
),
ranked AS (
    SELECT query_id, doc_id, round(raw, 6) AS score,
           row_number() OVER (PARTITION BY query_id ORDER BY round(raw, 6) DESC, doc_id ASC) AS rank
    FROM jac
),
top AS (SELECT query_id, doc_id, score FROM ranked WHERE rank <= {TOP_K}),
norm AS (
    SELECT query_id, doc_id,
           1.0 / (1.0 + exp(-score)) AS sigmoid_raw,
           (score - min(score) OVER (PARTITION BY query_id))
             / (CASE WHEN max(score) OVER (PARTITION BY query_id)
                        - min(score) OVER (PARTITION BY query_id) > 1e-8
                     THEN max(score) OVER (PARTITION BY query_id)
                        - min(score) OVER (PARTITION BY query_id)
                     ELSE 1.0 END) AS minmax_raw
    FROM top
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       round(sigmoid_raw, 6) AS sigmoid, round(minmax_raw, 6) AS minmax
FROM norm
"""
    return {
        "bm25_topk": bm25,
        "wand_topk": bm25,  # WAND is exact: same oracle as brute force
        "doc_stats": doc_stats,
        "term_df_idf": term_df_idf,
        "jaccard_rerank": jaccard,
        "bm25_jaccard_rerank": bm25_jaccard,
        "score_norm": score_norm,
    }


def _queries_values() -> str:
    from embed_rerank_spark.queryset import queries_values_sql

    return queries_values_sql()
