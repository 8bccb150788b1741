"""More-like-this (query-by-document): select the most informative
terms of a seed document, run them as a disjunctive BM25 query, return
the top-k most similar OTHER documents.

Semantics follow Lucene's MoreLikeThis query builder (public Lucene
API: max_query_terms / min_term_freq / min_doc_freq knobs; reference
repo has none of this — it is part of the fulltext query surface this
engine adds, SURVEY.md §2.6 query-surface extensions):

- candidate terms = terms of the seed doc with tf >= min_term_freq and
  corpus df >= min_doc_freq;
- term interestingness = tf * idf with the engine's pinned idf
  ``ln((N - df + 0.5)/(df + 0.5) + 1)``, ROUNDED to 6 decimals so the
  selection order is reproducible across engines (DuckDB oracle);
- keep the ``max_query_terms`` best terms (score desc, term asc);
- retrieval = the engine's standard disjunctive BM25 over those terms
  (block-max WAND on the compressed index), with the seed doc itself
  excluded from results.

Scale shape (100 TB): term selection is a broadcast(seed ids) semi-join
into the tf table + one window over the seeds' own term rows (bounded:
n_seeds x doc length) — never a corpus shuffle. The selected term
lists (n_seeds x max_query_terms strings) collect to the driver and
feed the WAND query plan exactly like user queries; seed exclusion
takes top-(k+1) and drops the seed row, which is exactly top-k over
the corpus minus the seed (each doc id appears at most once per
query, so at most one row is dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .bm25 import TIE_DECIMALS, corpus_stats, doc_freqs, doc_lengths_direct, term_freqs_dl


def mlt_select_terms(
    docs: DataFrame,
    seed_doc_ids: list[int],
    max_query_terms: int = 25,
    min_term_freq: int = 1,
    min_doc_freq: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[int, list[str]]:
    """seed doc_id -> its selected MLT terms (interestingness order:
    round(tf*idf, 6) desc, term asc). Seeds with no qualifying terms
    map to an empty list."""
    spark = docs.sparkSession
    seeds = spark.createDataFrame(
        [(int(d),) for d in seed_doc_ids], "seed_id long"
    )
    tfdl = term_freqs_dl(docs, id_col, text_col)
    stats = corpus_stats(doc_lengths_direct(docs, id_col, text_col))
    df = doc_freqs(tfdl)
    seed_terms = (
        F.broadcast(seeds)
        .join(tfdl, F.col("seed_id") == F.col("doc_id"))
        .filter(F.col("tf") >= min_term_freq)
        .join(df, "term")
        .filter(F.col("df") >= min_doc_freq)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "interest",
            F.round(
                F.col("tf")
                * F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
                ),
                TIE_DECIMALS,
            ),
        )
    )
    w = Window.partitionBy("seed_id").orderBy(F.desc("interest"), F.asc("term"))
    picked = (
        seed_terms.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= max_query_terms)
        .select("seed_id", "term", "term_rank")
        .collect()
    )
    out: dict[int, list[str]] = {int(d): [] for d in seed_doc_ids}
    for r in sorted(picked, key=lambda r: (r["seed_id"], r["term_rank"])):
        out[r["seed_id"]].append(r["term"])
    return out


def more_like_this(
    index,
    docs: DataFrame,
    seed_doc_ids: list[int],
    k: int = 10,
    max_query_terms: int = 25,
    min_term_freq: int = 1,
    min_doc_freq: int = 1,
) -> DataFrame:
    """(query_id=seed doc_id, rank, doc_id, score): top-k docs most
    similar to each seed under MLT term selection + BM25, seed doc
    excluded. Seeds whose selection is empty return no rows."""
    from .wand import wand_topk

    selected = mlt_select_terms(
        docs, seed_doc_ids, max_query_terms, min_term_freq, min_doc_freq
    )
    queries = [(sid, " ".join(terms)) for sid, terms in selected.items() if terms]
    if not queries:
        spark = docs.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    got = wand_topk(index, queries, k=k + 1)
    kept = got.filter(F.col("query_id") != F.col("doc_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), TIE_DECIMALS)), F.asc("doc_id")
    )
    return (
        kept.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def significant_terms(
    spark,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    window: int = 100,
    top_n: int = 10,
    min_fg_df: int = 2,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(query_id, term, fg_df, bg_df, score): the Elasticsearch
    ``significant_terms``-over-a-``sampler`` aggregation — terms
    over-represented in each query's best-matching documents relative
    to the whole corpus, scored with the JLH heuristic (ES default):

        score = (fg_frac - bg_frac) * (fg_frac / bg_frac)

    where fg_frac = fg_df / |foreground| over the query's top
    ``window`` BM25 hits (the ES-recommended sampler bound — an
    unbounded foreground over a hot term IS the corpus) and
    bg_frac = bg_df / N over all docs. The query's own terms are
    excluded (they trivially saturate the foreground); terms must
    appear in >= ``min_fg_df`` foreground docs and be foreground-
    enriched (fg_frac > bg_frac). Ranking: round(score, 6) desc,
    term asc, top_n per query.

    Scale shape: the foreground set is n_queries x window rows — it
    broadcasts into the per-doc term scan, so the only corpus-sized
    work is the tf/df aggregation the retrieval stage already does;
    the significance agg itself groups (query_id, term) over
    foreground-matched rows only."""
    from .bm25 import bm25_scores_bruteforce, query_terms, topk

    qterms = query_terms(spark, queries)
    scored = bm25_scores_bruteforce(docs, qterms, k1, b)
    fg = topk(scored, window).select("query_id", "doc_id")

    tfdl = term_freqs_dl(docs)
    bg_df = doc_freqs(tfdl)
    n_docs = corpus_stats(doc_lengths_direct(docs)).select("n_docs")

    fg_sizes = fg.groupBy("query_id").agg(F.count("*").alias("fg_size"))
    fg_term_df = (
        F.broadcast(fg)
        .join(tfdl.select("doc_id", "term"), "doc_id")
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("fg_df"))
    )
    enriched = (
        fg_term_df.join(F.broadcast(fg_sizes), "query_id")
        .join(bg_df, "term")
        .crossJoin(F.broadcast(n_docs))
        .join(qterms.withColumn("is_query_term", F.lit(1)), ["query_id", "term"], "left_anti")
        .filter(F.col("fg_df") >= min_fg_df)
        .withColumn("fg_frac", F.col("fg_df") / F.col("fg_size"))
        .withColumn("bg_frac", F.col("df") / F.col("n_docs"))
        .filter(F.col("fg_frac") > F.col("bg_frac"))
        .withColumn(
            "score",
            (F.col("fg_frac") - F.col("bg_frac"))
            * (F.col("fg_frac") / F.col("bg_frac")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), TIE_DECIMALS)), F.asc("term")
    )
    return (
        enriched.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= top_n)
        .select(
            "query_id",
            "term_rank",
            "term",
            F.col("fg_df").cast("long").alias("fg_df"),
            F.col("df").cast("long").alias("bg_df"),
            F.round("score", TIE_DECIMALS).alias("score"),
        )
    )
