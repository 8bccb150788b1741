"""Pseudo-relevance-feedback query expansion (RM3-lite / Rocchio).

The classic two-pass retrieval upgrade the serving reference cannot
express (it reranks a caller-provided pool; PRF needs a first-stage
index pass to FIND the pool): retrieve top feedback docs with BM25,
mine their most characteristic terms, re-retrieve with the expanded
term set. Deterministic variant — expansion terms ranked by
sum-over-feedback-docs of tf * Okapi-idf (the Rocchio positive
centroid restricted to in-document terms), rounded-weight desc /
term asc tie order, original query terms excluded — so the DuckDB
oracle reproduces the exact expansion and the final ranking
(`__spark_entry__.py::prf_topk`).

Scale shape: pass 1 is the stock block-max WAND (term-pruned postings
scan); term mining touches ONLY the feedback docs — a semi-join of the
tf stream against queries x fb_docs rows — then joins the tiny
result against term_stats on term. The expansion table
(queries x fb_terms rows) collects to the driver as QUERY PLANNING
(same pattern as fuzzy/synonym rewrites: the rewritten query set is
driver-side metadata, never corpus data), and pass 2 is again stock
WAND. No new shuffle shapes; two index passes total, which is the
textbook PRF cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bm25 import BM25_B, BM25_K1, term_freqs
from .postings import InvertedIndex
from .wand import wand_topk


def _query_terms(queries: list[tuple[int, str]]) -> dict[int, list[str]]:
    """Distinct in-order terms per query (engine tokenizer semantics:
    lowercase whitespace split)."""
    out: dict[int, list[str]] = {}
    for qid, q in queries:
        seen: list[str] = []
        for t in q.strip().lower().split():
            if t and t not in seen:
                seen.append(t)
        out[qid] = seen
    return out


def prf_expansion_terms(
    index: InvertedIndex,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    fb_docs: int = 5,
    fb_terms: int = 3,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, term, w, trk): the top ``fb_terms`` expansion terms
    per query mined from the BM25 top-``fb_docs`` feedback docs.

    w = sum over feedback docs of tf * ln((N - df + 0.5)/(df + 0.5) + 1);
    original query terms excluded; rank order (round(w, 6) desc,
    term asc) — deterministic for the oracle."""
    spark = docs.sparkSession
    first = wand_topk(index, queries, k=fb_docs, k1=k1, b=b)
    fb = first.select("query_id", "doc_id")
    tf = term_freqs(docs)
    idf = index.term_stats.select(
        "term",
        F.log(
            (F.lit(float(index.n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            + 1.0
        ).alias("idf"),
    )
    qt = spark.createDataFrame(
        [(qid, t) for qid, ts in _query_terms(queries).items() for t in ts],
        "query_id long, term string",
    )
    scores = (
        fb.join(tf, "doc_id")
        .join(idf, "term")
        .groupBy("query_id", "term")
        .agg(F.sum(F.col("tf") * F.col("idf")).alias("w"))
        .join(qt, ["query_id", "term"], "left_anti")
    )
    from pyspark.sql import Window  # noqa: PLC0415

    ranked = scores.withColumn(
        "trk",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.round("w", 6).desc(), F.col("term").asc()
            )
        ),
    )
    return ranked.filter(F.col("trk") <= fb_terms).select("query_id", "term", "w", "trk")


def prf_topk(
    index: InvertedIndex,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    fb_docs: int = 5,
    fb_terms: int = 3,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, doc_id, score): BM25 top-k for the EXPANDED
    queries (original terms + PRF expansion terms, distinct union,
    every term at standard BM25 weight — the RM3-lite policy that
    keeps pass 2 a plain OR query the unchanged WAND kernel runs)."""
    expansion = prf_expansion_terms(
        index, docs, queries, fb_docs=fb_docs, fb_terms=fb_terms, k1=k1, b=b
    )
    exp: dict[int, list[str]] = {}
    # queries x fb_terms rows: driver-side query planning, like the
    # fuzzy/synonym rewrites (never corpus-sized data)
    for r in expansion.orderBy("query_id", "trk").collect():
        exp.setdefault(r["query_id"], []).append(r["term"])
    orig = _query_terms(queries)
    expanded_queries = [
        (qid, " ".join(orig[qid] + [t for t in exp.get(qid, []) if t not in orig[qid]]))
        for qid, _ in queries
    ]
    return wand_topk(index, expanded_queries, k=k, k1=k1, b=b)
