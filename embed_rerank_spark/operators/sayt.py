"""Search-as-you-type: an INDEX-TIME edge-n-gram field that turns
prefix retrieval into exact-key lookups.

``prefix_topk`` (operators/wand.py) expands ``pre*`` by scanning the
term dictionary with a ``startswith`` predicate at query time. That is
fine for one-off wildcards, but an as-you-type search box issues a
prefix query on every keystroke, and at web scale the dictionary is
billions of terms — Elasticsearch solves this with the
``search_as_you_type`` field type / ``edge_ngram`` analyzer: every
term's prefixes of length ``min_gram..max_gram`` are materialized at
INDEX time, so the per-keystroke expansion is one equality lookup on a
precomputed, already-capped table instead of a dictionary range scan.

This module is that trade re-expressed Spark-first:

- ``build_edge_grams`` — one pass over ``term_stats`` (the dictionary,
  vocabulary-sized, not corpus-sized): explode each term into its edge
  grams, keep the top ``max_expansion`` terms per gram by the SAME
  (df desc, term asc) rule ``expand_prefix`` uses. The per-gram cap is
  enforced at build time, so the stored table is bounded at
  ``grams x max_expansion`` rows and a hot single-letter gram cannot
  skew anything downstream.
- ``edge_ngram_topk`` — per keystroke-prefix: equality-filter the gram
  table (pushdown-able, partition-prunable on a stored column — no
  ``startswith`` over the vocabulary), then score the expansion as the
  disjunctive BM25 OR-query through the shared WAND machinery.
  Prefixes longer than ``max_gram`` fall back to the query-time
  dictionary scan (the ES fallback for queries beyond the indexed gram
  length), so results are IDENTICAL to ``prefix_topk`` at every length
  — which is exactly what the DuckDB oracle and the parity test pin.

Reference parity: none (joonsoome/embed-rerank has no index); this is
the ES search_as_you_type / Lucene EdgeNGramTokenFilter surface.

Scale shape (100 TB): the gram build touches only the dictionary
(vocab x max_gram exploded rows, windowed per gram — the window
partitions by gram, and post-cap output is <= grams x max_expansion).
Query time does NO vocabulary scan: a broadcast equality semi-join
against the gram table, then the usual term-pruned postings read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1
from .postings import InvertedIndex
from .wand import expand_prefix, wand_topk


def build_edge_grams(
    term_stats: DataFrame,
    min_gram: int = 1,
    max_gram: int = 8,
    max_expansion: int = 64,
) -> DataFrame:
    """(gram, term, df): every vocabulary term listed under each of its
    edge grams (prefixes of length ``min_gram..max_gram``), capped to
    the ``max_expansion`` highest-df terms per gram (ties term-asc) —
    the persistable search-as-you-type sidecar table."""
    if not 1 <= min_gram <= max_gram:
        raise ValueError(f"need 1 <= min_gram <= max_gram, got {min_gram}..{max_gram}")
    grams = term_stats.select(
        "term",
        "df",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(min_gram),
                    F.least(F.lit(max_gram), F.length("term")),
                ),
                lambda i: F.substring(F.col("term"), 1, i),
            )
        ).alias("gram"),
    ).filter(F.length("term") >= min_gram)
    w = Window.partitionBy("gram").orderBy(F.desc("df"), F.asc("term"))
    return (
        grams.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= max_expansion)
        .select("gram", "term", "df")
    )


def edge_ngram_topk(
    index: InvertedIndex,
    edge_grams: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_gram: int = 8,
    max_expansion: int = 64,
    k1: float = BM25_K1,
    b: float = BM25_B,
    taat_threshold: int = 100_000,
) -> DataFrame:
    """(query_id, rank, doc_id, score): search-as-you-type retrieval —
    each query string is the user's typed prefix; expansion comes from
    the precomputed edge-gram table by EXACT key (falling back to the
    dictionary scan only beyond ``max_gram``), and the expansion
    scores as its BM25 OR-query. Rank-identical to ``prefix_topk`` by
    construction (same cap rule), just resolved against the index-time
    artifact instead of a dictionary scan."""
    short = [(qid, q.strip().lower()) for qid, q in queries]
    lookups = [(qid, p) for qid, p in short if p and len(p) <= max_gram]
    expansions: dict[int, list[str]] = {}
    if lookups:
        spark = edge_grams.sparkSession
        qdf = spark.createDataFrame(lookups, "query_id long, gram string")
        hit = (
            F.broadcast(qdf)
            .join(edge_grams, "gram")
            .select("query_id", "term", "df")
            .collect()
        )
        # Re-cap per query AFTER the join: the gram table returns every
        # stored row, which honors the cap only when the table was built
        # with the same max_expansion. Capping here (rows are already
        # df-desc/term-asc, the build_edge_grams cap order) keeps
        # rank-identity with prefix_topk even when the query-time cap is
        # tighter than the build-time one. A LOOSER query-time cap can't
        # recover rows the build dropped — build with max_expansion >=
        # the largest cap you will query with (and matching min_gram:
        # a query shorter than the build min_gram finds no gram rows).
        for r in sorted(hit, key=lambda r: (r["query_id"], -r["df"], r["term"])):
            terms = expansions.setdefault(r["query_id"], [])
            if len(terms) < max_expansion:
                terms.append(r["term"])
    for qid, p in short:
        if p and len(p) > max_gram and qid not in expansions:
            expansions[qid] = expand_prefix(index, p, max_expansion)
    synth = [(qid, " ".join(ts)) for qid, ts in expansions.items() if ts]
    if not synth:
        spark = index.postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    return wand_topk(index, synth, k, k1, b, taat_threshold)
