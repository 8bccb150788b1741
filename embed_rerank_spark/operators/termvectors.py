"""ES _termvectors API as a batch operator.

For a requested set of documents, emit per (doc, term): term
frequency, the sorted 0-based position list, and the corpus-level
term statistics Elasticsearch reports alongside (``doc_freq``,
``ttf`` = total term frequency across the corpus). The reference repo
exposes no index introspection (its backends embed and score only —
``app/backends/mlx_backend.py``); this is the engine's own index
surface, mirroring the public ES API shape.

Scale notes (100 TB): the corpus-wide df/ttf table is ONE combinable
groupBy over the token stream; the per-doc side is filtered to the
requested doc_ids BEFORE the explode, so the heavy stats join touches
only the requested docs' vocabulary (a broadcast-sized semi-join of
the stats table against that vocabulary). Everything is JVM
whole-stage codegen — no Python."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embed_rerank_spark.functions.udfs import tokenize_for_scoring


def term_vectors(docs: DataFrame, doc_ids: list[int]) -> DataFrame:
    """(doc_id, term, tf, positions, df, ttf) for the requested docs.

    ``positions`` is the comma-joined ascending 0-based token-offset
    list (ES ``tokens[].position``); ``df``/``ttf`` are corpus-wide
    (ES ``term_statistics=true``). Terms sort ascending within a doc
    via the caller's orderBy; rows here are one per (doc, term)."""
    toks = docs.select(
        "doc_id", F.posexplode(tokenize_for_scoring(F.col("text"))).alias("pos", "term")
    )
    # corpus-wide term statistics: one combinable agg over the stream
    stats = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count("*").alias("ttf"),
    )
    mine = (
        toks.filter(F.col("doc_id").isin([int(d) for d in doc_ids]))
        .groupBy("doc_id", "term")
        .agg(
            F.count("*").alias("tf"),
            F.concat_ws(",", F.sort_array(F.collect_list("pos"))).alias("positions"),
        )
    )
    return mine.join(stats, "term").select(
        "doc_id", "term", "tf", "positions", "df", "ttf"
    )
