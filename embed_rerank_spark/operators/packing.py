"""Sequence packing — lay documents end-to-end into fixed-length
training sequences (the "packing" step every LLM data pipeline runs
between corpus curation and the trainer): each doc gets a byte-range
address (seq_id, offset) in an infinite tape of ``seq_len``-token
sequences, in a DETERMINISTIC hash-shuffled global order.

Semantics (contiguous-fill packing, the GPT-2/LLaMA convention):
docs are ordered by (md5 bucket, doc_id) — a reproducible shuffle so
adjacent crawl pages don't land in the same training sequence — and
concatenated; a doc whose tokens start at global offset ``g`` is
assigned

    seq_id  = g // seq_len
    offset  = g %  seq_len
    n_seqs  = ((g + tokens - 1) // seq_len) - seq_id + 1

i.e. boundary-straddling docs span ``n_seqs`` sequences (the loader
splits them; packing never drops tokens). Token count = whitespace
tokenization, consistent with the engine's dl everywhere else.

Scale shape: the global ordered cumulative sum is the classic
single-partition-window trap; this reuses the engine's two-phase
distributed prefix sum (`sampling.select_token_budget`): range-
partition by the shuffle key and PIN the partitioning (boundaries are
re-sampled per job), per-partition totals (tiny) become broadcast
offsets, then an in-partition cumsum. Every partition packs
independently; no corpus-wide shuffle beyond the range partition the
trainer's sharded readers want anyway (sequences come out range-
ordered, so downstream shards read contiguous seq_id spans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.udfs import tokenize_for_scoring
from .sampling import SAMPLE_BUCKETS, sample_bucket


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = SAMPLE_BUCKETS,
) -> DataFrame:
    """(doc_id, tokens, seq_id, offset, n_seqs): the packing address
    of every doc under contiguous fill at ``seq_len`` tokens per
    sequence, in deterministic (md5 bucket, id) shuffle order. Docs
    with zero tokens are dropped (they occupy no tape)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenize_for_scoring(F.col(text_col))).alias("tokens"),
        sample_bucket(id_col, buckets).alias("_pb"),
    ).filter(F.col("tokens") > 0)

    order = [F.asc("_pb"), F.asc("doc_id")]
    parts = toks.repartitionByRange(*order).withColumn(
        "_pid", F.spark_partition_id()
    ).persist()
    try:
        totals = parts.groupBy("_pid").agg(F.sum("tokens").alias("ptot")).collect()
        offsets = {}
        run = 0
        for r in sorted(totals, key=lambda r: r["_pid"]):
            offsets[r["_pid"]] = run
            run += r["ptot"]
        if not offsets:
            return parts.sparkSession.createDataFrame(
                [], "doc_id long, tokens long, seq_id long, offset long, n_seqs long"
            )
        off_expr = F.create_map(
            [F.lit(x) for kv in sorted(offsets.items()) for x in kv]
        )[F.col("_pid")]
        w = Window.partitionBy("_pid").orderBy(*order).rowsBetween(
            Window.unboundedPreceding, -1
        )
        g = F.coalesce(F.sum("tokens").over(w), F.lit(0)) + off_expr
        out = (
            parts.withColumn("_g", g)
            .select(
                "doc_id",
                F.col("tokens").cast("long").alias("tokens"),
                F.floor(F.col("_g") / seq_len).cast("long").alias("seq_id"),
                F.pmod(F.col("_g"), F.lit(seq_len)).cast("long").alias("offset"),
                F.floor(
                    (F.col("_g") + F.col("tokens") - 1) / seq_len
                ).cast("long").alias("n_seqs_end"),
            )
            .withColumn("n_seqs", (F.col("n_seqs_end") - F.col("seq_id") + 1))
            .drop("n_seqs_end")
        )
        # materialize and cut lineage so the pinned partitioning can be
        # released (identical contract to sampling.select_token_budget)
        return out.localCheckpoint(eager=True)
    finally:
        parts.unpersist()


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text): fixed-size sliding
    token windows with overlap — the chunking step every
    RAG / embedding pipeline runs before encoding. Chunk i covers
    token span [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the final chunk is clipped at the
    doc end, and a doc never emits a trailing chunk that a previous
    chunk fully contains (chunk count = ceil(max(n - overlap, 1) /
    stride) for n > 0; empty docs emit nothing).

    Scale shape: pure JVM expressions end-to-end — tokenize once,
    ``sequence`` + ``explode`` for chunk ids, ``slice`` +
    ``array_join`` for the window text; no shuffle at all (the plan is
    a single projection pipeline over the scan), embarrassingly
    parallel at any corpus size. Chunk rows multiply the corpus by
    ~n/stride — select/filter the docs first, not after."""
    if overlap < 0 or chunk_tokens <= overlap:
        raise ValueError("need chunk_tokens > overlap >= 0")
    stride = chunk_tokens - overlap
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_for_scoring(F.col(text_col)).alias("_t"),
    ).withColumn("_n", F.size("_t")).filter(F.col("_n") > 0)
    n_chunks = F.ceil(
        F.greatest(F.col("_n") - F.lit(overlap), F.lit(1))
        / F.lit(float(stride))
    ).cast("long")
    exploded = toks.select(
        "doc_id",
        "_t",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_id"),
    )
    window = F.slice(
        F.col("_t"), (F.col("chunk_id") * stride + 1).cast("int"), chunk_tokens
    )
    return exploded.select(
        "doc_id",
        "chunk_id",
        F.size(window).cast("long").alias("n_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )
