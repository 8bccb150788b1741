"""Inverted-index build: term-partitioned, block-compressed posting
lists as a Spark DataFrame pipeline.

Physical layout (SURVEY.md §2.6, no reference analogue):

- the corpus is split into ``n_shards`` **document shards**
  (``shard = doc_id % n_shards``). Each (shard, term) posting list is
  encoded contiguously by one task. Doc-space sharding IS the skew
  treatment for hot terms: a term with df ~= N ("the") costs any
  single task at most df/n_shards postings, and n_shards scales with
  the cluster (thousands at 10^12 docs; 8 in this sandbox). This is
  the "salted repartitioning before posting merge" of the north rule —
  the salt is the doc shard, and queries re-merge shard-local top-k.
- plan: tf hash-agg (map-side combinable) -> dl hash-agg -> doc_id
  co-partitioned join -> ``repartition(shard, term)`` +
  ``sortWithinPartitions(shard, term, doc_id)`` -> ``mapInArrow``
  streaming encoder (the ONLY Python stage; Arrow-batched, NumPy
  codec, no per-row Python).
- global term stats (df) and corpus stats (N, avgdl) live in side
  tables; idf and block upper bounds are computed at query time so
  encoded blocks stay valid when stats drift across snapshot merges.

On-disk layout (written by ``write_index``):

    index_dir/postings/        parquet, partitioned by shard
    index_dir/term_stats/      parquet (term, df)
    index_dir/doc_stats/       parquet (doc_id, dl, shard)
    index_dir/corpus_stats/    parquet single row (n_docs, avgdl)
    index_dir/manifest/        parquet per-shard lineage + metrics
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.codec import BLOCK_SIZE, encode_posting_list
from .bm25 import corpus_stats, doc_freqs, doc_lengths, term_freqs

POSTINGS_SCHEMA = (
    "term string, shard int, block_id int, first_doc long, last_doc long, "
    "n_docs int, max_tf int, min_dl int, "
    "docs_bin binary, tfs_bin binary, dls_bin binary"
)

_ARROW_OUT = pa.schema(
    [
        ("term", pa.string()),
        ("shard", pa.int32()),
        ("block_id", pa.int32()),
        ("first_doc", pa.int64()),
        ("last_doc", pa.int64()),
        ("n_docs", pa.int32()),
        ("max_tf", pa.int32()),
        ("min_dl", pa.int32()),
        ("docs_bin", pa.binary()),
        ("tfs_bin", pa.binary()),
        ("dls_bin", pa.binary()),
    ]
)


def _encode_partition(batches: Iterator[pa.RecordBatch], block_size: int):
    """Streaming encoder over one partition of (shard, term, doc_id,
    tf, dl) rows sorted by (shard, term, doc_id). Group runs can span
    Arrow batches; a carry buffer holds the open group.

    The carry MUST deep-copy its slices: ``to_numpy`` on Arrow columns
    can be zero-copy views into stream buffers that are recycled on the
    next batch (observed as corrupted doc ids when carried across)."""
    carry: dict[str, np.ndarray] | None = None
    carry_key: tuple[int, str] | None = None

    def flush(shard, term, docs, tfs, dls, out):
        for blk in encode_posting_list(docs, tfs, dls, block_size):
            out["term"].append(term)
            out["shard"].append(int(shard))
            out["block_id"].append(blk.block_id)
            out["first_doc"].append(blk.first_doc)
            out["last_doc"].append(blk.last_doc)
            out["n_docs"].append(blk.n_docs)
            out["max_tf"].append(blk.max_tf)
            out["min_dl"].append(blk.min_dl)
            out["docs_bin"].append(blk.docs_bin)
            out["tfs_bin"].append(blk.tfs_bin)
            out["dls_bin"].append(blk.dls_bin)

    def new_out():
        return {name: [] for name in _ARROW_OUT.names}

    for batch in batches:
        shard = batch.column("shard").to_numpy(zero_copy_only=False)
        term_col = batch.column("term")
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        tf = batch.column("tf").to_numpy(zero_copy_only=False)
        dl = batch.column("dl").to_numpy(zero_copy_only=False)
        n = len(doc)
        if n == 0:
            continue
        # group boundaries: change in (shard, term) — vectorized
        if n > 1:
            term_change = pc.not_equal(
                term_col.slice(1), term_col.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
            change = (shard[1:] != shard[:-1]) | term_change
            bounds = [0, *list(np.flatnonzero(change) + 1), n]
        else:
            bounds = [0, n]

        out = new_out()
        first_key = (int(shard[0]), term_col[0].as_py())
        if carry is not None and first_key != carry_key:
            # previous batch ended exactly on a group boundary
            flush(carry_key[0], carry_key[1], carry["doc"], carry["tf"], carry["dl"], out)
            carry = None

        last_gi = len(bounds) - 2
        for gi in range(len(bounds) - 1):
            s, e = bounds[gi], bounds[gi + 1]
            key = (int(shard[s]), term_col[s].as_py())
            g_doc, g_tf, g_dl = doc[s:e], tf[s:e], dl[s:e]
            if gi == 0 and carry is not None:  # continuation of carry_key
                g_doc = np.concatenate([carry["doc"], g_doc])
                g_tf = np.concatenate([carry["tf"], g_tf])
                g_dl = np.concatenate([carry["dl"], g_dl])
                carry = None
            if gi == last_gi:
                # last group may continue into the next batch; COPY out
                # of the Arrow-backed views (buffers get recycled)
                carry = {
                    "doc": np.array(g_doc, copy=True),
                    "tf": np.array(g_tf, copy=True),
                    "dl": np.array(g_dl, copy=True),
                }
                carry_key = key
            else:
                flush(key[0], key[1], g_doc, g_tf, g_dl, out)
        if out["term"]:
            yield pa.RecordBatch.from_pydict(out, schema=_ARROW_OUT)

    if carry is not None and carry_key is not None:
        out = new_out()
        flush(carry_key[0], carry_key[1], carry["doc"], carry["tf"], carry["dl"], out)
        yield pa.RecordBatch.from_pydict(out, schema=_ARROW_OUT)


def shard_expr(doc_col, n_shards: int):
    """Doc shard assignment (engine constant semantics)."""
    return F.pmod(doc_col, F.lit(n_shards)).cast("int")


def build_postings(
    docs: DataFrame,
    n_shards: int = 8,
    block_size: int = BLOCK_SIZE,
    num_partitions: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """Build the full index from a document table.

    Returns dict of DataFrames: postings, term_stats, doc_stats,
    corpus_stats. Nothing is materialized until written/consumed.
    """
    tf = term_freqs(docs, id_col, text_col)
    dl = doc_lengths(tf)
    tfdl = tf.join(dl, "doc_id").withColumn("shard", shard_expr(F.col("doc_id"), n_shards))

    n_parts = num_partitions or max(
        n_shards, docs.sparkSession.sparkContext.defaultParallelism
    )
    sorted_rows = tfdl.repartition(n_parts, "shard", "term").sortWithinPartitions(
        "shard", "term", "doc_id"
    )
    postings = sorted_rows.mapInArrow(
        lambda it: _encode_partition(it, block_size), POSTINGS_SCHEMA
    )

    term_stats = doc_freqs(tf)
    doc_stats = dl.withColumn("shard", shard_expr(F.col("doc_id"), n_shards))
    cstats = corpus_stats(dl)
    return {
        "postings": postings,
        "term_stats": term_stats,
        "doc_stats": doc_stats,
        "corpus_stats": cstats,
    }


def lineage_manifest(postings: DataFrame, doc_stats: DataFrame) -> DataFrame:
    """Per-shard build metrics: postings emitted, blocks, terms, bytes
    compressed, docs covered (the north rule's per-partition lineage)."""
    p = postings.groupBy("shard").agg(
        F.sum("n_docs").alias("postings_emitted"),
        F.count(F.lit(1)).alias("blocks"),
        F.countDistinct("term").alias("terms"),
        (
            F.sum(F.length("docs_bin"))
            + F.sum(F.length("tfs_bin"))
            + F.sum(F.length("dls_bin"))
        ).alias("bytes_compressed"),
    )
    d = doc_stats.groupBy("shard").agg(
        F.count(F.lit(1)).alias("docs_tokenized"), F.sum("dl").alias("tokens")
    )
    return p.join(d, "shard", "full")


def write_index(index: dict[str, DataFrame], path: str) -> None:
    index["postings"].write.mode("overwrite").partitionBy("shard").parquet(
        f"{path}/postings"
    )
    index["term_stats"].write.mode("overwrite").parquet(f"{path}/term_stats")
    index["doc_stats"].write.mode("overwrite").parquet(f"{path}/doc_stats")
    index["corpus_stats"].write.mode("overwrite").parquet(f"{path}/corpus_stats")
    # lineage from the WRITTEN postings (reflects what actually landed)
    spark = index["postings"].sparkSession
    written = spark.read.parquet(f"{path}/postings")
    dstats = spark.read.parquet(f"{path}/doc_stats")
    lineage_manifest(written, dstats).write.mode("overwrite").parquet(f"{path}/manifest")


@dataclass
class InvertedIndex:
    """Handle over an on-disk index."""

    postings: DataFrame
    term_stats: DataFrame
    doc_stats: DataFrame
    n_docs: int
    avgdl: float

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "InvertedIndex":
        cs = spark.read.parquet(f"{path}/corpus_stats").collect()[0]
        return cls(
            postings=spark.read.parquet(f"{path}/postings"),
            term_stats=spark.read.parquet(f"{path}/term_stats"),
            doc_stats=spark.read.parquet(f"{path}/doc_stats"),
            n_docs=cs["n_docs"],
            avgdl=float(cs["avgdl"]),
        )
