"""Impact-ordered index: Lucene "index sorting" + early termination.

Lucene lets an index declare a sort (``IndexWriterConfig.setIndexSort``,
typically by a static quality/recency signal); queries that sort by the
same signal then EARLY-TERMINATE — each segment stops after collecting
``k`` hits, because docs arrive in result order. This module is the
Spark-first re-expression over this engine's block-compressed postings:

1. ``impact_dictionary`` assigns each doc an ``impact_id`` = its dense
   rank under (static score desc, doc_id asc). Built with the same
   scalable dense-rank pattern as ``plans/dense_ids.py`` (range
   partition -> materialize -> per-bucket window + bucket offsets) —
   no global window, no driver materialization.
2. An index built over ``impact_id`` doc ids stores every posting list
   in IMPACT order (postings are doc_id-ascending by construction).
3. ``impact_ordered_topk`` answers "top-k by static score among docs
   matching any query term" by decoding, per (term, shard), only the
   FIRST blocks that cover ``k`` postings — a cumulative-count window
   over BLOCK HEADER rows picks them, so the bytes decoded are
   O(k + block_size) per (term, shard) and INDEPENDENT of the term's
   document frequency. A stopword's 10^11-posting list costs the same
   as a rare term's. (This is what Lucene's early-terminating
   ``TopFieldCollector`` buys; the reference engine has no index and
   re-sorts full candidate sets.)

Scale shape (100 TB): the postings scan prunes to the query terms
(parquet row-group pushdown via the build sort); the block-selection
window runs over block HEADERS only (rows = corpus_blocks for the
matched terms, never decoded payloads); the decode ``mapInArrow``
touches <= n_terms x n_shards x (k + block_size) postings; candidate
ranking and the dictionary map-back are planning-sized (the candidate
side broadcasts into the dictionary scan, then the matched slice
broadcasts back — the two-step small-into-big join the scorers use).

Correctness: per (term, shard) the kept blocks contain ALL postings of
that shard up to its k-th — so the union over shards contains every
global top-k candidate of that term, and the union over terms every
disjunctive top-k member; the final exact per-query window then picks
the true k smallest impact ids. Exactness vs the brute oracle is the
contract. Single-unit indexes only (an LSM-tiered index re-crawls docs
across units; run ``compact`` first — same precondition as explain).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.codec import delta_decode, vb_decode
from .postings import InvertedIndex


def impact_dictionary(
    docs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    staging_path: str | None = None,
) -> DataFrame:
    """(doc_id, impact_id, static): impact_id = 0-based dense rank of
    the doc under (``score_col`` desc, doc_id asc) — collision-free by
    construction. Same three-step scalable dense rank as
    ``dense_ids.build_url_dictionary`` (see there for why the sorted
    layout must materialize once): range-partition by the sort key,
    count per bucket, per-bucket window + bucket offset."""
    spark = docs.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    keyed = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(score_col).alias("static"),
        )
        .withColumn("negkey", -F.col("static").cast("double"))
        .repartitionByRange(n_parts, "negkey", "doc_id")
        .sortWithinPartitions("negkey", "doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    if staging_path is not None:
        keyed.write.mode("overwrite").parquet(staging_path)
        keyed = spark.read.parquet(staging_path)
    else:
        from pyspark import StorageLevel  # noqa: PLC0415

        keyed = keyed.persist(StorageLevel.MEMORY_AND_DISK)
    counts = {
        r.pid: r.n
        for r in keyed.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = spark.createDataFrame(offsets, "pid int, off long")
    w = Window.partitionBy("pid").orderBy("negkey", "doc_id")
    return (
        keyed.join(F.broadcast(off_df), "pid")
        .withColumn("impact_id", F.col("off") + F.row_number().over(w) - 1)
        .select("doc_id", "impact_id", "static")
    )


def with_impact_ids(
    docs: DataFrame, dictionary: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """doc table re-keyed to impact ids (one shuffle join; at build
    time it rides the extraction shuffle, like ``with_dense_ids``)."""
    out = docs.join(
        dictionary.select(F.col("doc_id").alias(id_col), "impact_id"), id_col
    )
    return out.drop(id_col).withColumnRenamed("impact_id", id_col)


def _decode_doc_ids(it):
    """Arrow kernel: block rows -> (term, doc_id) for every posting in
    the (already header-pruned) blocks."""
    for batch in it:
        terms = batch.column("term").to_pylist()
        n_docs = batch.column("n_docs").to_pylist()
        docs_bin = batch.column("docs_bin").to_pylist()
        out_terms: list[str] = []
        out_docs: list[np.ndarray] = []
        for t, n, db in zip(terms, n_docs, docs_bin):
            ids = delta_decode(vb_decode(db, n))
            out_terms.extend([t] * len(ids))
            out_docs.append(ids)
        if out_terms:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_terms, pa.string()),
                    pa.array(np.concatenate(out_docs), pa.int64()),
                ],
                ["term", "doc_id"],
            )


def early_termination_blocks(
    index: InvertedIndex, terms: set[str], k: int
) -> tuple[list[str], DataFrame]:
    """pass 1 — block-header pruning over HEADER COLUMNS ONLY (column
    pruning keeps the payload binaries out of the scan and out of the
    window shuffle): cumulative postings count of PRECEDING blocks per
    (term, shard[, seg]); keep a block only while the k-th posting
    hasn't been covered yet. Returns (partition keys, kept block-key
    DataFrame) — the kept set is what bounds query cost: per (term,
    shard) it is ceil(k / block_size) + 1 blocks REGARDLESS of the
    term's document frequency."""
    part_keys = ["term", "shard"] + (
        ["seg"] if "seg" in index.postings.columns else []
    )
    heads = index.postings.select(*part_keys, "block_id", "n_docs").filter(
        F.col("term").isin(list(terms))
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in part_keys])
        .orderBy("block_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    kept_keys = (
        heads.withColumn(
            "cum_prev", F.coalesce(F.sum("n_docs").over(w), F.lit(0))
        )
        .filter(F.col("cum_prev") < k)
        .select(*part_keys, "block_id")
    )
    return part_keys, kept_keys


def impact_ordered_topk(
    index: InvertedIndex,
    dictionary: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
) -> DataFrame:
    """(query_id, rank, doc_id, static): the top ``k`` docs BY STATIC
    SCORE (the index sort order) among docs matching ANY query term,
    over an impact-ordered index — early-terminated as described in
    the module docstring. ``doc_id``/``static`` are the ORIGINAL ids
    and scores, mapped back through the dictionary. Ties: the
    dictionary's total order (score desc, original doc_id asc). OOV
    terms never match; a query with only OOV terms returns no rows."""
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = index.postings.sparkSession
    qterms: list[tuple[int, str]] = []
    all_terms: set[str] = set()
    for qid, q in queries:
        seen: set[str] = set()
        for tok in q.strip().lower().split():
            if tok and tok not in seen:
                seen.add(tok)
                qterms.append((qid, tok))
        all_terms.update(seen)
    if not qterms:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, static double"
        )
    qt = spark.createDataFrame(qterms, "query_id long, term string")

    part_keys, kept_keys = early_termination_blocks(index, all_terms, k)
    # pass 2 — payload fetch of ONLY the kept blocks: the kept-key set
    # is <= n_terms x n_shards x ceil(k/block_size) rows (planning-
    # sized), so it broadcasts into the postings scan; payload bytes of
    # every other block never leave the scan, and the term filter still
    # prunes row groups.
    kept = index.postings.select(
        *part_keys, "block_id", "n_docs", "docs_bin"
    ).join(F.broadcast(kept_keys), [*part_keys, "block_id"])

    decoded = kept.select("term", "n_docs", "docs_bin").mapInArrow(
        _decode_doc_ids, "term string, doc_id long"
    )
    cands = (
        decoded.join(F.broadcast(qt), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    qw = Window.partitionBy("query_id").orderBy(F.asc("doc_id"))
    top = (
        cands.withColumn("rank", F.row_number().over(qw))
        .filter(F.col("rank") <= k)
        .withColumnRenamed("doc_id", "impact_id")
    )
    # map back: candidate side is n_queries x k — broadcast it into the
    # dictionary scan, then broadcast the matched slice back
    dict_slice = F.broadcast(top.select("impact_id").distinct()).join(
        dictionary, "impact_id"
    )
    return (
        top.join(F.broadcast(dict_slice), "impact_id")
        .select(
            "query_id",
            "rank",
            "doc_id",
            F.col("static").cast("double").alias("static"),
        )
    )
