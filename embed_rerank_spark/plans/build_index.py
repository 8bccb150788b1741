"""Index-build job: pages -> extract -> tokenize -> per-snapshot
posting segments -> merged index. Checkpoint-resumable with
per-partition lineage (BASELINE.json north_rule).

This is the engine analogue of the reference's startup lifecycle
(``app/main.py:51-160`` loads the model once before serving; we build
the index once before querying), replacing model load with a
log-structured build:

- the ``pages`` table is processed one SNAPSHOT at a time (a snapshot =
  one ``warc_ts`` day — the Iceberg-incremental unit). Each snapshot
  job writes a self-contained posting SEGMENT + doc stats + a manifest
  with per-shard lineage metrics (docs tokenized, postings emitted,
  bytes compressed). The manifest is written LAST, so its existence is
  the segment's commit marker: a restarted build skips every snapshot
  whose manifest exists and redoes any partial segment (idempotent
  overwrite).
- ``merge_segments`` unions all committed segments and re-encodes each
  (shard, term) posting list (segments hold disjoint doc sets, but doc
  ids interleave, so block merge is decode -> merge-sort -> re-encode).
  Global term/corpus stats are re-derived from segment doc stats. This
  is the "merged across Iceberg snapshots" path: a new snapshot only
  pays segment-build + merge, never a full rebuild.

Extraction runs the byte-identical TextSummarizer semantics
(``functions/text_processing.py``) as a pandas UDF; rows failing
validation land in a quarantine count in the manifest, not an abort.

Doc ids are ``xxhash64(url)`` — deterministic, partition-independent,
stable across snapshots (the per-url invariant keys on url).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.codec import BLOCK_SIZE
from ..functions.udfs import make_extract_udf
from ..operators.postings import (
    POSTINGS_SCHEMA,
    InvertedIndex,
    build_postings,
    pow2_salts,
    salt_expr,
    shard_expr,
)

SNAPSHOT_COL = "snap_day"

# Size the ENCODE shuffle by data volume, not core count. A fixed
# core-count partitioning means per-task bytes grow linearly with the
# corpus: the session-11 weak-scaling ladder (BENCH/BASELINE.md)
# measured the build going superlinear (1.39x per 4x data) at 640k
# pages on a fixed 8 GiB heap, and recovering most of it with 4x the
# heap — i.e. the plan was fine, the per-task working set was not.
# Targeting a constant docs-per-encode-task keeps Arrow batch + sort
# buffers flat no matter the corpus size; at cluster scale raise the
# target to match executor memory (it is env-tunable for that reason).
ENCODE_DOCS_PER_TASK = int(os.environ.get("SPARK_GRAFT_ENCODE_DOCS_PER_TASK", "2500"))
# The merge stage's unit is compressed BLOCK rows (~block_size
# postings each), far denser than tf rows — target accordingly.
MERGE_BLOCKS_PER_TASK = int(os.environ.get("SPARK_GRAFT_MERGE_BLOCKS_PER_TASK", "25000"))


# Shard count is QUERY-time parallelism (each WAND task scans one doc
# shard), so it has two floors: the cluster's core count (else cores
# idle at query time) and — the r04 oversharding measurement
# (BENCH/BASELINE.md) — corpus volume: past ~20k docs/shard the
# per-task position/posting decode dominates and query latency grows
# with shard SIZE, not shard count. At 2.56M pages on 32 fixed cores,
# 128 shards beat 32 shards 74.5 vs 47.9 WAND QPS (1.56x) and halved
# the merge, because four small task waves decode less per task than
# one wave of 4x-fat shards. On a real cluster the extra shards ride
# extra executors instead of queueing. Env-tunable like the other
# volume targets.
SHARD_DOCS_PER_SHARD = int(os.environ.get("SPARK_GRAFT_DOCS_PER_SHARD", "20000"))


def sized_shards(spark: SparkSession, n_docs: int, min_shards: int = 8) -> int:
    """Auto shard count: max(min_shards, cluster cores,
    ceil(n_docs / SHARD_DOCS_PER_SHARD)) — pass ``n_shards=None`` to
    the build entrypoints to use it."""
    by_volume = -(-int(n_docs) // SHARD_DOCS_PER_SHARD)
    return max(min_shards, spark.sparkContext.defaultParallelism, by_volume)


def encode_partitions(spark: SparkSession, n_docs: int, n_shards: int) -> int:
    """Partition count for the tf->encode shuffle: at least one task
    per core (and per shard), growing linearly with docs so per-task
    memory stays constant as the corpus scales."""
    by_volume = -(-int(n_docs) // ENCODE_DOCS_PER_TASK)
    return max(n_shards, spark.sparkContext.defaultParallelism, by_volume)


def merge_partitions(spark: SparkSession, n_blocks: int) -> int:
    """Partition count for the segment-merge shuffle, scaled by total
    block rows across segments (same constant-working-set rationale as
    ``encode_partitions``)."""
    by_volume = -(-int(n_blocks) // MERGE_BLOCKS_PER_TASK)
    return max(8, spark.sparkContext.defaultParallelism, by_volume)


def with_snapshot(pages: DataFrame) -> DataFrame:
    return pages.withColumn(SNAPSHOT_COL, F.date_format("warc_ts", "yyyy-MM-dd"))


def extract_pages(
    pages: DataFrame,
    max_tokens: int = 2048,
    absolute_max_tokens: int = 8192,
    strategy: str = "smart_truncate",
    max_position_embeddings: int | None = None,
) -> DataFrame:
    """pages -> (url, doc_id, text, n_tokens, dl, error). Byte-identical
    extracted text per url; failures quarantined in ``error``.

    ``max_position_embeddings`` derives both limits from model metadata
    (``functions.text_processing.token_limits``: recommended =
    min(max_pos // 4, 2048), absolute = max_pos — reference
    ``model_metadata.py:245-247``), overriding the explicit values.
    The 2048/8192 defaults are that formula at the reference's default
    max_pos = 8192.

    ``dl`` (scoring-token count of the EXTRACTED text) is computed here
    so every downstream consumer (doc stats, BM25 length norm) is a
    projection of this table instead of a re-tokenize pass."""
    if max_position_embeddings is not None:
        from ..functions.text_processing import token_limits  # noqa: PLC0415

        max_tokens, absolute_max_tokens = token_limits(max_position_embeddings)
    extract = make_extract_udf(max_tokens, absolute_max_tokens, strategy)
    from ..functions.udfs import tokenize_for_scoring  # noqa: PLC0415

    return pages.select(
        "url",
        F.xxhash64("url").alias("doc_id"),
        extract(F.col("text")).alias("ex"),
    ).select(
        "url",
        "doc_id",
        F.col("ex.text").alias("text"),
        F.col("ex.processed_tokens").alias("n_tokens"),
        F.size(tokenize_for_scoring(F.col("ex.text"))).alias("dl"),
        F.col("ex.error").alias("error"),
    )


def _segment_dirs(path: str) -> str:
    return f"{path}/segments"


def _manifest_file(path: str, snap: str) -> str:
    return f"{_segment_dirs(path)}/{snap}/MANIFEST.json"


def committed_snapshots(path: str) -> set[str]:
    seg_root = _segment_dirs(path)
    if not os.path.isdir(seg_root):
        return set()
    return {
        d
        for d in os.listdir(seg_root)
        if os.path.exists(_manifest_file(path, d))
    }


def build_segment(
    spark: SparkSession,
    pages_snapshot: DataFrame,
    path: str,
    snap: str,
    n_shards: int = 8,
    block_size: int = BLOCK_SIZE,
    n_salts: int = 1,
    positional: bool = False,
) -> dict:
    """Build + commit one snapshot segment. Returns its manifest dict.
    ``positional=True`` encodes per-posting position streams too (the
    segment then serves phrase/proximity queries after merge)."""
    from pyspark.sql import Observation  # noqa: PLC0415

    seg = f"{_segment_dirs(path)}/{snap}"
    # one extraction pass: persist the extracted table (it doubles as
    # the segment's forward index for rerank text lookup), then build
    # postings from the parquet — otherwise the UDF recomputes for the
    # tf build and the doc-stats write. The quarantine count piggybacks
    # on the same write job via Observation (no extra scan).
    obs = Observation(f"extract-{snap}")
    extract_pages(pages_snapshot).observe(
        obs, F.count(F.when(F.col("error").isNotNull(), 1)).alias("quarantined")
    ).write.mode("overwrite").parquet(f"{seg}/extracted")
    n_quarantined = int(obs.get["quarantined"])
    extracted = spark.read.parquet(f"{seg}/extracted")
    clean = extracted.filter(F.col("error").isNull())
    # one column-pruned count of the just-written parquet (reads only
    # the `error` column) sizes the encode shuffle by data volume
    n_parts = encode_partitions(spark, clean.count(), n_shards)

    if positional:
        from ..operators.positions import build_positional_postings  # noqa: PLC0415

        idx = build_positional_postings(
            clean, n_shards=n_shards, block_size=block_size, n_salts=n_salts,
            num_partitions=n_parts,
        )
    else:
        idx = build_postings(
            clean, n_shards=n_shards, block_size=block_size, n_salts=n_salts,
            num_partitions=n_parts,
        )
    # shard-file layout (operators/postings.write_shard_files): every
    # doc shard whole in one file, rows (shard, term)-sorted so term
    # pushdown still prunes row groups — the tiered multi-unit query
    # view can then skip its per-batch repartition (each doc's live
    # postings sit whole in one (shard, unit) file)
    from ..operators.postings import write_shard_files  # noqa: PLC0415

    write_shard_files(idx["postings"], seg)
    # doc stats are a pure projection of the extracted table (dl was
    # computed during extraction) — no re-tokenize, no aggregation.
    # dl=0 docs (whitespace-only text that extraction passes with
    # error=None) are EXCLUDED, matching doc_lengths/doc_lengths_direct
    # semantics: every corpus-stats path (n_docs, avgdl -> idf, BM25
    # length norm) must count the same doc set or WAND-vs-bruteforce
    # exactness breaks on corpora containing such docs.
    clean.filter(F.col("dl") > 0).select(
        "doc_id", "dl", shard_expr(F.col("doc_id"), n_shards).alias("shard")
    ).write.mode("overwrite").parquet(f"{seg}/doc_stats")

    written = spark.read.parquet(f"{seg}/postings")
    dstats = spark.read.parquet(f"{seg}/doc_stats")
    per_shard = (
        written.groupBy("shard")
        .agg(
            F.sum("n_docs").alias("postings_emitted"),
            F.count(F.lit(1)).alias("blocks"),
            (
                F.sum(F.length("docs_bin"))
                + F.sum(F.length("tfs_bin"))
                + F.sum(F.length("dls_bin"))
            ).alias("bytes_compressed"),
        )
        .join(
            dstats.groupBy("shard").agg(F.count(F.lit(1)).alias("docs_tokenized")),
            "shard",
            "full",
        )
        .collect()
    )
    manifest = {
        "snapshot": snap,
        "n_shards": n_shards,
        "block_size": block_size,
        "n_salts": pow2_salts(n_salts),
        "positional": positional,
        "quarantined": n_quarantined,
        "shards": [r.asDict() for r in per_shard],
    }
    # manifest last = commit marker
    with open(_manifest_file(path, snap), "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    return manifest


def write_docs_segment(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    snap: str,
    n_shards: int = 8,
    block_size: int = BLOCK_SIZE,
    n_salts: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Build + commit one snapshot segment from an ALREADY-EXTRACTED
    document table (id, text) — the entry point for corpora that skip
    the html extraction stage (pre-cleaned exports, third-party text
    dumps, synthetic re-crawl fixtures). Writes the same on-disk unit
    contract as ``build_segment`` (postings + doc_stats +
    manifest-last commit marker), so the tiered machinery — compaction,
    as-of views, tombstones, newest-wins doc versioning — applies
    unchanged."""
    seg = f"{_segment_dirs(path)}/{snap}"
    os.makedirs(seg, exist_ok=True)
    idx = build_postings(
        docs,
        n_shards=n_shards,
        block_size=block_size,
        n_salts=n_salts,
        id_col=id_col,
        text_col=text_col,
    )
    from ..operators.postings import write_shard_files  # noqa: PLC0415

    write_shard_files(idx["postings"], seg)
    idx["doc_stats"].select("doc_id", "dl", "shard").write.mode(
        "overwrite"
    ).parquet(f"{seg}/doc_stats")

    written = spark.read.parquet(f"{seg}/postings")
    dstats = spark.read.parquet(f"{seg}/doc_stats")
    per_shard = (
        written.groupBy("shard")
        .agg(
            F.sum("n_docs").alias("postings_emitted"),
            F.count(F.lit(1)).alias("blocks"),
            (
                F.sum(F.length("docs_bin"))
                + F.sum(F.length("tfs_bin"))
                + F.sum(F.length("dls_bin"))
            ).alias("bytes_compressed"),
        )
        .join(
            dstats.groupBy("shard").agg(F.count(F.lit(1)).alias("docs_tokenized")),
            "shard",
            "full",
        )
        .collect()
    )
    manifest = {
        "snapshot": snap,
        "n_shards": n_shards,
        "block_size": block_size,
        "n_salts": pow2_salts(n_salts),
        "positional": False,
        "quarantined": 0,
        "shards": [r.asDict() for r in per_shard],
    }
    with open(_manifest_file(path, snap), "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    return manifest


def build_incremental(
    spark: SparkSession,
    pages: DataFrame,
    path: str,
    n_shards: int | None = 8,
    block_size: int = BLOCK_SIZE,
    resume: bool = True,
    max_concurrent: int = 4,
    n_salts: int = 1,
    positional: bool = False,
) -> list[str]:
    """Build every uncommitted snapshot segment; returns snapshots built.

    ``n_shards=None`` sizes the shard count from the TOTAL corpus via
    ``sized_shards`` (one column-pruned count) — resolved once here,
    not per segment, because every segment of an index must share one
    shard function for the merge/tiered readers.

    With ``resume=True`` (default), committed segments are skipped —
    restart-after-kill completes the build with identical bytes (the
    generator/extraction are deterministic per url).

    Segments are INDEPENDENT (disjoint doc sets, own directories +
    commit markers), so up to ``max_concurrent`` build concurrently
    from driver threads: Spark interleaves their stages onto idle
    cores, hiding each job's fixed scheduling/commit latency behind
    another segment's compute — the same overlap a multi-tenant
    cluster scheduler provides."""
    from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

    if n_shards is None:
        n_shards = sized_shards(spark, pages.select("url").count())
    os.makedirs(_segment_dirs(path), exist_ok=True)
    snaps = [
        r[0]
        for r in with_snapshot(pages).select(SNAPSHOT_COL).distinct().orderBy(SNAPSHOT_COL).collect()
    ]
    done = committed_snapshots(path) if resume else set()
    todo = [s for s in snaps if s not in done]
    if not todo:
        return []

    def run(snap: str) -> str:
        snap_pages = with_snapshot(pages).filter(F.col(SNAPSHOT_COL) == snap)
        build_segment(
            spark, snap_pages, path, snap, n_shards, block_size, n_salts, positional
        )
        return snap

    if max_concurrent <= 1 or len(todo) == 1:
        return [run(s) for s in todo]
    with ThreadPoolExecutor(max_workers=min(max_concurrent, len(todo))) as pool:
        return list(pool.map(run, todo))


_MERGE_IN = (
    "term string, shard int, n_docs int, docs_bin binary, tfs_bin binary, dls_bin binary"
)


def _concat_binary(arr: pa.Array) -> tuple[memoryview, np.ndarray]:
    """Zero-copy view of a Binary/LargeBinaryArray's payload as one
    contiguous stream + per-row byte offsets (the Arrow data buffer
    already IS the row-order concatenation). large_binary (int64
    offsets) is the normal case here — ``combined_table`` upcasts so
    >2 GiB partition payloads can't overflow int32 offsets."""
    off_dtype = np.int64 if arr.type in (pa.large_binary(), pa.large_string()) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = memoryview(arr.buffers()[2])
    return data[offs[0] : offs[-1]], offs - offs[0]


def stale_versions(doc_stats: list[DataFrame]) -> tuple | None:
    """Newest-wins version map over a recency-ordered unit list (index
    i = recency ordinal, newest last): (sorted doc_ids, newest seg per
    doc) for docs present in MORE THAN ONE unit — the re-crawled urls
    whose stale postings merges drop and query views mask. One
    combinable agg over the unioned doc stats; the result is bounded
    by the re-crawl overlap between units (compaction keeps it small),
    so it ships in task closures like tombstones."""
    from functools import reduce  # noqa: PLC0415

    seg_ds = reduce(
        DataFrame.unionByName,
        [
            ds.select("doc_id").withColumn("seg", F.lit(i))
            for i, ds in enumerate(doc_stats)
        ],
    )
    rows = (
        seg_ds.groupBy("doc_id")
        .agg(F.max("seg").alias("seg"), F.count_distinct("seg").alias("n"))
        .filter(F.col("n") > 1)
        .select("doc_id", "seg")
        .collect()
    )
    if not rows:
        return None
    rows.sort(key=lambda r: r["doc_id"])
    return tuple(r["doc_id"] for r in rows), tuple(r["seg"] for r in rows)


def _merge_partition(
    batches: Iterator[pa.RecordBatch],
    block_size: int,
    n_salts: int = 1,
    excluded: tuple[int, ...] = (),
    versions: tuple = None,
):
    """Decode -> merge-sort -> re-encode, fully vectorized.

    ``excluded`` (deletion tombstones) physically drops those docs'
    postings during the rewrite — how LSM deletes are folded in at
    compaction.

    ``versions`` = (sorted doc_ids, newest input-unit ``seg`` per doc)
    for docs present in MORE THAN ONE input unit (re-crawled urls):
    the rewrite keeps only the newest unit's postings for those docs —
    newest-wins folded in physically, matching what the query view
    masks at read time. Requires a ``seg`` column (input-unit recency
    ordinal) on the rows.

    Input: one partition of encoded block rows hashed by (shard, term)
    (doc sets disjoint across segments, interleaved in id space). All
    blocks of the partition are decoded with ONE varbyte pass per
    stream (payloads concatenated zero-copy from the Arrow buffers,
    doc ids recovered by ``delta_decode_blocks``), merge-sorted with a
    single ``np.lexsort`` on (group, doc), and re-encoded by the same
    ``encode_grouped_rows`` the first build uses.
    """
    from ..functions.codec import delta_decode_blocks, vb_decode  # noqa: PLC0415
    from ..operators.postings import combined_table, encode_grouped_rows  # noqa: PLC0415

    batch_list = [b for b in batches if b.num_rows > 0]
    if not batch_list:
        return
    tbl = combined_table(batch_list)
    dict_enc = pa.compute.dictionary_encode(tbl.column("term").chunk(0))
    btidx = dict_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    terms_dict = dict_enc.dictionary
    bshard = tbl.column("shard").chunk(0).to_numpy(zero_copy_only=False).astype(np.int64)
    bnd = tbl.column("n_docs").chunk(0).to_numpy(zero_copy_only=False).astype(np.int64)
    n_values = int(bnd.sum())
    value_starts = np.concatenate(([0], np.cumsum(bnd)))[:-1]

    docs_stream, _ = _concat_binary(tbl.column("docs_bin").chunk(0))
    tfs_stream, _ = _concat_binary(tbl.column("tfs_bin").chunk(0))
    dls_stream, _ = _concat_binary(tbl.column("dls_bin").chunk(0))
    doc = delta_decode_blocks(vb_decode(docs_stream, n_values), value_starts)
    tf = vb_decode(tfs_stream, n_values).astype(np.int64)
    dl = vb_decode(dls_stream, n_values).astype(np.int64)

    # order groups by LEXICOGRAPHIC term (dictionary indices are
    # appearance-ordered): keeps written row groups term-sorted so the
    # merged index prunes on term min/max stats like the segment files
    tsort = np.argsort(terms_dict.to_numpy(zero_copy_only=False))
    trank = np.empty(len(tsort), dtype=np.int64)
    trank[tsort] = np.arange(len(tsort))
    shard_base = int(bshard.max()) + 1
    row_key = np.repeat(trank[btidx] * shard_base + bshard, bnd)
    perm = np.lexsort((doc, row_key))
    tidx_rows = np.repeat(btidx, bnd)[perm]
    shard_rows = np.repeat(bshard, bnd)[perm]
    doc_s, tf_s, dl_s = doc[perm], tf[perm], dl[perm]
    if excluded or versions:
        live = np.ones(len(doc_s), dtype=bool)
        if excluded:
            live &= ~np.isin(doc_s, np.sort(np.asarray(excluded, dtype=np.int64)))
        if versions:
            from ..operators.postings import version_arrays, version_keep  # noqa: PLC0415

            vd, vs = version_arrays(versions)
            bseg = tbl.column("seg").chunk(0).to_numpy(zero_copy_only=False).astype(np.int64)
            seg_rows = np.repeat(bseg, bnd)[perm]
            live &= version_keep(doc_s, seg_rows, vd, vs)
        tidx_rows, shard_rows = tidx_rows[live], shard_rows[live]
        doc_s, tf_s, dl_s = doc_s[live], tf_s[live], dl_s[live]
        if len(doc_s) == 0:
            return
    salt_rows = None
    if n_salts > 1:
        bits = (n_salts - 1).bit_length()
        salt_rows = (
            (doc_s.astype(np.int64).view(np.uint64) ^ np.uint64(1 << 63))
            >> np.uint64(64 - bits)
        ).astype(np.int64)
    yield from encode_grouped_rows(
        terms_dict, tidx_rows, shard_rows, doc_s, tf_s, dl_s, block_size,
        salt=salt_rows,
    )


def merge_segments(
    spark: SparkSession,
    path: str,
    block_size: int = BLOCK_SIZE,
    n_salts: int | None = None,
) -> InvertedIndex:
    """Merge all committed segments into the final index at
    ``path/{postings,term_stats,doc_stats,corpus_stats,manifest}``.

    ``n_salts`` defaults to the value recorded in the segment
    manifests; passing a DIFFERENT value than the segments were built
    with is rejected — salt buckets are derived from each block's
    first_doc, which is only range-aligned when build and merge agree,
    and a mismatch could produce overlapping block runs (silent WAND
    corruption)."""
    snaps = sorted(committed_snapshots(path))
    if not snaps:
        raise ValueError(f"no committed segments under {path}")
    gced = [s for s in snaps if os.path.exists(f"{_segment_dirs(path)}/{s}/GCED")]
    if gced:
        raise ValueError(
            f"segments {gced} were garbage-collected (tiered.gc_units); a "
            "full merge needs every segment payload — query the tiered "
            "view instead, or rebuild the missing snapshots"
        )
    built_salts = set()
    built_positional = set()
    for s in snaps:
        with open(_manifest_file(path, s)) as f:
            m = json.load(f)
            built_salts.add(m.get("n_salts", 1))
            built_positional.add(bool(m.get("positional", False)))
    if len(built_salts) > 1:
        raise ValueError(f"segments built with mixed n_salts: {sorted(built_salts)}")
    if len(built_positional) > 1:
        raise ValueError("segments mix positional and non-positional builds")
    positional = built_positional.pop()
    built = built_salts.pop()
    if n_salts is None:
        n_salts = built
    elif pow2_salts(n_salts) != built:
        raise ValueError(
            f"merge n_salts={pow2_salts(n_salts)} != build n_salts={built}; "
            "salt range buckets must match the segment layout"
        )
    from functools import reduce  # noqa: PLC0415

    # snapshots sort chronologically (YYYY-MM-DD / zero-padded stream
    # batches), so the enumeration ordinal IS the recency seg the
    # newest-wins version map keys on
    ds_list = [
        spark.read.parquet(f"{_segment_dirs(path)}/{s}/doc_stats") for s in snaps
    ]
    versions = stale_versions(ds_list)
    seg_postings = reduce(
        DataFrame.unionByName,
        [
            spark.read.parquet(f"{_segment_dirs(path)}/{s}/postings").withColumn(
                "seg", F.lit(i)
            )
            for i, s in enumerate(snaps)
        ],
    )
    seg_docstats = reduce(
        DataFrame.unionByName,
        [ds.withColumn("seg", F.lit(i)) for i, ds in enumerate(ds_list)],
    )

    # parquet metadata-only count (no filter, no column reads) sizes
    # the merge shuffle by total block rows across segments
    n_parts = merge_partitions(spark, seg_postings.count())
    # hash includes the block's RANGE salt (derived from first_doc —
    # valid because build and merge must share n_salts, so block ranges
    # align to salt buckets): a hot term's blocks spread over
    # n_salts partitions instead of one
    merge_cols = [
        "term", "shard", "first_doc", "n_docs", "docs_bin", "tfs_bin", "dls_bin",
        "seg",
    ]
    if positional:
        from ..operators.positions import (  # noqa: PLC0415
            POSITIONAL_SCHEMA,
            merge_partition_pos,
        )

        merge_cols.append("pos_bin")
        kernel, out_schema = merge_partition_pos, POSITIONAL_SCHEMA
    else:
        kernel, out_schema = _merge_partition, POSTINGS_SCHEMA
    merged = (
        seg_postings.select(*merge_cols)
        .withColumn("bsalt", salt_expr(F.col("first_doc"), pow2_salts(n_salts)))
        .repartition(n_parts, "shard", "term", "bsalt")
        .mapInArrow(
            lambda it: kernel(it, block_size, pow2_salts(n_salts), (), versions),
            out_schema,
        )
    )
    from ..operators.postings import write_shard_files  # noqa: PLC0415

    write_shard_files(merged, path)

    from pyspark.sql import Observation  # noqa: PLC0415

    # one doc_stats row per UNIQUE doc: the same url re-crawled in two
    # snapshots must not double-count n_docs/avgdl — the NEWEST
    # snapshot's dl wins, matching the newest-wins postings rewrite
    # above (dl desc breaks within-snapshot xxhash64-collision ties the
    # way the encoder's max-(tf, dl) collapse does). Cost: one
    # map-side-combinable hash agg per merge.
    uniq_docstats = (
        seg_docstats.groupBy("doc_id", "shard")
        .agg(F.max_by("dl", F.struct(F.col("seg"), F.col("dl"))).alias("dl"))
        .select("doc_id", "dl", "shard")
    )
    # corpus stats piggyback on the doc_stats write (one job, no rescan)
    obs = Observation("merge-corpus-stats")
    uniq_docstats.observe(
        obs, F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).write.mode("overwrite").parquet(f"{path}/doc_stats")
    stats = obs.get
    spark.createDataFrame(
        [(int(stats["n_docs"]), float(stats["avgdl"]))], "n_docs long, avgdl double"
    ).write.mode("overwrite").parquet(f"{path}/corpus_stats")
    dl = spark.read.parquet(f"{path}/doc_stats")

    written = spark.read.parquet(f"{path}/postings")
    written.groupBy("term").agg(F.sum("n_docs").alias("df")).withColumn(
        "rterm", F.reverse(F.col("term"))
    ).write.mode("overwrite").parquet(f"{path}/term_stats")

    from ..operators.postings import lineage_manifest  # noqa: PLC0415

    lineage_manifest(written, dl).write.mode("overwrite").parquet(f"{path}/manifest")
    return InvertedIndex.load(spark, path)


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    path: str,
    n_shards: int | None = 8,
    block_size: int = BLOCK_SIZE,
    resume: bool = True,
    n_salts: int = 1,
    positional: bool = False,
) -> InvertedIndex:
    """Full job: incremental segment build (resumable) + merge.
    ``n_salts`` MUST match between segment builds and merges (block
    ranges align to salt buckets). ``positional=True`` builds the
    phrase/proximity-capable index (position streams ride every
    segment and the merge). ``n_shards=None`` auto-sizes shards from
    the corpus (``sized_shards``)."""
    build_incremental(
        spark, pages, path, n_shards, block_size, resume, n_salts=n_salts,
        positional=positional,
    )
    return merge_segments(spark, path, block_size, n_salts=n_salts)
