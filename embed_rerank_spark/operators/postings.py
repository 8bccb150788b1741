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

import os
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.codec import BLOCK_SIZE
from .bm25 import corpus_stats, doc_freqs, doc_lengths_direct, term_freqs_dl

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


def combined_table(batches: list[pa.RecordBatch]) -> pa.Table:
    """One contiguous-chunk table from a partition's record batches.

    String/binary columns are cast to their LARGE (int64-offset)
    variants first: ``pa.binary()``/``pa.string()`` carry int32
    offsets, so a hot shuffle partition whose combined payload exceeds
    2 GiB would overflow in ``combine_chunks`` — real at 10^12-doc
    scale even though sandbox partitions never get close."""
    fields = []
    for f in batches[0].schema:
        t = f.type
        if t == pa.binary():
            t = pa.large_binary()
        elif t == pa.string():
            t = pa.large_string()
        elif pa.types.is_list(t):
            # ragged columns (positional index) carry int32 offsets too
            t = pa.large_list(t.value_type)
        fields.append(pa.field(f.name, t))
    tbl = pa.Table.from_batches(batches)
    return tbl.cast(pa.schema(fields)).combine_chunks()


def _collapse_duplicate_docs(
    change: np.ndarray,
    tidx: np.ndarray,
    shard: np.ndarray,
    doc: np.ndarray,
    tf: np.ndarray,
    dl: np.ndarray,
    salt: np.ndarray | None,
):
    """Collapse duplicate (term, shard, doc_id) rows to ONE posting,
    keeping the (tf, dl) pair with the largest tf (ties: largest dl).

    Duplicates are statistically EXPECTED input, not corruption:
    ``doc_id = xxhash64(url)`` collides at 10^12 docs, and the same
    url re-crawled in two snapshots meets itself at merge. A
    fail-stop here would kill the whole build on routine data, so the
    encoder deduplicates instead (max-tf = keep the richest crawl of
    the page)."""
    n = len(doc)
    dup = np.zeros(n, dtype=bool)
    dup[1:] = (doc[1:] == doc[:-1]) & ~change[1:]
    if not dup.any():
        return change, tidx, shard, doc, tf, dl, salt
    starts = np.flatnonzero(~dup)
    # one combined key keeps (tf, dl) from the SAME source row
    key = tf.astype(np.int64) * (1 << 31) + dl.astype(np.int64)
    kmax = np.maximum.reduceat(key, starts)
    keep = (
        change[starts],
        tidx[starts],
        shard[starts],
        doc[starts],
        kmax >> 31,
        kmax & ((1 << 31) - 1),
        salt[starts] if salt is not None else None,
    )
    return keep


def encode_grouped_rows(
    terms_dict: pa.Array,
    tidx: np.ndarray,
    shard: np.ndarray,
    doc: np.ndarray,
    tf: np.ndarray,
    dl: np.ndarray,
    block_size: int,
    salt: np.ndarray | None = None,
) -> Iterator[pa.RecordBatch]:
    """Vectorized block encoder over grouped rows.

    Input: one partition's rows with groups (term, shard) CONTIGUOUS
    and doc_id strictly ascending within each group. ``terms_dict`` is
    the partition's term dictionary; ``tidx`` maps each row to it —
    term strings never round-trip through Python.

    Everything is computed array-at-a-time: group/block boundaries via
    change masks, per-block headers via ``np.{maximum,minimum}.reduceat``,
    and ONE varbyte encode of the whole partition per stream, sliced
    into per-block payloads by byte offsets (``vb_encode_with_lengths``).
    """
    from ..functions.codec import vb_encode_with_lengths  # noqa: PLC0415

    n = len(doc)
    if n == 0:
        return
    doc = np.ascontiguousarray(doc, dtype=np.int64)
    tf = np.ascontiguousarray(tf, dtype=np.int64)
    dl = np.ascontiguousarray(dl, dtype=np.int64)

    change = np.empty(n, dtype=bool)
    change[0] = True
    if n > 1:
        change[1:] = (tidx[1:] != tidx[:-1]) | (shard[1:] != shard[:-1])
        if salt is not None:
            # salt splits a hot (term, shard) into contiguous doc-id
            # RANGES; each range encodes its own blocks (block_id
            # restarts, consumers order blocks by first_doc)
            change[1:] |= salt[1:] != salt[:-1]

    # duplicate (group, doc) rows -> one posting (max tf); expected at
    # scale (hash collisions, re-crawled urls meeting at merge)
    change, tidx, shard, doc, tf, dl, salt = _collapse_duplicate_docs(
        change, tidx, shard, doc, tf, dl, salt
    )
    n = len(doc)
    gstart_idx = np.flatnonzero(change)
    gid = np.cumsum(change) - 1
    pos = np.arange(n, dtype=np.int64) - gstart_idx[gid]
    bmask = (pos % block_size) == 0
    bstarts = np.flatnonzero(bmask)
    bends = np.append(bstarts[1:], n)

    # ascending within groups (duplicates already collapsed above, so
    # a violation here means the input sort itself is broken)
    if n > 1:
        viol = (doc[1:] <= doc[:-1]) & ~change[1:]
        if viol.any():
            raise ValueError("doc ids must be strictly ascending within groups")

    from ..functions.codec import _bias  # noqa: PLC0415

    u = _bias(doc)
    delta = np.empty(n, dtype=np.uint64)
    if n > 1:
        np.subtract(u[1:], u[:-1], out=delta[1:])
    delta[bstarts] = u[bstarts]

    docs_stream, docs_nb = vb_encode_with_lengths(delta)
    tfs_stream, tfs_nb = vb_encode_with_lengths(tf.astype(np.uint64))
    dls_stream, dls_nb = vb_encode_with_lengths(dl.astype(np.uint64))
    docs_off = np.concatenate(([0], np.cumsum(docs_nb)))
    tfs_off = np.concatenate(([0], np.cumsum(tfs_nb)))
    dls_off = np.concatenate(([0], np.cumsum(dls_nb)))

    docs_bin = [docs_stream[docs_off[s] : docs_off[e]] for s, e in zip(bstarts, bends)]
    tfs_bin = [tfs_stream[tfs_off[s] : tfs_off[e]] for s, e in zip(bstarts, bends)]
    dls_bin = [dls_stream[dls_off[s] : dls_off[e]] for s, e in zip(bstarts, bends)]

    yield pa.RecordBatch.from_arrays(
        [
            # header rows are ~1/block_size of the input, so they fit
            # int32 offsets even when the input needed large_string
            pc.take(terms_dict, pa.array(tidx[bstarts], type=pa.int64())).cast(pa.string()),
            pa.array(shard[bstarts].astype(np.int32)),
            pa.array((pos[bstarts] // block_size).astype(np.int32)),
            pa.array(doc[bstarts]),
            pa.array(doc[bends - 1]),
            pa.array((bends - bstarts).astype(np.int32)),
            pa.array(np.maximum.reduceat(tf, bstarts).astype(np.int32)),
            pa.array(np.minimum.reduceat(dl, bstarts).astype(np.int32)),
            pa.array(docs_bin, type=pa.binary()),
            pa.array(tfs_bin, type=pa.binary()),
            pa.array(dls_bin, type=pa.binary()),
        ],
        schema=_ARROW_OUT,
    )


def _encode_partition(
    batches: Iterator[pa.RecordBatch], block_size: int, n_salts: int = 1
):
    """Vectorized encoder over one partition of (shard, term, doc_id,
    tf, dl) rows sorted by (term, shard, doc_id).

    The partition is materialized once (a shuffle partition is sized to
    fit executor memory by construction — `spark.sql.shuffle.partitions`
    / AQE own that invariant), then encoded array-at-a-time by
    ``encode_grouped_rows``: no per-group Python, no per-row ``as_py``.
    """
    batch_list = [b for b in batches if b.num_rows > 0]
    if not batch_list:
        return
    tbl = combined_table(batch_list)
    dict_enc = pc.dictionary_encode(tbl.column("term").chunk(0))
    tidx = dict_enc.indices.to_numpy(zero_copy_only=False)
    terms_dict = dict_enc.dictionary
    shard = tbl.column("shard").chunk(0).to_numpy(zero_copy_only=False)
    doc = tbl.column("doc_id").chunk(0).to_numpy(zero_copy_only=False)
    tf = tbl.column("tf").chunk(0).to_numpy(zero_copy_only=False)
    dl = tbl.column("dl").chunk(0).to_numpy(zero_copy_only=False)
    salt = None
    if n_salts > 1 and "salt" in tbl.schema.names:
        salt = tbl.column("salt").chunk(0).to_numpy(zero_copy_only=False)
    yield from encode_grouped_rows(
        terms_dict, tidx, shard, doc, tf, dl, block_size, salt=salt
    )


def shard_expr(doc_col, n_shards: int):
    """Doc shard assignment (engine constant semantics)."""
    return F.pmod(doc_col, F.lit(n_shards)).cast("int")


def pow2_salts(n_salts: int) -> int:
    """Salt counts round UP to a power of two: each salt value must be
    exactly one contiguous doc-id range, or encoded runs would overlap
    and break WAND's ordered-block skipping."""
    return 1 << max(0, (n_salts - 1).bit_length())


def salt_expr(doc_col, n_salts: int):
    """Hot-term salt = doc-id RANGE bucket (top bits of the
    sign-biased id, so buckets ascend in signed doc order and each
    bucket is one contiguous range). Splits a (term, shard) posting
    list into independently-encoded runs: at 10^12 docs a df~N term
    costs a task df/(n_shards*n_salts) postings instead of
    df/n_shards. xxhash64 doc ids are uniform, so range buckets are
    balanced. ``n_salts`` must come from ``pow2_salts``."""
    bits = (n_salts - 1).bit_length()
    if n_salts == 1:
        return F.lit(0).cast("int")
    biased = F.col(doc_col) if isinstance(doc_col, str) else doc_col
    biased = biased.bitwiseXOR(F.lit(-(2**63)))
    return F.shiftrightunsigned(biased, 64 - bits).cast("int")


def build_postings(
    docs: DataFrame,
    n_shards: int = 8,
    block_size: int = BLOCK_SIZE,
    num_partitions: int | None = None,
    n_salts: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """Build the full index from a document table.

    Returns dict of DataFrames: postings, term_stats, doc_stats,
    corpus_stats. Nothing is materialized until written/consumed.
    ``n_salts > 1`` (rounded up to a power of two) additionally
    range-splits each (term, shard) group so no single encode task
    owns more than df/(n_shards*n_salts) postings of a hot term.
    """
    n_salts = pow2_salts(n_salts)
    tfdl = term_freqs_dl(docs, id_col, text_col).withColumn(
        "shard", shard_expr(F.col("doc_id"), n_shards)
    ).withColumn("salt", salt_expr(F.col("doc_id"), n_salts))

    n_parts = num_partitions or max(
        n_shards, docs.sparkSession.sparkContext.defaultParallelism
    )
    # hash by (shard, term, salt) — a hot term spreads over doc shards
    # AND range salts — but SORT by (term, shard, doc_id): row groups
    # in the written parquet are then term-ordered, so query-time
    # ``term IN (...)`` pushdown skips row groups by min/max stats.
    # (salt ranges ascend with doc_id, so the sort keeps each salt run
    # contiguous without naming it.)
    sorted_rows = tfdl.repartition(
        n_parts, "shard", "term", "salt"
    ).sortWithinPartitions("term", "shard", "doc_id")
    postings = sorted_rows.mapInArrow(
        lambda it: _encode_partition(it, block_size, n_salts), POSTINGS_SCHEMA
    )

    term_stats = doc_freqs(tfdl)
    dl = doc_lengths_direct(docs, id_col, text_col)
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


def write_shard_files(postings: DataFrame, path: str) -> None:
    """Write postings in the SHARD-FILE serving layout: hash-partition
    the encoded block rows by doc shard (every shard lands whole in
    exactly one file; hash collisions merely co-locate two shards in
    one file, which readers handle) and keep rows (shard, term)-sorted
    so row groups stay term-prunable. A ``LAYOUT.json`` marker records
    the guarantee.

    Why: with whole-shard files, the query path can run its per-shard
    kernel DIRECTLY on the term-filtered scan — no repartition —
    saving a shuffle + a stage per batch (see ``shard_partitioned``).
    Cost: one extra shuffle of the compressed blocks at build time
    (O(index bytes), once), which every query batch then skips. Hash
    (not range) partitioning avoids RangePartitioner's sampling pass,
    which would re-run the whole encode pipeline."""
    import json  # noqa: PLC0415

    n_parts = postings.sparkSession.sparkContext.defaultParallelism * 4
    (
        postings.repartition(n_parts, "shard")
        .sortWithinPartitions("shard", "term", "first_doc", "block_id")
        .write.mode("overwrite")
        .parquet(f"{path}/postings")
    )
    with open(f"{path}/LAYOUT.json", "w") as f:
        json.dump({"postings": "shard_files"}, f)


def write_index(index: dict[str, DataFrame], path: str) -> None:
    write_shard_files(index["postings"], path)
    # rterm = reversed term (Lucene's reversed-term field): turns a
    # leading-wildcard *suffix into a pushdown-able prefix scan
    index["term_stats"].withColumn("rterm", F.reverse(F.col("term"))).write.mode(
        "overwrite"
    ).parquet(f"{path}/term_stats")
    index["doc_stats"].write.mode("overwrite").parquet(f"{path}/doc_stats")
    index["corpus_stats"].write.mode("overwrite").parquet(f"{path}/corpus_stats")
    # lineage from the WRITTEN postings (reflects what actually landed)
    spark = index["postings"].sparkSession
    written = spark.read.parquet(f"{path}/postings")
    dstats = spark.read.parquet(f"{path}/doc_stats")
    lineage_manifest(written, dstats).write.mode("overwrite").parquet(f"{path}/manifest")


_BYTE_SUFFIX = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_bytes(v: str) -> int:
    """Spark byte-conf parser subset: plain ints are bytes; '128m'
    style suffixes scale (enough for the file-split confs)."""
    s = str(v).strip().lower().removesuffix("b")
    if s and s[-1] in _BYTE_SUFFIX:
        return int(float(s[:-1]) * _BYTE_SUFFIX[s[-1]])
    return int(s)


def shard_partitioned(index: "InvertedIndex", filtered: DataFrame, n_parts: int) -> DataFrame:
    """Arrange the term-filtered postings so each task sees WHOLE doc
    shards — the invariant every per-shard query kernel needs.

    Fast path (``whole_shard_scan_ok``): the on-disk shard-file layout
    already guarantees it, so the kernel runs directly on the scan —
    no exchange, one stage fewer per batch. Fallback: RANGE
    repartition by shard with an explicit partition count (range, not
    hash: hash collides shard ids and piles several shards onto one
    task; explicit count so AQE can't coalesce the scoring onto one
    core)."""
    if index.whole_shard_scan_ok():
        return filtered
    return filtered.repartitionByRange(n_parts, "shard")


def version_arrays(vers: tuple | None) -> tuple[np.ndarray, np.ndarray] | None:
    """Closure-shipped ``doc_versions`` pair -> (sorted doc_ids int64,
    newest seg per doc int64) NumPy arrays, converted once per task."""
    if not vers or not vers[0]:
        return None
    return (
        np.asarray(vers[0], dtype=np.int64),
        np.asarray(vers[1], dtype=np.int64),
    )


def version_keep(
    docs: np.ndarray, seg, vdocs: np.ndarray, vsegs: np.ndarray
) -> np.ndarray:
    """Newest-wins mask for one decoded posting run: True where the
    doc either has no newer crawl (absent from the version map) or
    this run's unit IS its newest (``vsegs[doc] == seg``). ``seg`` is
    a scalar (one run = one unit) or a per-row array (merge kernels).
    One searchsorted over the run — vectorized, no per-row Python."""
    idx = np.searchsorted(vdocs, docs)
    idx_c = np.minimum(idx, len(vdocs) - 1)
    hit = vdocs[idx_c] == docs
    keep = np.ones(len(docs), dtype=bool)
    seg_hit = seg[hit] if isinstance(seg, np.ndarray) else seg
    keep[hit] = vsegs[idx_c[hit]] == seg_hit
    return keep


@dataclass
class InvertedIndex:
    """Handle over an on-disk index.

    ``df_for_terms`` memoizes term -> document-frequency lookups on the
    handle (the dictionary cache every query engine keeps): repeated /
    overlapping query batches skip the term_stats scan for known terms.
    Only QUERIED terms are cached — the full vocabulary never
    materializes on the driver.
    """

    postings: DataFrame
    term_stats: DataFrame
    doc_stats: DataFrame
    n_docs: int
    avgdl: float
    _df_cache: dict = None  # term -> df (lazily populated)
    # deletion tombstones (LSM deletes not yet folded in by compaction):
    # query operators mask these doc ids from results; corpus/term
    # stats keep counting them until compaction physically removes the
    # postings (the standard deleted-docs visibility model)
    tombstones: frozenset = None
    # newest-wins doc versions across LSM units (re-crawled urls not
    # yet collapsed by compaction): (sorted doc_ids, newest unit seg
    # ordinal per doc), only for docs present in >1 live unit. Query
    # kernels drop a doc's postings from every OLDER unit at decode
    # time, so a re-crawled page is scored once, from its newest
    # content; corpus/term stats keep counting the stale crawl until
    # compaction physically folds it in (same drift model as
    # tombstones / Lucene docCount-with-deletes)
    doc_versions: tuple = None
    # on-disk layout guarantee from write_shard_files (LAYOUT.json):
    # every doc shard's postings live whole in one parquet file, so
    # the query path may skip its per-batch repartition when the
    # planner provably won't split files (whole_shard_scan_ok)
    shard_files: bool = False
    _scan_ok: bool = None  # memoized whole_shard_scan_ok verdict

    def whole_shard_scan_ok(self) -> bool:
        """True when the per-shard query kernels may run DIRECTLY on
        the term-filtered postings scan — no repartition — because
        every scan task is guaranteed to see whole doc shards:

        - the index was written shard-file (``shard_files`` marker).
          Multi-unit tiered views qualify too: ``load_tiered`` sets
          the flag only when EVERY unit is shard-file laid out and
          newest-wins versioning is active — a doc's live postings
          then sit whole in one (shard, unit) file and a re-crawled
          doc's stale copies are version-masked in whichever task
          they land, so per-task top-k stays exact without
          co-locating units;
        - no file exceeds Spark's effective max split size, so the
          file bin-packer can PACK files onto tasks (safe: shards stay
          whole) but never SPLIT one (unsafe: a doc's terms could land
          in two tasks and its score would split). The split bound is
          re-derived from the session confs with Spark's own formula,
          and belt-checked against the planned partition count.

        Skipping the shuffle removes one exchange + one stage from
        every query batch — the dominant fixed cost at small batch
        sizes (measured: 64-query WAND batch 1.03s -> 0.62s at sf0.1).
        Falls back to the repartition path whenever any guarantee is
        unverifiable (e.g. non-local filesystem)."""
        if not self.shard_files:
            return False
        if self._scan_ok is not None:
            return self._scan_ok
        ok = False
        try:
            files = self.postings.inputFiles()
            if files and all(f.startswith("file:") for f in files):
                from urllib.parse import unquote, urlparse  # noqa: PLC0415

                sizes = [
                    os.path.getsize(unquote(urlparse(f).path)) for f in files
                ]
                spark = self.postings.sparkSession
                conf = spark.conf
                maxpb = _parse_bytes(
                    conf.get("spark.sql.files.maxPartitionBytes", "134217728")
                )
                open_cost = _parse_bytes(
                    conf.get("spark.sql.files.openCostInBytes", "4194304")
                )
                # Spark's per-scan split size is
                # min(maxPartitionBytes, max(openCostInBytes,
                # bytesPerCore)); bytesPerCore varies per relation (a
                # tiered view unions several scans), but the bound
                # below is a LOWER bound for every scan, so a file
                # under it can never be split anywhere
                max_split_lb = min(maxpb, open_cost)
                ok = max(sizes) <= max_split_lb
                if ok:
                    # belt: the planner must not have split any file
                    ok = self.postings.rdd.getNumPartitions() <= len(files)
        except Exception:
            ok = False
        self._scan_ok = ok
        return ok

    _df_complete: bool = False  # preload_dictionary loaded ALL terms

    def df_for_terms(self, terms: set[str]) -> dict[str, int]:
        if self._df_cache is None:
            self._df_cache = {}
        if self._df_complete:
            return {t: self._df_cache.get(t, 0) for t in terms}
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            rows = self.term_stats.filter(F.col("term").isin(missing)).collect()
            for r in rows:
                self._df_cache[r["term"]] = r["df"]
            for t in missing:  # absent from vocab -> df 0, cached too
                self._df_cache.setdefault(t, 0)
        return {t: self._df_cache[t] for t in terms}

    def preload_dictionary(self, max_terms: int = 2_000_000) -> bool:
        """Eagerly load the WHOLE term -> df dictionary onto the
        driver (one term_stats scan), so every later query batch skips
        its df-lookup job entirely — even for never-seen terms
        (a complete dictionary proves absence = df 0). ~0.3 s saved
        per cold batch, measured at sf0.1.

        Guarded by ``max_terms``: a web-scale vocabulary (hundreds of
        millions of terms) should stay on the lazy per-batch lookup —
        the default cap keeps the driver copy tens of MB. Returns
        whether the dictionary was loaded."""
        if self._df_complete:
            return True
        if self.term_stats.limit(max_terms + 1).count() > max_terms:
            return False
        if self._df_cache is None:
            self._df_cache = {}
        for r in self.term_stats.select("term", "df").collect():
            self._df_cache[r["term"]] = r["df"]
        self._df_complete = True
        return True

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "InvertedIndex":
        import json  # noqa: PLC0415

        cs = spark.read.parquet(f"{path}/corpus_stats").collect()[0]
        shard_files = False
        layout = f"{path}/LAYOUT.json"
        if os.path.exists(layout):
            with open(layout) as f:
                shard_files = json.load(f).get("postings") == "shard_files"
        return cls(
            postings=spark.read.parquet(f"{path}/postings"),
            term_stats=spark.read.parquet(f"{path}/term_stats"),
            doc_stats=spark.read.parquet(f"{path}/doc_stats"),
            n_docs=cs["n_docs"],
            avgdl=float(cs["avgdl"]),
            shard_files=shard_files,
        )
