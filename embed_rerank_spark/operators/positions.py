"""Positional inverted index + exact phrase top-k retrieval.

Extends the block-compressed posting format (``operators/postings.py``)
with a fourth payload stream per block: token POSITIONS. Layout:

- per posting (term, doc), the term's occurrence positions (0-based
  token indexes from ``tokenize_for_scoring``) are strictly ascending;
  they are delta-encoded (first value absolute) and varbyte-compressed
  into one stream per block, concatenated in posting order. The
  per-posting slice widths are the tf values already stored in
  ``tfs_bin``, so positions add ZERO header overhead — decoding tfs
  first yields the offsets.
- everything else (block headers, doc-delta encoding, sharding, salt
  ranges, sort order) is identical to the non-positional index, so the
  positional postings remain a valid input to ``wand_topk`` (the extra
  ``pos_bin`` column is simply ignored there).

Phrase semantics (the engine's pinned contract, mirrored by the DuckDB
oracle in ``__spark_entry__.py``):

- a document MATCHES phrase [t0..tm-1] iff its token stream contains
  the tokens consecutively, i.e. exists p with pos(ti) ∋ p+i for all i
  — equivalently the single-space-joined token string contains
  ``" t0 t1 .. tm-1 "`` (tokens carry no whitespace), which is what
  the oracle checks with LIKE.
- matching docs are scored with the standard Okapi BM25 sum over the
  phrase's UNIQUE terms (same formula/constants as ``operators/bm25``)
  and ranked with the engine tie semantics (rounded score desc,
  doc_id asc).

Scale notes (100 TB): the postings scan is filtered to the phrase's
terms (parquet predicate pushdown — only those blocks are read); each
doc-shard resolves phrases locally inside one ``mapInArrow`` stage
(candidate intersection starts from the rarest term, so the composite
(doc, pos-i) key sets stay bounded by the rarest term's postings), and
the shard-local top-k rows that reach the global window are tiny
(n_shards x n_queries x k). No reference analogue (the reference has
no index; SURVEY.md §2.6 extension).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1
from ..functions.codec import BLOCK_SIZE, _bias, vb_decode, vb_encode_with_lengths
from ..functions.udfs import tokenize_for_scoring
from .bm25 import corpus_stats, doc_freqs, doc_lengths_direct, topk
from .postings import (
    InvertedIndex,
    combined_table,
    pow2_salts,
    salt_expr,
    shard_expr,
    shard_partitioned,
)

POSITIONAL_SCHEMA = (
    "term string, shard int, block_id int, first_doc long, last_doc long, "
    "n_docs int, max_tf int, min_dl int, "
    "docs_bin binary, tfs_bin binary, dls_bin binary, pos_bin binary"
)

_ARROW_OUT_POS = pa.schema(
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
        ("pos_bin", pa.binary()),
    ]
)


def term_positions(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf, dl, positions) in ONE aggregation — the
    positional analogue of ``bm25.term_freqs_dl``: dl rides along on
    every exploded row, positions collect per (doc, term) and sort
    (``collect_list`` order is shuffle-nondeterministic; ``sort_array``
    pins it). Position = 0-based index in the scoring-token stream."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_for_scoring(F.col(text_col)).alias("toks"),
    )
    return (
        toks.select(
            "doc_id",
            F.size("toks").alias("dl"),
            F.posexplode("toks").alias("pos", "term"),
        )
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.first("dl").alias("dl"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    )


def segment_cumsum(vals: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Decode a concatenated delta stream holding many segments (first
    value of each segment absolute, NO sign bias — positions are small
    non-negative ints) in one vectorized pass."""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    s = np.asarray(starts, dtype=np.int64)
    if len(v) == 0:
        return np.empty(0, dtype=np.int64)
    c = np.cumsum(v, dtype=np.uint64)
    prior = np.where(s > 0, c[np.maximum(s, 1) - 1], np.uint64(0))
    reps = np.diff(np.append(s, len(v)))
    return (c - np.repeat(prior, reps)).astype(np.int64)


def _winner_rows(change: np.ndarray, doc: np.ndarray, tf: np.ndarray, dl: np.ndarray):
    """When duplicate (group, doc_id) rows exist, pick one row per
    duplicate run — the row with the largest (tf, dl) — the same
    max-tf collapse the non-positional encoder applies
    (``postings._collapse_duplicate_docs``), but returning INDEXES so
    the ragged positions column can be gathered too.

    Returns (starts, winners): ``starts`` are run-start indexes (whose
    change/term/shard/doc/salt values identify the run), ``winners``
    the same-length indexes of the max-(tf, dl) row within each run
    (source of tf, dl, positions). Identical arrays when no dups."""
    n = len(doc)
    dup = np.zeros(n, dtype=bool)
    dup[1:] = (doc[1:] == doc[:-1]) & ~change[1:]
    idx = np.arange(n, dtype=np.int64)
    if not dup.any():
        return idx, idx
    seg = np.cumsum(~dup) - 1  # duplicate-run id per row
    key = tf.astype(np.int64) * (1 << 31) + dl.astype(np.int64)
    starts = np.flatnonzero(~dup)
    kmax = np.maximum.reduceat(key, starts)
    cand = np.flatnonzero(key == kmax[seg])  # rows attaining their run max
    _, first = np.unique(seg[cand], return_index=True)
    return starts, cand[first]


def encode_grouped_rows_pos(
    terms_dict: pa.Array,
    tidx: np.ndarray,
    shard: np.ndarray,
    doc: np.ndarray,
    tf: np.ndarray,
    dl: np.ndarray,
    pos_flat: np.ndarray,
    pos_offsets: np.ndarray,
    block_size: int,
    salt: np.ndarray | None = None,
) -> Iterator[pa.RecordBatch]:
    """Vectorized positional block encoder: the positional counterpart
    of ``postings.encode_grouped_rows`` — identical group/block logic
    plus one positions stream per block. ``pos_flat``/``pos_offsets``
    are the ragged positions column (offsets length n+1)."""
    n = len(doc)
    if n == 0:
        return
    doc = np.ascontiguousarray(doc, dtype=np.int64)
    tf = np.ascontiguousarray(tf, dtype=np.int64)
    dl = np.ascontiguousarray(dl, dtype=np.int64)
    pos_flat = np.ascontiguousarray(pos_flat, dtype=np.int64)
    pos_offsets = np.ascontiguousarray(pos_offsets, dtype=np.int64)

    change = np.empty(n, dtype=bool)
    change[0] = True
    if n > 1:
        change[1:] = (tidx[1:] != tidx[:-1]) | (shard[1:] != shard[:-1])
        if salt is not None:
            change[1:] |= salt[1:] != salt[:-1]

    starts, winners = _winner_rows(change, doc, tf, dl)
    if len(starts) != n:
        # run identity (group flags, term, shard, doc) comes from the
        # run START; tf/dl/positions from the max-(tf, dl) WINNER row
        counts = pos_offsets[winners + 1] - pos_offsets[winners]
        cum = np.concatenate(([0], np.cumsum(counts)))
        flat_idx = np.repeat(pos_offsets[winners], counts) + (
            np.arange(int(counts.sum())) - np.repeat(cum[:-1], counts)
        )
        pos_flat = pos_flat[flat_idx]
        pos_offsets = cum
        change, tidx, shard, doc = (
            change[starts], tidx[starts], shard[starts], doc[starts]
        )
        tf, dl = tf[winners], dl[winners]
        if salt is not None:
            salt = salt[starts]
        n = len(doc)

    if (pos_offsets[1:] - pos_offsets[:-1] != tf).any():
        raise ValueError("positions count must equal tf per posting")

    gstart_idx = np.flatnonzero(change)
    gid = np.cumsum(change) - 1
    pos_in_group = np.arange(n, dtype=np.int64) - gstart_idx[gid]
    bmask = (pos_in_group % block_size) == 0
    bstarts = np.flatnonzero(bmask)
    bends = np.append(bstarts[1:], n)

    if n > 1:
        viol = (doc[1:] <= doc[:-1]) & ~change[1:]
        if viol.any():
            raise ValueError("doc ids must be strictly ascending within groups")

    u = _bias(doc)
    delta = np.empty(n, dtype=np.uint64)
    if n > 1:
        np.subtract(u[1:], u[:-1], out=delta[1:])
    delta[bstarts] = u[bstarts]

    # positions: delta within each POSTING (reset at every row start)
    npos = len(pos_flat)
    pdelta = np.empty(npos, dtype=np.uint64)
    if npos:
        pf = pos_flat.astype(np.uint64)
        pdelta[1:] = pf[1:] - pf[:-1]
        row_starts = pos_offsets[:-1][tf > 0]
        pdelta[row_starts] = pf[row_starts]

    docs_stream, docs_nb = vb_encode_with_lengths(delta)
    tfs_stream, tfs_nb = vb_encode_with_lengths(tf.astype(np.uint64))
    dls_stream, dls_nb = vb_encode_with_lengths(dl.astype(np.uint64))
    pos_stream, pos_nb = vb_encode_with_lengths(pdelta)
    docs_off = np.concatenate(([0], np.cumsum(docs_nb)))
    tfs_off = np.concatenate(([0], np.cumsum(tfs_nb)))
    dls_off = np.concatenate(([0], np.cumsum(dls_nb)))
    pos_byte_off = np.concatenate(([0], np.cumsum(pos_nb)))

    docs_bin = [docs_stream[docs_off[s] : docs_off[e]] for s, e in zip(bstarts, bends)]
    tfs_bin = [tfs_stream[tfs_off[s] : tfs_off[e]] for s, e in zip(bstarts, bends)]
    dls_bin = [dls_stream[dls_off[s] : dls_off[e]] for s, e in zip(bstarts, bends)]
    # block b's positions span value range [pos_offsets[bstart], pos_offsets[bend])
    pos_bin = [
        pos_stream[pos_byte_off[pos_offsets[s]] : pos_byte_off[pos_offsets[e]]]
        for s, e in zip(bstarts, bends)
    ]

    yield pa.RecordBatch.from_arrays(
        [
            pc.take(terms_dict, pa.array(tidx[bstarts], type=pa.int64())).cast(pa.string()),
            pa.array(shard[bstarts].astype(np.int32)),
            pa.array((pos_in_group[bstarts] // block_size).astype(np.int32)),
            pa.array(doc[bstarts]),
            pa.array(doc[bends - 1]),
            pa.array((bends - bstarts).astype(np.int32)),
            pa.array(np.maximum.reduceat(tf, bstarts).astype(np.int32)),
            pa.array(np.minimum.reduceat(dl, bstarts).astype(np.int32)),
            pa.array(docs_bin, type=pa.binary()),
            pa.array(tfs_bin, type=pa.binary()),
            pa.array(dls_bin, type=pa.binary()),
            pa.array(pos_bin, type=pa.binary()),
        ],
        schema=_ARROW_OUT_POS,
    )


def _encode_partition_pos(
    batches: Iterator[pa.RecordBatch], block_size: int, n_salts: int = 1
):
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
    plist = tbl.column("positions").chunk(0)
    # large_list after combined_table's cast? positions is list<int>;
    # ListArray/LargeListArray both expose offsets + values
    pos_offsets = np.asarray(plist.offsets)
    pos_flat = np.asarray(plist.values)
    # offsets may not start at 0 after slicing; normalize
    base = pos_offsets[0]
    if base != 0:
        pos_offsets = pos_offsets - base
        pos_flat = pos_flat[base : base + pos_offsets[-1]]
    salt = None
    if n_salts > 1 and "salt" in tbl.schema.names:
        salt = tbl.column("salt").chunk(0).to_numpy(zero_copy_only=False)
    yield from encode_grouped_rows_pos(
        terms_dict, tidx, shard, doc, tf, dl,
        pos_flat.astype(np.int64), pos_offsets.astype(np.int64),
        block_size, salt=salt,
    )


def build_positional_postings(
    docs: DataFrame,
    n_shards: int = 8,
    block_size: int = BLOCK_SIZE,
    num_partitions: int | None = None,
    n_salts: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """Positional analogue of ``postings.build_postings``: same plan
    shape (one tf hash-agg -> repartition (shard, term, salt) -> sort
    (term, shard, doc_id) -> one Arrow encode stage), one extra ragged
    column through the shuffle and one extra payload stream per block."""
    n_salts = pow2_salts(n_salts)
    tp = term_positions(docs, id_col, text_col).withColumn(
        "shard", shard_expr(F.col("doc_id"), n_shards)
    ).withColumn("salt", salt_expr(F.col("doc_id"), n_salts))

    n_parts = num_partitions or max(
        n_shards, docs.sparkSession.sparkContext.defaultParallelism
    )
    sorted_rows = tp.repartition(
        n_parts, "shard", "term", "salt"
    ).sortWithinPartitions("term", "shard", "doc_id")
    postings = sorted_rows.mapInArrow(
        lambda it: _encode_partition_pos(it, block_size, n_salts), POSITIONAL_SCHEMA
    )

    term_stats = doc_freqs(tp)
    dl = doc_lengths_direct(docs, id_col, text_col)
    doc_stats = dl.withColumn("shard", shard_expr(F.col("doc_id"), n_shards))
    cstats = corpus_stats(dl)
    return {
        "postings": postings,
        "term_stats": term_stats,
        "doc_stats": doc_stats,
        "corpus_stats": cstats,
    }


def load_positional_index(built: dict[str, DataFrame]) -> InvertedIndex:
    """InvertedIndex handle over positional postings (the extra
    ``pos_bin`` column is carried along; WAND ignores it)."""
    cs = built["corpus_stats"].collect()[0]
    return InvertedIndex(
        postings=built["postings"],
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )


def decode_positional_block(
    docs_bin: bytes, tfs_bin: bytes, dls_bin: bytes, pos_bin: bytes, n_docs: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """-> (docs, tfs, dls, pos_flat, pos_offsets[len n_docs+1])."""
    from ..functions.codec import decode_block  # noqa: PLC0415

    docs, tfs, dls = decode_block(docs_bin, tfs_bin, dls_bin, n_docs)
    offsets = np.concatenate(([0], np.cumsum(tfs)))
    deltas = vb_decode(pos_bin, int(offsets[-1]))
    pos_flat = segment_cumsum(deltas, offsets[:-1][tfs > 0])
    return docs, tfs, dls, pos_flat, offsets


_MAXPOS = 1 << 32  # composite (candidate, adjusted-position) key radix


def _ragged_gather(
    starts: np.ndarray, counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Flat indexes selecting ragged runs [starts_i, starts_i+counts_i)
    plus each selected element's run id — the standard vectorized
    ragged gather."""
    total = int(counts.sum())
    run_id = np.repeat(np.arange(len(counts)), counts)
    cum = np.concatenate(([0], np.cumsum(counts)))
    flat = np.repeat(starts, counts) + (np.arange(total) - np.repeat(cum[:-1], counts))
    return flat, run_id


def _phrase_match_score(
    termdata: dict[str, tuple],
    tokens: list[str],
    idf: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    match_tokens: list[str] | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One shard, one phrase: -> (matching doc_ids, BM25 scores,
    first occurrence positions).

    ``termdata[t]`` = (docs asc, tfs, dls, pos_flat, pos_offsets).
    Intersects candidate docs across the phrase's unique terms
    (rarest-first keeps intermediate sets bounded by the rarest term),
    then verifies adjacency with composite (candidate, pos - i) keys —
    all NumPy set ops, no per-doc Python loop.

    ``match_tokens`` (the next-word path): adjacency is verified over
    THESE streams instead — bigram supertokens whose positions are the
    first token's position, so a match is positions aligning at
    consecutive offsets exactly as for unigrams — while BM25 still
    scores the unique ``tokens`` (unigrams, whose termdata may have
    positions skipped at decode)."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0), np.empty(0, dtype=np.int64))
    uniq = list(dict.fromkeys(tokens))
    mtoks = match_tokens if match_tokens is not None else tokens
    uniq_m = list(dict.fromkeys(mtoks))
    if any(t not in termdata for t in uniq) or any(
        t not in termdata for t in uniq_m
    ):
        return empty
    # candidate docs: intersection over unique match terms, smallest first
    order = sorted(uniq_m, key=lambda t: len(termdata[t][0]))
    cand = termdata[order[0]][0]
    for t in order[1:]:
        cand = np.intersect1d(cand, termdata[t][0], assume_unique=True)
        if cand.size == 0:
            return empty

    keys: np.ndarray | None = None
    for i, t in enumerate(mtoks):
        docs_t, tfs_t, _dls_t, pf, po = termdata[t]
        rows = np.searchsorted(docs_t, cand)
        flat_idx, ci = _ragged_gather(po[rows], tfs_t[rows])
        adj = pf[flat_idx] - i
        ok = adj >= 0
        k_i = ci[ok] * _MAXPOS + adj[ok]
        keys = k_i if keys is None else np.intersect1d(keys, k_i, assume_unique=True)
        if keys.size == 0:
            return empty

    # keys are sorted composite (ci, start-pos) pairs: the FIRST key of
    # each ci run is that doc's earliest phrase occurrence
    kci = keys // _MAXPOS
    run_start = np.empty(len(kci), dtype=bool)
    run_start[:1] = True
    run_start[1:] = kci[1:] != kci[:-1]
    match_ci = kci[run_start]
    first_pos = (keys % _MAXPOS)[run_start]
    match_docs = cand[match_ci]
    # BM25 over the phrase's unique terms, restricted to matching docs
    scores = np.zeros(len(match_docs))
    for t in uniq:
        docs_t, tfs_t, dls_t, _pf, _po = termdata[t]
        rows = np.searchsorted(docs_t, match_docs)
        tf = tfs_t[rows].astype(np.float64)
        dl = dls_t[rows].astype(np.float64)
        scores += idf[t] * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * dl / avgdl)
        )
    return match_docs, scores, first_pos


def _sort_dedupe_termdata(
    docs: np.ndarray,
    tf: np.ndarray,
    dl: np.ndarray,
    pf: np.ndarray,
    po: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Restore the sorted-unique-docs invariant after concatenating a
    term's blocks from MULTIPLE index units (tiered query view): unit
    doc ranges interleave, and a re-crawled url can appear in two
    units. Sort by doc (stable), then collapse duplicate docs to the
    max-(tf, dl) row — the same winner rule as the merge encoder —
    gathering each winner's ragged positions."""
    n = len(docs)
    if n > 1 and (docs[1:] <= docs[:-1]).any():
        perm = np.argsort(docs, kind="stable")
        docs, tf, dl = docs[perm], tf[perm], dl[perm]
        flat_idx, _ = _ragged_gather(po[:-1][perm], tf)
        pf = pf[flat_idx]
        po = np.concatenate(([0], np.cumsum(tf)))
        change = np.ones(n, dtype=bool)  # single (term, shard) group
        change[1:] = False
        change[0] = True
        starts, winners = _winner_rows(change, docs, tf, dl)
        if len(starts) != n:
            counts = po[winners + 1] - po[winners]
            flat_idx, _ = _ragged_gather(po[winners], counts)
            pf = pf[flat_idx]
            docs, tf, dl = docs[starts], tf[winners], dl[winners]
            po = np.concatenate(([0], np.cumsum(tf)))
    return docs, tf, dl, pf, po


def _sort_dedupe_nopos(
    docs: np.ndarray, tf: np.ndarray, dl: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """``_sort_dedupe_termdata`` for score-only terms whose position
    stream was skipped at decode: same sort + max-(tf, dl) winner
    collapse, empty positions (callers must never gather them)."""
    n = len(docs)
    if n > 1 and (docs[1:] <= docs[:-1]).any():
        perm = np.argsort(docs, kind="stable")
        docs, tf, dl = docs[perm], tf[perm], dl[perm]
        change = np.zeros(n, dtype=bool)
        change[0] = True
        starts, winners = _winner_rows(change, docs, tf, dl)
        if len(starts) != n:
            docs, tf, dl = docs[starts], tf[winners], dl[winners]
    return (
        docs,
        tf,
        dl,
        np.empty(0, dtype=np.int64),
        np.zeros(len(docs) + 1, dtype=np.int64),
    )


def load_termdata(
    batches: Iterator[pa.RecordBatch],
    vers: tuple = None,
    skip_pos: frozenset[str] = frozenset(),
) -> dict[int, dict[str, tuple]]:
    """shard -> term -> (docs asc unique, tf, dl, pos_flat, pos_offs)
    from positional posting blocks: the shared decode/sort/dedupe
    loader behind the phrase, proximity, and boolean readers.
    ``vers`` (newest-wins doc versions over a multi-unit tiered view)
    drops a re-crawled doc's stale-unit postings — positions included
    — right after decode, so a phrase that only existed in the old
    crawl no longer matches. Remaining multi-unit runs are re-sorted
    and residual duplicate docs (within-unit hash collisions)
    collapsed to the max-(tf, dl) winner by ``_sort_dedupe_termdata``.

    ``skip_pos``: terms whose position streams are NOT decoded (their
    pos_flat comes back empty) — the next-word phrase path scores
    unigrams by tf/dl only, and a hot unigram's position stream is the
    single biggest decode cost it avoids."""
    from ..functions.codec import decode_block  # noqa: PLC0415
    from .postings import version_arrays, version_keep  # noqa: PLC0415

    vmask = version_arrays(vers)
    shards: dict[int, dict[str, list]] = {}
    for batch in batches:
        col = dict(zip(batch.schema.names, batch.columns))
        term_l = col["term"].to_pylist()
        shard_l = col["shard"].to_pylist()
        first_l = col["first_doc"].to_pylist()
        bid_l = col["block_id"].to_pylist()
        nd_l = col["n_docs"].to_pylist()
        docs_l = col["docs_bin"].to_pylist()
        tfs_l = col["tfs_bin"].to_pylist()
        dls_l = col["dls_bin"].to_pylist()
        pos_l = col["pos_bin"].to_pylist()
        seg_l = col["seg"].to_pylist() if "seg" in col else [0] * len(term_l)
        for sh, tm, row in zip(
            shard_l,
            term_l,
            zip(first_l, bid_l, nd_l, docs_l, tfs_l, dls_l, pos_l, seg_l),
        ):
            shards.setdefault(sh, {}).setdefault(tm, []).append(row)

    out: dict[int, dict[str, tuple]] = {}
    for sh, term_blocks in shards.items():
        termdata: dict[str, tuple] = {}
        for t, blks in term_blocks.items():
            skip = t in skip_pos
            blks.sort(key=lambda r: (r[0], r[1]))  # (first_doc, block_id)
            ds, tfs, dls, pfs = [], [], [], []
            for _fd, _bid, nd, db, tb_, lb, pb, seg in blks:
                if skip:
                    d, f, l = decode_block(db, tb_, lb, nd)
                    pflat = np.empty(0, dtype=np.int64)
                else:
                    d, f, l, pflat, _off = decode_positional_block(
                        db, tb_, lb, pb, nd
                    )
                if vmask is not None:
                    keep = version_keep(d, seg, *vmask)
                    if not keep.all():
                        if pflat.size:
                            offs = np.concatenate(([0], np.cumsum(f)))
                            keep_flat, _ = _ragged_gather(offs[:-1][keep], f[keep])
                            pflat = pflat[keep_flat]
                        d, f, l = d[keep], f[keep], l[keep]
                        if not len(d):
                            continue
                ds.append(d)
                tfs.append(f)
                dls.append(l)
                pfs.append(pflat)
            if not ds:  # every posting was a stale crawl
                continue
            tf = np.concatenate(tfs)
            if skip:
                termdata[t] = _sort_dedupe_nopos(
                    np.concatenate(ds), tf, np.concatenate(dls)
                )
            else:
                termdata[t] = _sort_dedupe_termdata(
                    np.concatenate(ds),
                    tf,
                    np.concatenate(dls),
                    np.concatenate(pfs) if pfs else np.empty(0, dtype=np.int64),
                    np.concatenate(([0], np.cumsum(tf))),
                )
        out[sh] = termdata
    return out


def _phrase_partition(
    batches: Iterator[pa.RecordBatch],
    phrases: list[tuple[int, list[str], list[str] | None]],
    k: int,
    idf: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    excl: tuple[int, ...] = (),
    vers: tuple = None,
    skip_pos: frozenset[str] = frozenset(),
):
    """One task: decode its shards' (phrase-term-only) positional
    postings once per (shard, term), answer every phrase per shard.
    Each plan row is (query_id, score_tokens, match_tokens-or-None) —
    match_tokens set = the next-word path (bigram adjacency streams,
    unigram scoring). ``excl`` (deletion tombstones) masks docs from
    results; ``vers`` (newest-wins doc versions) drops stale re-crawl
    postings at decode; ``skip_pos`` terms decode without their
    position streams (score-only unigrams in the next-word path)."""
    shards = load_termdata(batches, vers, skip_pos)
    excl_arr = np.sort(np.asarray(excl, dtype=np.int64)) if excl else None

    out_q, out_d, out_s, out_p = [], [], [], []
    for _shard, termdata in shards.items():
        for qid, tokens, mtoks in phrases:
            docs, scores, fpos = _phrase_match_score(
                termdata, tokens, idf, avgdl, k1, b, mtoks
            )
            if docs.size and excl_arr is not None:
                live = ~np.isin(docs, excl_arr)
                docs, scores, fpos = docs[live], scores[live], fpos[live]
            if docs.size == 0:
                continue
            # shard-local top-k (engine tie order) caps emitted rows
            r = np.round(scores, 6)
            order = np.lexsort((docs, -r))[:k]
            out_q.extend([qid] * len(order))
            out_d.extend(int(docs[i]) for i in order)
            out_s.extend(float(scores[i]) for i in order)
            out_p.extend(int(fpos[i]) for i in order)
    if out_q:
        yield pa.RecordBatch.from_pydict(
            {
                "query_id": out_q,
                "doc_id": out_d,
                "score": out_s,
                "first_pos": out_p,
            },
            schema=pa.schema(
                [
                    ("query_id", pa.int64()),
                    ("doc_id", pa.int64()),
                    ("score", pa.float64()),
                    ("first_pos", pa.int64()),
                ]
            ),
        )


def phrase_topk(
    index: InvertedIndex,
    phrases: list[tuple[int, str]],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, doc_id, score): exact phrase top-k over a
    POSITIONAL index (``build_positional_postings``). Docs containing
    the phrase's tokens consecutively, BM25-scored over the phrase's
    unique terms, engine tie semantics."""
    phrase_plan: list[tuple[int, list[str], list[str] | None]] = []
    all_terms: set[str] = set()
    for qid, q in phrases:
        toks = [t for t in q.strip().lower().split() if t]
        if toks:
            phrase_plan.append((qid, toks, None))
            all_terms.update(toks)

    spark = index.postings.sparkSession
    if not phrase_plan:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double, first_pos long"
        )
    n = index.n_docs
    dfs = index.df_for_terms(all_terms)
    idf = {
        t: math.log((n - d + 0.5) / (d + 0.5) + 1.0) for t, d in dfs.items() if d > 0
    }
    avgdl = index.avgdl
    excl = tuple(sorted(index.tombstones)) if index.tombstones else ()
    filtered = index.postings.filter(F.col("term").isin(list(all_terms)))
    n_parts = spark.sparkContext.defaultParallelism
    vers = index.doc_versions
    per_shard = shard_partitioned(index, filtered, n_parts).mapInArrow(
        lambda it: _phrase_partition(
            it, phrase_plan, k, idf, avgdl, k1, b, excl, vers
        ),
        "query_id long, doc_id long, score double, first_pos long",
    )
    return topk(per_shard, k).select(
        "query_id", "rank", "doc_id", "score", "first_pos"
    )


def phrase_topk_bruteforce(
    spark: SparkSession,
    docs: DataFrame,
    phrases: list[tuple[int, str]],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Oracle-grade declarative phrase top-k: phrase containment via
    the normalized token-join LIKE trick (exactly the DuckDB oracle's
    formulation), BM25 over unique phrase terms via the existing
    brute-force scorer. Pure JVM plan — used to pin ``phrase_topk``."""
    from .bm25 import bm25_scores_bruteforce, query_terms  # noqa: PLC0415

    qt = query_terms(spark, phrases)
    scored = bm25_scores_bruteforce(docs, qt, k1, b, id_col, text_col)
    norm = docs.select(
        F.col(id_col).alias("doc_id"),
        F.concat(
            F.lit(" "),
            F.concat_ws(" ", tokenize_for_scoring(F.col(text_col))),
            F.lit(" "),
        ).alias("joined"),
    )
    pdf = spark.createDataFrame(phrases, "query_id long, phrase string").select(
        "query_id",
        F.concat(
            F.lit(" "),
            F.concat_ws(" ", tokenize_for_scoring(F.col("phrase"))),
            F.lit(" "),
        ).alias("needle"),
    )
    matched = norm.crossJoin(F.broadcast(pdf)).filter(
        F.contains(F.col("joined"), F.col("needle"))
    ).select("query_id", "doc_id")
    return topk(scored.join(matched, ["query_id", "doc_id"]), k).select(
        "query_id", "rank", "doc_id", "score"
    )


# Joins the two tokens of a next-word supertoken. Control char 0x1f
# (ASCII unit separator) is not \s+ whitespace, so supertokens survive
# the scoring tokenizer, and can never appear inside a unigram token
# (unigrams were themselves produced by whitespace splitting of text
# that the extraction pipeline has already control-char-scrubbed), so
# the bigram vocabulary is disjoint from the unigram vocabulary and
# both can share one termdata namespace in the query kernels.
NEXTWORD_JOINER = "\x1f"


def bigram_supertokens(col):
    """Scoring tokens -> adjacent-pair supertoken array (length n-1):
    element i = ``tok_i + NEXTWORD_JOINER + tok_{i+1}``, so supertoken
    positions ARE first-token positions. Pure JVM expressions."""
    toks = tokenize_for_scoring(col)
    n1 = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat_ws(NEXTWORD_JOINER, a, b),
    )


def build_nextword_postings(
    docs: DataFrame,
    n_shards: int = 8,
    block_size: int = BLOCK_SIZE,
    num_partitions: int | None = None,
    n_salts: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """Next-word (bigram) positional index — Williams, Zobel & Bahle,
    "Fast Phrase Querying with Combined Indexes" (ACM TOIS 2004): one
    positional posting list per ADJACENT TOKEN PAIR, position = the
    first token's position. Phrase queries then intersect bigram
    lists, which are orders of magnitude sparser than the hot unigram
    lists that dominate phrase cost ("the a": every stopword position
    in the corpus vs only the positions where they are adjacent).

    Implementation is literally ``build_positional_postings`` over the
    supertoken stream — same one-agg tf plan, same shuffle keys, same
    encoder, same salting — so every downstream reader (termdata
    loader, tiered merge, shard-file writer) works on it unchanged.
    MUST be built with the same ``n_shards`` as the unigram index it
    accelerates: phrase kernels need both indexes' postings for a doc
    in the same shard."""
    bi = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_join(bigram_supertokens(F.col(text_col)), " ").alias("text"),
    )
    return build_positional_postings(
        bi, n_shards, block_size, num_partitions, n_salts
    )


def build_combined_phrase_index(
    docs: DataFrame,
    n_shards: int = 8,
    block_size: int = BLOCK_SIZE,
    num_partitions: int | None = None,
    n_salts: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """The paper's COMBINED index (Williams/Zobel/Bahle): one postings
    table holding the unigram positional vocabulary AND the next-word
    supertoken vocabulary (disjoint by the joiner byte), with
    term/doc/corpus stats from the UNIGRAM corpus only — so BM25 stats
    are untouched, dictionary-driven expansions (prefix/fuzzy/suggest)
    never see supertokens, and one handle serves both plain retrieval
    and the accelerated phrase path.

    Why one table instead of a sidecar index: written shard-file, a
    phrase query is ONE term-filtered scan through the shuffle-free
    whole-shard path — the two-index variant must union two scans and
    repartition, paying a shuffle per batch that the combined layout
    pays once at build."""
    uni = build_positional_postings(
        docs, n_shards, block_size, num_partitions, n_salts, id_col, text_col
    )
    bi = build_nextword_postings(
        docs, n_shards, block_size, num_partitions, n_salts, id_col, text_col
    )
    return {
        "postings": uni["postings"].unionByName(bi["postings"]),
        "term_stats": uni["term_stats"],
        "doc_stats": uni["doc_stats"],
        "corpus_stats": uni["corpus_stats"],
    }


def phrase_topk_nextword(
    index: InvertedIndex,
    nw_index: InvertedIndex | None = None,
    phrases: list[tuple[int, str]] = (),
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, doc_id, score, first_pos): exact phrase top-k
    via the next-word index — rank/score-identical to ``phrase_topk``
    (same oracle), different physical plan:

    - adjacency is verified on the n-1 bigram supertoken streams
      (sparse) instead of the n unigram position streams (dense);
    - the unigram streams are still scanned for BM25 tf/dl, but their
      position payloads are SKIPPED at decode (``skip_pos``) — for a
      stopword-heavy phrase that skip is most of the bytes;
    - single-token phrases fall back to the unigram kernel in the
      same job.

    ``index``: either a COMBINED index (``build_combined_phrase_index``
    — pass ``nw_index=None``; one term-filtered scan, shuffle-free
    whole-shard fast path) or the plain positional unigram index with
    ``nw_index`` = the ``build_nextword_postings`` sidecar over the
    SAME docs and n_shards (two scans unioned + one shard repartition
    per batch). ``index`` is the tombstones authority either way. A
    newest-wins versioned multi-unit view is the one shape this path
    declines: its per-unit doc sets differ, so single-unit bigram
    streams can't be version-masked consistently — it falls back to
    the (still exact) unigram kernel rather than silently dropping
    re-crawled matches."""
    if index.doc_versions:
        return phrase_topk(index, phrases, k, k1, b)
    phrase_plan: list[tuple[int, list[str], list[str] | None]] = []
    uni_terms: set[str] = set()
    bi_terms: set[str] = set()
    for qid, q in phrases:
        toks = [t for t in q.strip().lower().split() if t]
        if not toks:
            continue
        if len(toks) == 1:
            phrase_plan.append((qid, toks, None))
        else:
            bgs = [
                toks[i] + NEXTWORD_JOINER + toks[i + 1]
                for i in range(len(toks) - 1)
            ]
            phrase_plan.append((qid, toks, bgs))
            bi_terms.update(bgs)
        uni_terms.update(toks)

    spark = index.postings.sparkSession
    if not phrase_plan:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double, first_pos long"
        )
    n = index.n_docs
    dfs = index.df_for_terms(uni_terms)
    idf = {
        t: math.log((n - d + 0.5) / (d + 0.5) + 1.0) for t, d in dfs.items() if d > 0
    }
    avgdl = index.avgdl
    excl = tuple(sorted(index.tombstones)) if index.tombstones else ()
    vers = index.doc_versions
    # positions are only needed where adjacency is checked: on bigram
    # streams, and on unigram streams of single-token phrases
    single_tok = {t for _qid, toks, mt in phrase_plan if mt is None for t in toks}
    skip = frozenset(uni_terms - single_tok)
    n_parts = spark.sparkContext.defaultParallelism
    if nw_index is None or nw_index is index:
        # combined index: one scan, whole-shard fast path when written
        # shard-file — no per-batch shuffle
        filtered = index.postings.filter(
            F.col("term").isin(list(uni_terms | bi_terms))
        )
        per_shard_src = shard_partitioned(index, filtered, n_parts)
    else:
        filtered = index.postings.filter(
            F.col("term").isin(list(uni_terms))
        ).unionByName(
            nw_index.postings.filter(F.col("term").isin(list(bi_terms))),
            allowMissingColumns=True,
        )
        per_shard_src = filtered.repartitionByRange(n_parts, "shard")
    per_shard = per_shard_src.mapInArrow(
        lambda it: _phrase_partition(
            it, phrase_plan, k, idf, avgdl, k1, b, excl, vers, skip
        ),
        "query_id long, doc_id long, score double, first_pos long",
    )
    return topk(per_shard, k).select(
        "query_id", "rank", "doc_id", "score", "first_pos"
    )


def phrase_snippets(
    index: InvertedIndex,
    docs: DataFrame,
    phrases: list[tuple[int, str]],
    k: int = 10,
    context: int = 3,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Phrase top-k WITH highlight snippets: the positional index
    supplies each hit's first occurrence position for free (the
    adjacency keys are already sorted by position), so the snippet is
    one token-array slice on the doc join — ``context`` tokens either
    side of the phrase, single-space joined.

    Scale shape: the doc join touches only the k result rows per query
    (tiny side broadcast into the docs scan), never the corpus."""
    hits = phrase_topk(index, phrases, k, k1, b)
    phrase_len = {
        qid: len([t for t in q.strip().lower().split() if t]) for qid, q in phrases
    }
    plen = F.create_map(
        [F.lit(x) for kv in phrase_len.items() for x in kv]
    )[F.col("query_id")]
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_for_scoring(F.col(text_col)).alias("toks"),
    )
    start = F.greatest(F.lit(1), F.col("first_pos") + 1 - context)
    end = F.least(
        F.size("toks"), F.col("first_pos") + plen + context
    )
    return (
        F.broadcast(hits)
        .join(toks, "doc_id")
        .select(
            "query_id",
            "rank",
            "doc_id",
            "score",
            "first_pos",
            F.concat_ws(
                " ", F.slice("toks", start, end - start + 1)
            ).alias("snippet"),
        )
    )


def _proximity_match(
    termdata: dict[str, tuple], t1: str, t2: str, window: int, ordered: bool = False
) -> np.ndarray:
    """Docs where some occurrence of ``t1`` and ``t2`` lie within
    ``window`` tokens of each other (0 < |p1 - p2| <= window).
    ``ordered=True`` = span-near semantics: ``t1`` must precede ``t2``
    (0 < p2 - p1 <= window) — only the nearest-on-the-right probe runs.
    Vectorized: for each co-occurrence doc, the minimum gap between
    the two sorted position lists comes from one merged searchsorted
    pass — no per-doc Python loop."""
    if t1 not in termdata or t2 not in termdata:
        return np.empty(0, dtype=np.int64)
    d1, tf1, _dl1, pf1, po1 = termdata[t1]
    d2, tf2, _dl2, pf2, po2 = termdata[t2]
    cand = np.intersect1d(d1, d2, assume_unique=True)
    if cand.size == 0:
        return cand
    r1 = np.searchsorted(d1, cand)
    r2 = np.searchsorted(d2, cand)
    # flatten t1's positions for candidate docs, tagged by candidate id
    f1, c1 = _ragged_gather(po1[r1], tf1[r1])
    p1 = pf1[f1]
    # for each (cand, p1) find the nearest t2 position in that doc via
    # searchsorted into a per-doc offset space: shift each doc's t2
    # positions into a disjoint range so one global searchsorted works
    SPAN = np.int64(1) << 32
    f2, c2 = _ragged_gather(po2[r2], tf2[r2])
    key2 = c2.astype(np.int64) * SPAN + pf2[f2]
    key1 = c1.astype(np.int64) * SPAN + p1
    # ordered probes with side='right': when t1 == t2 the probe key
    # itself is IN key2 (gap 0 is the occurrence itself, never a
    # match), and side='right' lands on the NEXT occurrence instead
    idx = np.searchsorted(key2, key1, side="right" if ordered else "left")
    ok = np.zeros(len(key1), dtype=bool)
    # nearest-on-the-right within the same doc
    right = np.minimum(idx, len(key2) - 1)
    if len(key2):
        same_doc = key2[right] // SPAN == c1
        gap = key2[right] % SPAN - p1
        ok |= same_doc & (gap != 0) & (np.abs(gap) <= window) & (
            (gap > 0) if ordered else True
        )
        if not ordered:
            # nearest-on-the-left (unordered NEAR only)
            left = np.maximum(idx - 1, 0)
            same_doc = key2[left] // SPAN == c1
            gap = p1 - key2[left] % SPAN
            ok |= same_doc & (gap != 0) & (np.abs(gap) <= window)
    return cand[np.unique(c1[ok])]


def _span_not_match(
    termdata: dict[str, tuple], t_inc: str, t_exc: str, window: int
) -> np.ndarray:
    """Docs with at least one occurrence of ``t_inc`` that has NO
    ``t_exc`` occurrence within ``window`` tokens (Lucene SpanNotQuery
    with symmetric pre/post slop). Docs containing ``t_inc`` but not
    ``t_exc`` at all qualify outright. Same merged-searchsorted
    vectorization as ``_proximity_match`` — the nearest ``t_exc`` on
    each side of every ``t_inc`` occurrence decides, no per-doc
    loop."""
    if t_inc not in termdata:
        return np.empty(0, dtype=np.int64)
    d1, tf1, _dl1, pf1, po1 = termdata[t_inc]
    if t_exc not in termdata:
        return d1.astype(np.int64, copy=True)
    d2, tf2, _dl2, pf2, po2 = termdata[t_exc]
    only = np.setdiff1d(d1, d2, assume_unique=True)
    cand = np.intersect1d(d1, d2, assume_unique=True)
    if cand.size == 0:
        return only.astype(np.int64)
    r1 = np.searchsorted(d1, cand)
    r2 = np.searchsorted(d2, cand)
    f1, c1 = _ragged_gather(po1[r1], tf1[r1])
    p1 = pf1[f1]
    SPAN = np.int64(1) << 32
    f2, c2 = _ragged_gather(po2[r2], tf2[r2])
    key2 = c2.astype(np.int64) * SPAN + pf2[f2]
    key1 = c1.astype(np.int64) * SPAN + p1
    idx = np.searchsorted(key2, key1, side="left")
    blocked = np.zeros(len(key1), dtype=bool)
    right = np.minimum(idx, len(key2) - 1)
    if len(key2):
        same_doc = key2[right] // SPAN == c1
        gap = key2[right] % SPAN - p1
        blocked |= same_doc & (np.abs(gap) <= window)
        left = np.maximum(idx - 1, 0)
        same_doc = key2[left] // SPAN == c1
        gap = p1 - key2[left] % SPAN
        blocked |= same_doc & (np.abs(gap) <= window)
    free = cand[np.unique(c1[~blocked])]
    return np.union1d(only, free).astype(np.int64)


def _span_not_partition(
    batches: Iterator[pa.RecordBatch],
    queries: list[tuple[int, str, str]],
    k: int,
    window: int,
    idf: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    excl: tuple[int, ...] = (),
    vers: tuple = None,
):
    shards = load_termdata(batches, vers)
    excl_arr = np.sort(np.asarray(excl, dtype=np.int64)) if excl else None

    out_q, out_d, out_s = [], [], []
    for _shard, termdata in shards.items():
        for qid, t_inc, t_exc in queries:
            docs = _span_not_match(termdata, t_inc, t_exc, window)
            if docs.size and excl_arr is not None:
                docs = docs[~np.isin(docs, excl_arr)]
            if docs.size == 0:
                continue
            dt, tft, dlt, _pf, _po = termdata[t_inc]
            rows = np.searchsorted(dt, docs)
            tfv = tft[rows].astype(np.float64)
            dlv = dlt[rows].astype(np.float64)
            scores = idf[t_inc] * (tfv * (k1 + 1.0)) / (
                tfv + k1 * (1.0 - b + b * dlv / avgdl)
            )
            r = np.round(scores, 6)
            order = np.lexsort((docs, -r))[:k]
            out_q.extend([qid] * len(order))
            out_d.extend(int(docs[i]) for i in order)
            out_s.extend(float(scores[i]) for i in order)
    if out_q:
        yield pa.RecordBatch.from_pydict(
            {"query_id": out_q, "doc_id": out_d, "score": out_s},
            schema=pa.schema(
                [("query_id", pa.int64()), ("doc_id", pa.int64()), ("score", pa.float64())]
            ),
        )


def _proximity_partition(
    batches: Iterator[pa.RecordBatch],
    queries: list[tuple[int, str, str]],
    k: int,
    window: int,
    idf: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    excl: tuple[int, ...] = (),
    ordered: bool = False,
    vers: tuple = None,
):
    shards = load_termdata(batches, vers)
    excl_arr = np.sort(np.asarray(excl, dtype=np.int64)) if excl else None

    out_q, out_d, out_s = [], [], []
    for _shard, termdata in shards.items():
        for qid, t1, t2 in queries:
            docs = _proximity_match(termdata, t1, t2, window, ordered)
            if docs.size and excl_arr is not None:
                docs = docs[~np.isin(docs, excl_arr)]
            if docs.size == 0:
                continue
            scores = np.zeros(len(docs))
            for t in dict.fromkeys((t1, t2)):
                dt, tft, dlt, _pf, _po = termdata[t]
                rows = np.searchsorted(dt, docs)
                tfv = tft[rows].astype(np.float64)
                dlv = dlt[rows].astype(np.float64)
                scores += idf[t] * (tfv * (k1 + 1.0)) / (
                    tfv + k1 * (1.0 - b + b * dlv / avgdl)
                )
            r = np.round(scores, 6)
            order = np.lexsort((docs, -r))[:k]
            out_q.extend([qid] * len(order))
            out_d.extend(int(docs[i]) for i in order)
            out_s.extend(float(scores[i]) for i in order)
    if out_q:
        yield pa.RecordBatch.from_pydict(
            {"query_id": out_q, "doc_id": out_d, "score": out_s},
            schema=pa.schema(
                [("query_id", pa.int64()), ("doc_id", pa.int64()), ("score", pa.float64())]
            ),
        )


def proximity_topk(
    index: InvertedIndex,
    pairs: list[tuple[int, str, str]],
    k: int = 10,
    window: int = 3,
    k1: float = BM25_K1,
    b: float = BM25_B,
    ordered: bool = False,
) -> DataFrame:
    """(query_id, rank, doc_id, score): NEAR/W retrieval over the
    positional index — docs where the two terms occur within ``window``
    tokens of each other (distinct occurrences, either order),
    BM25-scored over the pair's unique terms, engine tie semantics.
    The SQL-oracle shape is a per-doc positions self-join with
    ``0 < abs(p1 - p2) <= window``.

    ``ordered=True`` = span-near (Lucene SpanNearQuery inOrder):
    ``t1`` must PRECEDE ``t2`` with 0 < p2 - p1 <= window; oracle shape
    ``b.pos - a.pos BETWEEN 1 AND window``. Asymmetric by design —
    "new york" NEAR-ordered differs from "york new"."""
    plan: list[tuple[int, str, str]] = []
    all_terms: set[str] = set()
    for qid, a_raw, b_raw in pairs:
        ta = a_raw.strip().lower()
        tb = b_raw.strip().lower()
        if ta and tb:
            plan.append((qid, ta, tb))
            all_terms.update((ta, tb))

    spark = index.postings.sparkSession
    if not plan:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    n = index.n_docs
    dfs = index.df_for_terms(all_terms)
    idf = {
        t: math.log((n - d + 0.5) / (d + 0.5) + 1.0) for t, d in dfs.items() if d > 0
    }
    plan = [(qid, a, c) for qid, a, c in plan if a in idf and c in idf]
    if not plan:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    avgdl = index.avgdl
    excl = tuple(sorted(index.tombstones)) if index.tombstones else ()
    live = {t for _q, a, c in plan for t in (a, c)}
    filtered = index.postings.filter(F.col("term").isin(list(live)))
    n_parts = spark.sparkContext.defaultParallelism
    vers = index.doc_versions
    per_shard = shard_partitioned(index, filtered, n_parts).mapInArrow(
        lambda it: _proximity_partition(
            it, plan, k, window, idf, avgdl, k1, b, excl, ordered, vers
        ),
        "query_id long, doc_id long, score double",
    )
    return topk(per_shard, k).select("query_id", "rank", "doc_id", "score")


def span_not_topk(
    index: InvertedIndex,
    pairs: list[tuple[int, str, str]],
    k: int = 10,
    window: int = 3,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, doc_id, score): Lucene SpanNotQuery retrieval
    — docs with an occurrence of the INCLUDE term that has no EXCLUDE
    term within ``window`` tokens (symmetric pre/post slop; "apple
    not near pie"). Scored as plain BM25 over the include term; an
    OOV exclude term never blocks (plain term query). Oracle shape:
    positions anti-join — an include position survives when NO
    exclude position lies within the window."""
    plan: list[tuple[int, str, str]] = []
    inc_terms: set[str] = set()
    all_terms: set[str] = set()
    for qid, inc_raw, exc_raw in pairs:
        ti = inc_raw.strip().lower()
        te = exc_raw.strip().lower()
        if ti:
            plan.append((qid, ti, te))
            inc_terms.add(ti)
            all_terms.update((ti, te) if te else (ti,))

    spark = index.postings.sparkSession
    if not plan:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    n = index.n_docs
    dfs = index.df_for_terms(inc_terms)
    idf = {
        t: math.log((n - d + 0.5) / (d + 0.5) + 1.0) for t, d in dfs.items() if d > 0
    }
    plan = [(qid, ti, te) for qid, ti, te in plan if ti in idf]
    if not plan:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    avgdl = index.avgdl
    excl = tuple(sorted(index.tombstones)) if index.tombstones else ()
    live = {t for _q, ti, te in plan for t in (ti, te) if t}
    filtered = index.postings.filter(F.col("term").isin(list(live)))
    n_parts = spark.sparkContext.defaultParallelism
    vers = index.doc_versions
    per_shard = shard_partitioned(index, filtered, n_parts).mapInArrow(
        lambda it: _span_not_partition(
            it, plan, k, window, idf, avgdl, k1, b, excl, vers
        ),
        "query_id long, doc_id long, score double",
    )
    return topk(per_shard, k).select("query_id", "rank", "doc_id", "score")


_MERGE_IN_POS = (
    "term string, shard int, n_docs int, "
    "docs_bin binary, tfs_bin binary, dls_bin binary, pos_bin binary"
)


def merge_partition_pos(
    batches: Iterator[pa.RecordBatch],
    block_size: int,
    n_salts: int = 1,
    excluded: tuple[int, ...] = (),
    versions: tuple = None,
):
    """Positional counterpart of ``build_index._merge_partition``:
    decode -> merge-sort -> re-encode with the positions stream riding
    along. Positions are delta-encoded per POSTING (reset at each
    posting start), so the concatenated streams decode with ONE varbyte
    pass + one segment-cumsum keyed by the decoded tf values; the
    row permutation becomes a ragged gather on the positions.
    ``versions`` (newest-wins re-crawl fold, requires a ``seg`` input
    column) and ``excluded`` (tombstones) drop postings physically,
    same contract as the non-positional kernel."""
    from ..functions.codec import delta_decode_blocks, vb_decode  # noqa: PLC0415
    from ..plans.build_index import _concat_binary  # noqa: PLC0415

    batch_list = [b for b in batches if b.num_rows > 0]
    if not batch_list:
        return
    tbl = combined_table(batch_list)
    dict_enc = pc.dictionary_encode(tbl.column("term").chunk(0))
    btidx = dict_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    terms_dict = dict_enc.dictionary
    bshard = tbl.column("shard").chunk(0).to_numpy(zero_copy_only=False).astype(np.int64)
    bnd = tbl.column("n_docs").chunk(0).to_numpy(zero_copy_only=False).astype(np.int64)
    n_values = int(bnd.sum())
    value_starts = np.concatenate(([0], np.cumsum(bnd)))[:-1]

    docs_stream, _ = _concat_binary(tbl.column("docs_bin").chunk(0))
    tfs_stream, _ = _concat_binary(tbl.column("tfs_bin").chunk(0))
    dls_stream, _ = _concat_binary(tbl.column("dls_bin").chunk(0))
    pos_stream, _ = _concat_binary(tbl.column("pos_bin").chunk(0))
    doc = delta_decode_blocks(vb_decode(docs_stream, n_values), value_starts)
    tf = vb_decode(tfs_stream, n_values).astype(np.int64)
    dl = vb_decode(dls_stream, n_values).astype(np.int64)
    total_tf = int(tf.sum())
    pvals = vb_decode(pos_stream, total_tf)
    posting_offsets = np.concatenate(([0], np.cumsum(tf)))
    pos_flat = segment_cumsum(pvals, posting_offsets[:-1][tf > 0])

    tsort = np.argsort(terms_dict.to_numpy(zero_copy_only=False))
    trank = np.empty(len(tsort), dtype=np.int64)
    trank[tsort] = np.arange(len(tsort))
    shard_base = int(bshard.max()) + 1
    row_key = np.repeat(trank[btidx] * shard_base + bshard, bnd)
    perm = np.lexsort((doc, row_key))
    tidx_rows = np.repeat(btidx, bnd)[perm]
    shard_rows = np.repeat(bshard, bnd)[perm]
    doc_s, tf_s, dl_s = doc[perm], tf[perm], dl[perm]
    flat_idx, _rid = _ragged_gather(posting_offsets[:-1][perm], tf_s)
    pos_s = pos_flat[flat_idx]
    off_s = np.concatenate(([0], np.cumsum(tf_s)))

    if excluded or versions:
        live = np.ones(len(doc_s), dtype=bool)
        if excluded:
            live &= ~np.isin(doc_s, np.sort(np.asarray(excluded, dtype=np.int64)))
        if versions:
            from .postings import version_arrays, version_keep  # noqa: PLC0415

            vd, vs = version_arrays(versions)
            bseg = tbl.column("seg").chunk(0).to_numpy(zero_copy_only=False).astype(np.int64)
            seg_rows = np.repeat(bseg, bnd)[perm]
            live &= version_keep(doc_s, seg_rows, vd, vs)
        keep_flat, _ = _ragged_gather(off_s[:-1][live], tf_s[live])
        pos_s = pos_s[keep_flat]
        tidx_rows, shard_rows = tidx_rows[live], shard_rows[live]
        doc_s, tf_s, dl_s = doc_s[live], tf_s[live], dl_s[live]
        off_s = np.concatenate(([0], np.cumsum(tf_s)))
        if len(doc_s) == 0:
            return

    salt_rows = None
    if n_salts > 1:
        bits = (n_salts - 1).bit_length()
        salt_rows = (
            (doc_s.astype(np.int64).view(np.uint64) ^ np.uint64(1 << 63))
            >> np.uint64(64 - bits)
        ).astype(np.int64)
    yield from encode_grouped_rows_pos(
        terms_dict, tidx_rows, shard_rows, doc_s, tf_s, dl_s,
        pos_s, off_s, block_size, salt=salt_rows,
    )


def _best_window_partition(
    batches: Iterator[pa.RecordBatch],
    term_queries: dict[str, list[int]],
    wanted: dict[int, np.ndarray],
    window: int,
    vers: tuple = None,
):
    """Positional decode pass: for each (query, wanted doc) find the
    ``window``-token span holding the most DISTINCT query terms
    (ties: earliest start). Candidate starts are term occurrences —
    the optimum always begins at one."""
    termdata = load_termdata(batches, vers)
    out_q, out_d, out_s, out_n = [], [], [], []
    for _sh, terms in termdata.items():
        # per (query, doc): merged occurrence positions + term ids
        per_doc: dict[tuple[int, int], list[tuple[np.ndarray, int]]] = {}
        for ti, (t, qids) in enumerate(sorted(term_queries.items())):
            got = terms.get(t)
            if got is None:
                continue
            docs, _tf, _dl, pos_flat, pos_offs = got
            for qid in qids:
                w = wanted[qid]
                idxs = np.nonzero(np.isin(docs, w))[0]
                for i in idxs:
                    p = pos_flat[pos_offs[i] : pos_offs[i + 1]]
                    per_doc.setdefault((qid, int(docs[i])), []).append((p, ti))
        for (qid, doc), plists in per_doc.items():
            pos = np.concatenate([p for p, _ in plists])
            tid = np.concatenate(
                [np.full(len(p), ti, dtype=np.int64) for p, ti in plists]
            )
            order = np.argsort(pos, kind="stable")
            pos, tid = pos[order], tid[order]
            ends = np.searchsorted(pos, pos + window, side="left")
            best = (-1, -1)  # (n_distinct, -start) maximized
            for i in range(len(pos)):
                n = len(set(tid[i : ends[i]].tolist()))
                if n > best[0]:
                    best = (n, int(pos[i]))
            out_q.append(qid)
            out_d.append(doc)
            out_s.append(best[1])
            out_n.append(best[0])
    if out_q:
        yield pa.RecordBatch.from_pydict(
            {"query_id": out_q, "doc_id": out_d, "win_start": out_s, "n_terms": out_n},
            schema=pa.schema(
                [
                    ("query_id", pa.int64()),
                    ("doc_id", pa.int64()),
                    ("win_start", pa.int64()),
                    ("n_terms", pa.int64()),
                ]
            ),
        )


def best_window_snippets(
    index: InvertedIndex,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    window: int = 8,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, score, win_start, n_terms, snippet):
    BM25 top-k with GENERIC highlight snippets — for each result doc
    the ``window``-token span containing the most distinct query
    terms (ties: earliest), the Lucene highlighter's best-fragment
    policy for OR queries (phrase_snippets covers the phrase case).

    Three touches, none corpus-sized: WAND ranks (the positional
    pos_bin column is pruned from that scan), one positional decode
    pass over the query terms' postings emits each top-k doc's best
    window, and the snippet text is a token slice on the (broadcast)
    k-row join against the docs table."""
    from .wand import wand_topk  # noqa: PLC0415

    hits = wand_topk(index, queries, k, k1, b)
    hit_rows = hits.collect()
    if not hit_rows:
        spark = index.postings.sparkSession
        return spark.createDataFrame(
            [],
            "query_id long, rank int, doc_id long, score double, "
            "win_start long, n_terms long, snippet string",
        )
    wanted: dict[int, list[int]] = {}
    for r in hit_rows:
        wanted.setdefault(r["query_id"], []).append(r["doc_id"])
    wanted_np = {q: np.sort(np.asarray(d, dtype=np.int64)) for q, d in wanted.items()}

    term_queries: dict[str, list[int]] = {}
    for qid, q in queries:
        if qid not in wanted_np:
            continue
        seen: list[str] = []
        for tok in q.strip().lower().split():
            if tok and tok not in seen:
                seen.append(tok)
                term_queries.setdefault(tok, []).append(qid)

    spark = index.postings.sparkSession
    filtered = index.postings.filter(F.col("term").isin(list(term_queries)))
    # one task owns whole shards: a doc's terms all live in its shard,
    # so the window merge sees every occurrence (same partitioning
    # rationale as the WAND stage)
    n_parts = spark.sparkContext.defaultParallelism
    vers = index.doc_versions
    wins = shard_partitioned(index, filtered, n_parts).mapInArrow(
        lambda it: _best_window_partition(
            it, term_queries, wanted_np, window, vers
        ),
        "query_id long, doc_id long, win_start long, n_terms long",
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_for_scoring(F.col(text_col)).alias("toks"),
    )
    start = F.col("win_start") + 1  # 1-based slice
    length = F.least(F.lit(window), F.size("toks") - F.col("win_start"))
    return (
        F.broadcast(hits.join(wins, ["query_id", "doc_id"]))
        .join(toks, "doc_id")
        .select(
            "query_id",
            "rank",
            "doc_id",
            "score",
            "win_start",
            "n_terms",
            F.concat_ws(" ", F.slice("toks", start, length)).alias("snippet"),
        )
    )


def _span_first_partition(
    batches: Iterator[pa.RecordBatch],
    queries: list[tuple[int, str]],
    k: int,
    limit: int,
    idf: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    excl: tuple[int, ...] = (),
    vers: tuple = None,
):
    shards = load_termdata(batches, vers)
    excl_arr = np.sort(np.asarray(excl, dtype=np.int64)) if excl else None
    out_q, out_d, out_s = [], [], []
    for _shard, termdata in shards.items():
        for qid, t in queries:
            if t not in termdata:
                continue
            dt, tft, dlt, pf, po = termdata[t]
            if dt.size == 0:
                continue
            # positions per doc are ascending: the run's first element
            # IS the earliest occurrence — no gather needed
            first = pf[po[: len(dt)]]
            mask = first < limit
            if excl_arr is not None:
                mask &= ~np.isin(dt, excl_arr)
            docs = dt[mask]
            if docs.size == 0:
                continue
            tfv = tft[mask].astype(np.float64)
            dlv = dlt[mask].astype(np.float64)
            scores = idf[t] * (tfv * (k1 + 1.0)) / (
                tfv + k1 * (1.0 - b + b * dlv / avgdl)
            )
            order = np.lexsort((docs, -np.round(scores, 6)))[:k]
            out_q.extend([qid] * len(order))
            out_d.extend(int(docs[i]) for i in order)
            out_s.extend(float(scores[i]) for i in order)
    if out_q:
        yield pa.RecordBatch.from_pydict(
            {"query_id": out_q, "doc_id": out_d, "score": out_s},
            schema=pa.schema(
                [("query_id", pa.int64()), ("doc_id", pa.int64()), ("score", pa.float64())]
            ),
        )


def span_first_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    k: int = 10,
    limit: int = 8,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, doc_id, score): SpanFirstQuery retrieval over
    the positional index (Lucene semantics: the term must occur within
    the FIRST ``limit`` token positions of the document, 0-based
    ``first_pos < limit`` — the "match in the title/lead" targeting
    primitive for fields stored as position prefixes). Qualifying docs
    are BM25-scored on the term as usual; full-corpus stats. Oracle
    shape: 1-based ``list_position(tokens, term) BETWEEN 1 AND limit``.

    Scale shape: identical to the other positional readers — the
    postings scan filters to the query terms, each doc-shard resolves
    independently (positions ride in the same blocks), and the
    qualifying test is one vectorized gather of each run's first
    position — no per-occurrence work at all."""
    plan: list[tuple[int, str]] = []
    for qid, q in queries:
        t = q.strip().lower()
        if t:
            plan.append((qid, t))
    spark = index.postings.sparkSession
    if not plan:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    all_terms = {t for _q, t in plan}
    n = index.n_docs
    dfs = index.df_for_terms(all_terms)
    idf = {
        t: math.log((n - d + 0.5) / (d + 0.5) + 1.0) for t, d in dfs.items() if d > 0
    }
    plan = [(qid, t) for qid, t in plan if t in idf]
    if not plan:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    avgdl = index.avgdl
    excl = tuple(sorted(index.tombstones)) if index.tombstones else ()
    live = {t for _q, t in plan}
    filtered = index.postings.filter(F.col("term").isin(list(live)))
    n_parts = spark.sparkContext.defaultParallelism
    vers = index.doc_versions
    per_shard = shard_partitioned(index, filtered, n_parts).mapInArrow(
        lambda it: _span_first_partition(
            it, plan, k, limit, idf, avgdl, k1, b, excl, vers
        ),
        "query_id long, doc_id long, score double",
    )
    return topk(per_shard, k).select("query_id", "rank", "doc_id", "score")


def _mpp_partition(
    batches: Iterator[pa.RecordBatch],
    plan: list[tuple[int, list[str], list[str]]],
    k: int,
    idf: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    excl: tuple[int, ...] = (),
    vers: tuple = None,
):
    shards = load_termdata(batches, vers)
    excl_arr = np.sort(np.asarray(excl, dtype=np.int64)) if excl else None
    out_q, out_d, out_s = [], [], []
    for _shard, termdata in shards.items():
        for qid, fixed, exps in plan:
            docs_parts, score_parts = [], []
            for e in exps:
                docs, scores, _fpos = _phrase_match_score(
                    termdata, fixed + [e], idf, avgdl, k1, b
                )
                if docs.size:
                    docs_parts.append(docs)
                    score_parts.append(scores)
            if not docs_parts:
                continue
            docs = np.concatenate(docs_parts)
            scores = np.concatenate(score_parts)
            # dis-max over expansions: best full-phrase score per doc
            perm = np.lexsort((-scores, docs))
            docs, scores = docs[perm], scores[perm]
            lead = np.ones(len(docs), dtype=bool)
            lead[1:] = docs[1:] != docs[:-1]
            docs, scores = docs[lead], scores[lead]
            if excl_arr is not None:
                live = ~np.isin(docs, excl_arr)
                docs, scores = docs[live], scores[live]
            if docs.size == 0:
                continue
            order = np.lexsort((docs, -np.round(scores, 6)))[:k]
            out_q.extend([qid] * len(order))
            out_d.extend(int(docs[i]) for i in order)
            out_s.extend(float(scores[i]) for i in order)
    if out_q:
        yield pa.RecordBatch.from_pydict(
            {"query_id": out_q, "doc_id": out_d, "score": out_s},
            schema=pa.schema(
                [("query_id", pa.int64()), ("doc_id", pa.int64()), ("score", pa.float64())]
            ),
        )


def match_phrase_prefix_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansion: int = 64,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, doc_id, score): ES/Lucene
    ``match_phrase_prefix`` over the positional index — the query's
    LAST token is a prefix wildcard (``"fast ta*"``), expanded against
    the term dictionary (df desc, term asc, capped at
    ``max_expansion``, the same Lucene rewrite bound ``prefix_topk``
    uses); a doc matches when the fixed tokens immediately followed by
    ANY expansion occur consecutively. Score is the dis-max over
    matched expansions of the plain phrase BM25 (sum over the unique
    terms of fixed+expansion, full-corpus stats) — engine tie
    semantics on the rounded best score.

    Scale shape: the dictionary expansion is a capped, pushdown-
    friendly ``startswith`` scan of term_stats collected to the
    driver (bounded by ``max_expansion``); the postings scan filters
    to fixed+expansion terms only, and each doc-shard answers every
    (query, expansion) phrase independently with the same vectorized
    composite-key adjacency kernel ``phrase_topk`` uses — the
    per-query cost is bounded by ``max_expansion`` rarest-first
    intersections, never a corpus scan."""
    from .wand import expand_prefix  # noqa: PLC0415

    spark = index.postings.sparkSession
    plan_raw: list[tuple[int, list[str], list[str]]] = []
    all_terms: set[str] = set()
    for qid, q in queries:
        toks = [t for t in q.strip().lower().split() if t]
        if not toks or not toks[-1].endswith("*") or len(toks[-1]) < 2:
            continue
        fixed = toks[:-1]
        exps = expand_prefix(index, toks[-1][:-1], max_expansion)
        if not exps:
            continue
        plan_raw.append((qid, fixed, exps))
        all_terms.update(fixed)
        all_terms.update(exps)
    if not plan_raw:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    n = index.n_docs
    dfs = index.df_for_terms(all_terms)
    idf = {
        t: math.log((n - d + 0.5) / (d + 0.5) + 1.0) for t, d in dfs.items() if d > 0
    }
    plan: list[tuple[int, list[str], list[str]]] = []
    live_terms: set[str] = set()
    for qid, fixed, exps in plan_raw:
        if any(t not in idf for t in fixed):
            continue
        exps = [e for e in exps if e in idf]
        if not exps:
            continue
        plan.append((qid, fixed, exps))
        live_terms.update(fixed)
        live_terms.update(exps)
    if not plan:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    avgdl = index.avgdl
    excl = tuple(sorted(index.tombstones)) if index.tombstones else ()
    filtered = index.postings.filter(F.col("term").isin(list(live_terms)))
    n_parts = spark.sparkContext.defaultParallelism
    vers = index.doc_versions
    per_shard = shard_partitioned(index, filtered, n_parts).mapInArrow(
        lambda it: _mpp_partition(it, plan, k, idf, avgdl, k1, b, excl, vers),
        "query_id long, doc_id long, score double",
    )
    return topk(per_shard, k).select("query_id", "rank", "doc_id", "score")


def _interval_match(
    termdata: dict[str, tuple], terms: list[str], max_gaps: int
) -> np.ndarray:
    """One shard, one ordered interval query: doc_ids where the terms
    occur in order at strictly increasing positions with total slack
    (span - len(terms)) <= ``max_gaps`` — Lucene ``Intervals.ordered``
    wrapped in ``maxgaps``. Exactness without enumeration: for a fixed
    start occurrence of terms[0], chaining each next term to its
    NEAREST following occurrence minimizes every subsequent position
    (greedy is optimal step-by-step), so the greedy chain's span is
    minimal for that start; a doc matches iff some start's greedy
    chain satisfies the gap budget — identical to the existential
    positions self-join the SQL oracle runs. One vectorized
    searchsorted pass per query term, no per-doc Python loop.

    Duplicate terms are legal ("the ... the"): side='right' probes
    force strictly increasing positions, so a single occurrence can't
    satisfy two slots."""
    empty = np.empty(0, dtype=np.int64)
    uniq = list(dict.fromkeys(terms))
    if any(t not in termdata for t in uniq):
        return empty
    order = sorted(uniq, key=lambda t: len(termdata[t][0]))
    cand = termdata[order[0]][0]
    for t in order[1:]:
        cand = np.intersect1d(cand, termdata[t][0], assume_unique=True)
        if cand.size == 0:
            return empty
    # chain starts: every occurrence of terms[0] in candidate docs
    d0, tf0, _dl0, pf0, po0 = termdata[terms[0]]
    rows0 = np.searchsorted(d0, cand)
    f0, c0 = _ragged_gather(po0[rows0], tf0[rows0])
    start = pf0[f0].astype(np.int64)
    curkey = c0.astype(np.int64) * _MAXPOS + start
    alive = np.ones(len(curkey), dtype=bool)
    for t in terms[1:]:
        dt, tft, _dlt, pft, pot = termdata[t]
        rt = np.searchsorted(dt, cand)
        ft, ct = _ragged_gather(pot[rt], tft[rt])
        keyt = ct.astype(np.int64) * _MAXPOS + pft[ft]
        if keyt.size == 0:
            return empty
        idx = np.searchsorted(keyt, curkey, side="right")
        ok = idx < len(keyt)
        idx = np.minimum(idx, len(keyt) - 1)
        ok &= (keyt[idx] // _MAXPOS) == (curkey // _MAXPOS)
        alive &= ok
        curkey = keyt[idx]
    span_ok = alive & (
        (curkey % _MAXPOS) - start + 1 - len(terms) <= max_gaps
    )
    return cand[np.unique(c0[span_ok])]


def _interval_partition(
    batches: Iterator[pa.RecordBatch],
    plan: list[tuple[int, list[str], int]],
    k: int,
    idf: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    excl: tuple[int, ...] = (),
    vers: tuple = None,
):
    shards = load_termdata(batches, vers)
    excl_arr = np.sort(np.asarray(excl, dtype=np.int64)) if excl else None

    out_q, out_d, out_s = [], [], []
    for _shard, termdata in shards.items():
        for qid, terms, max_gaps in plan:
            docs = _interval_match(termdata, terms, max_gaps)
            if docs.size and excl_arr is not None:
                docs = docs[~np.isin(docs, excl_arr)]
            if docs.size == 0:
                continue
            scores = np.zeros(len(docs))
            for t in dict.fromkeys(terms):
                dt, tft, dlt, _pf, _po = termdata[t]
                rows = np.searchsorted(dt, docs)
                tfv = tft[rows].astype(np.float64)
                dlv = dlt[rows].astype(np.float64)
                scores += idf[t] * (tfv * (k1 + 1.0)) / (
                    tfv + k1 * (1.0 - b + b * dlv / avgdl)
                )
            r = np.round(scores, 6)
            order = np.lexsort((docs, -r))[:k]
            out_q.extend([qid] * len(order))
            out_d.extend(int(docs[i]) for i in order)
            out_s.extend(float(scores[i]) for i in order)
    if out_q:
        yield pa.RecordBatch.from_pydict(
            {"query_id": out_q, "doc_id": out_d, "score": out_s},
            schema=pa.schema(
                [("query_id", pa.int64()), ("doc_id", pa.int64()), ("score", pa.float64())]
            ),
        )


def interval_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str, int]],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, doc_id, score): Lucene interval queries —
    ``Intervals.maxgaps(max_gaps, Intervals.ordered(terms...))`` as an
    ES ``intervals`` match with ``ordered: true``. Each query is
    (query_id, whitespace terms, max_gaps); a doc matches when the
    terms occur in order with at most ``max_gaps`` total extra tokens
    inside the spanning window, and matches score BM25 over the
    query's unique terms (engine tie semantics). max_gaps=0 over
    distinct adjacent terms degenerates to the exact phrase operator.

    Generalizes ``proximity_topk(ordered=True)`` from 2 terms to k
    and from pair-distance to Lucene's span-slack budget. Scale
    shape: identical to the other positional kernels — postings
    pre-partitioned by shard, one mapInArrow pass, per-(term, chain)
    searchsorted; candidate sets bounded by the rarest term."""
    plan: list[tuple[int, list[str], int]] = []
    all_terms: set[str] = set()
    for qid, text, max_gaps in queries:
        terms = [t for t in text.strip().lower().split() if t]
        if len(terms) >= 2 and max_gaps >= 0:
            plan.append((qid, terms, int(max_gaps)))
            all_terms.update(terms)

    spark = index.postings.sparkSession
    if not plan:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    n = index.n_docs
    dfs = index.df_for_terms(all_terms)
    idf = {
        t: math.log((n - d + 0.5) / (d + 0.5) + 1.0) for t, d in dfs.items() if d > 0
    }
    plan = [(qid, ts, g) for qid, ts, g in plan if all(t in idf for t in ts)]
    if not plan:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    avgdl = index.avgdl
    excl = tuple(sorted(index.tombstones)) if index.tombstones else ()
    live = {t for _q, ts, _g in plan for t in ts}
    filtered = index.postings.filter(F.col("term").isin(list(live)))
    n_parts = spark.sparkContext.defaultParallelism
    vers = index.doc_versions
    per_shard = shard_partitioned(index, filtered, n_parts).mapInArrow(
        lambda it: _interval_partition(it, plan, k, idf, avgdl, k1, b, excl, vers),
        "query_id long, doc_id long, score double",
    )
    return topk(per_shard, k).select("query_id", "rank", "doc_id", "score")


def highlight_fragments(
    index: InvertedIndex,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    window: int = 6,
    n_fragments: int = 2,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, score, frag_rank, frag_start, n_terms,
    fragment): multi-fragment highlighting for the BM25 top-k — the
    Lucene SimpleFragmenter/Highlighter pair: each hit doc is tiled
    into fixed ``window``-token fragments, fragments are scored by the
    number of DISTINCT query terms they contain, and the best
    ``n_fragments`` per hit return in (n_terms desc, start asc) order.
    Complements ``best_window_snippets`` (single best sliding window)
    with the multi-fragment surface ES exposes as
    ``number_of_fragments``.

    Fully declarative — no positional decode pass: the hit set is
    broadcast-joined onto the docs table BEFORE the token explode, so
    the explode touches only hit docs (k x queries rows), and the
    tile scoring is one countDistinct agg plus a per-hit window rank
    over at most dl/window rows."""
    from .wand import wand_topk  # noqa: PLC0415

    spark = index.postings.sparkSession
    hits = wand_topk(index, queries, k, k1, b)
    qt_rows = []
    for qid, q in queries:
        for tok in dict.fromkeys(q.strip().lower().split()):
            if tok:
                qt_rows.append((qid, tok))
    qt = spark.createDataFrame(qt_rows, "query_id long, term string")
    hit_docs = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_for_scoring(F.col(text_col)).alias("toks"),
    ).join(F.broadcast(hits.select("doc_id").distinct()), "doc_id")
    posn = hit_docs.select(
        "doc_id", F.posexplode("toks").alias("pos", "term")
    ).withColumn("tile", (F.col("pos") / window).cast("long"))
    scored_tiles = (
        posn.join(F.broadcast(qt), "term")
        .join(F.broadcast(hits.select("query_id", "doc_id")), ["query_id", "doc_id"])
        .groupBy("query_id", "doc_id", "tile")
        .agg(F.countDistinct("term").alias("n_terms"))
    )
    w = Window.partitionBy("query_id", "doc_id").orderBy(
        F.col("n_terms").desc(), F.col("tile").asc()
    )
    best = scored_tiles.withColumn("frag_rank", F.row_number().over(w)).filter(
        F.col("frag_rank") <= n_fragments
    )
    start = (F.col("tile") * window).alias("frag_start")
    return (
        best.join(hits, ["query_id", "doc_id"])
        .join(hit_docs, "doc_id")
        .select(
            "query_id",
            "rank",
            "doc_id",
            "score",
            "frag_rank",
            start,
            "n_terms",
            F.concat_ws(
                " ",
                F.slice(
                    "toks",
                    F.col("tile").cast("int") * window + 1,
                    window,
                ),
            ).alias("fragment"),
        )
    )


def _sloppy_match(
    termdata: dict[str, tuple], t1: str, t2: str, slop: int
) -> np.ndarray:
    """Docs matching the two-token sloppy phrase ``"t1 t2"~slop`` —
    Lucene SloppyPhraseScorer semantics specialized to two terms: the
    phrase matches iff some occurrence pair satisfies
    ``|p2 - p1 - 1| <= slop`` (slop = total token moves; the
    transposed adjacent pair "b a" needs slop 2, exactly Lucene).
    Vectorized as a RANGE-EMPTINESS test: each t1 occurrence probes
    the doc-tagged sorted t2 position keys for any key in
    ``[p1 + 1 - slop, p1 + 1 + slop]`` via two searchsorteds — no
    per-doc loop. A same-term pair (t1 == t2) discounts the probe's
    own occurrence."""
    if t1 not in termdata or t2 not in termdata:
        return np.empty(0, dtype=np.int64)
    d1, tf1, _dl1, pf1, po1 = termdata[t1]
    d2, tf2, _dl2, pf2, po2 = termdata[t2]
    cand = np.intersect1d(d1, d2, assume_unique=True)
    if cand.size == 0:
        return cand
    r1 = np.searchsorted(d1, cand)
    r2 = np.searchsorted(d2, cand)
    SPAN = np.int64(1) << 32
    f1, c1 = _ragged_gather(po1[r1], tf1[r1])
    p1 = pf1[f1].astype(np.int64)
    key1 = c1.astype(np.int64) * SPAN + p1
    f2, c2 = _ragged_gather(po2[r2], tf2[r2])
    key2 = c2.astype(np.int64) * SPAN + pf2[f2]
    # positions are doc-local and slop tiny vs 2^32: the probe range
    # can never cross a doc boundary in key space
    lo = np.searchsorted(key2, key1 + (1 - slop), side="left")
    hi = np.searchsorted(key2, key1 + (1 + slop), side="right")
    count = hi - lo
    if t1 == t2 and slop >= 1:
        # the probe occurrence itself sits in its own range (gap 0)
        count = count - 1
    ok = count > 0
    return cand[np.unique(c1[ok])]


def _sloppy_partition(
    batches: Iterator[pa.RecordBatch],
    queries: list[tuple[int, str, str, int]],
    k: int,
    idf: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    excl: tuple[int, ...] = (),
    vers: tuple = None,
):
    shards = load_termdata(batches, vers)
    excl_arr = np.sort(np.asarray(excl, dtype=np.int64)) if excl else None
    out_q, out_d, out_s = [], [], []
    for _shard, termdata in shards.items():
        for qid, t1, t2, slop in queries:
            docs = _sloppy_match(termdata, t1, t2, slop)
            if docs.size and excl_arr is not None:
                docs = docs[~np.isin(docs, excl_arr)]
            if docs.size == 0:
                continue
            scores = np.zeros(len(docs))
            for t in dict.fromkeys((t1, t2)):
                dt, tft, dlt, _pf, _po = termdata[t]
                rows = np.searchsorted(dt, docs)
                tfv = tft[rows].astype(np.float64)
                dlv = dlt[rows].astype(np.float64)
                scores += idf[t] * (tfv * (k1 + 1.0)) / (
                    tfv + k1 * (1.0 - b + b * dlv / avgdl)
                )
            r = np.round(scores, 6)
            order = np.lexsort((docs, -r))[:k]
            out_q.extend([qid] * len(order))
            out_d.extend(int(docs[i]) for i in order)
            out_s.extend(float(scores[i]) for i in order)
    if out_q:
        yield pa.RecordBatch.from_pydict(
            {"query_id": out_q, "doc_id": out_d, "score": out_s},
            schema=pa.schema(
                [("query_id", pa.int64()), ("doc_id", pa.int64()), ("score", pa.float64())]
            ),
        )


def sloppy_phrase_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str, str, int]],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, doc_id, score): ES ``match_phrase`` with
    ``slop`` over the positional index, two-token phrases (the pinned
    surface; Lucene's n-term sloppy scorer is a different algorithm
    and is NOT approximated here — longer phrases raise). slop=0
    degenerates to the exact phrase. Docs are BM25-scored over the
    pair's distinct terms (the engine phrase scoring rule); either
    term OOV empties the query (AND semantics). Oracle shape: per-doc
    positions self-join with ``b.pos - a.pos BETWEEN 1 - slop AND
    1 + slop`` (minus the same-occurrence row when t1 = t2).

    Scale shape: identical to proximity_topk — term-filtered postings
    scan, one ``mapInArrow`` per doc-shard (docs whole within a
    shard), shard-local top-k, global rank window."""
    plan: list[tuple[int, str, str, int]] = []
    all_terms: set[str] = set()
    for qid, a_raw, b_raw, slop in queries:
        ta, tb = a_raw.strip().lower(), b_raw.strip().lower()
        if slop < 0:
            raise ValueError(f"sloppy_phrase: negative slop {slop}")
        if ta and tb:
            plan.append((qid, ta, tb, int(slop)))
            all_terms.update((ta, tb))

    spark = index.postings.sparkSession
    if not plan:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    n = index.n_docs
    dfs = index.df_for_terms(all_terms)
    idf = {
        t: math.log((n - d + 0.5) / (d + 0.5) + 1.0) for t, d in dfs.items() if d > 0
    }
    plan = [(qid, a, c, s) for qid, a, c, s in plan if a in idf and c in idf]
    if not plan:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    avgdl = index.avgdl
    excl = tuple(sorted(index.tombstones)) if index.tombstones else ()
    live = {t for _q, a, c, _s in plan for t in (a, c)}
    filtered = index.postings.filter(F.col("term").isin(list(live)))
    n_parts = spark.sparkContext.defaultParallelism
    vers = index.doc_versions
    per_shard = shard_partitioned(index, filtered, n_parts).mapInArrow(
        lambda it: _sloppy_partition(it, plan, k, idf, avgdl, k1, b, excl, vers),
        "query_id long, doc_id long, score double",
    )
    return topk(per_shard, k).select("query_id", "rank", "doc_id", "score")


def _span_contain_match(
    termdata: dict[str, tuple], t1: str, t2: str, tl: str, window: int
) -> np.ndarray:
    """Docs with an ORDERED big span t1..t2 (0 < p2 - p1 <= window,
    the span-near contract ``proximity_topk(ordered=True)`` pins) that
    CONTAINS an occurrence of ``tl`` (p1 <= pl <= p2). Lucene
    SpanContaining/SpanWithin share this doc-level match; only the
    scored side differs.

    Vectorized over every candidate doc at once with the merged
    doc*SPAN+pos key trick of ``_span_not_match``: for each t1
    occurrence the FARTHEST in-window t2 occurrence p2max is one
    searchsorted, and containment reduces to "any tl position in
    [p1, p2max]" (sound and complete: a tl at pl <= p2max is inside
    the valid span (p1, p2max); any tl inside a smaller valid span is
    also <= p2max). No per-doc loop."""
    if t1 not in termdata or t2 not in termdata or tl not in termdata:
        return np.empty(0, dtype=np.int64)
    d1, tf1, _l1, pf1, po1 = termdata[t1]
    d2, tf2, _l2, pf2, po2 = termdata[t2]
    dl_, tfl, _l3, pfl, pol = termdata[tl]
    cand = np.intersect1d(
        np.intersect1d(d1, d2, assume_unique=True), dl_, assume_unique=True
    )
    if cand.size == 0:
        return cand.astype(np.int64)
    f1, c1 = _ragged_gather(po1[np.searchsorted(d1, cand)], tf1[np.searchsorted(d1, cand)])
    f2, c2 = _ragged_gather(po2[np.searchsorted(d2, cand)], tf2[np.searchsorted(d2, cand)])
    fl, cl = _ragged_gather(pol[np.searchsorted(dl_, cand)], tfl[np.searchsorted(dl_, cand)])
    SPAN = np.int64(1) << 32
    key1 = c1.astype(np.int64) * SPAN + pf1[f1]
    key2 = c2.astype(np.int64) * SPAN + pf2[f2]
    keyl = cl.astype(np.int64) * SPAN + pfl[fl]
    p1 = pf1[f1].astype(np.int64)
    # farthest t2 occurrence in (p1, p1 + window] per t1 occurrence
    hi = np.searchsorted(key2, key1 + window, side="right") - 1
    hi_c = np.maximum(hi, 0)
    p2max = key2[hi_c] % SPAN
    big_ok = (hi >= 0) & ((key2[hi_c] // SPAN) == c1) & (p2max > p1)
    # any tl position in [p1, p2max]?  (same-doc implied by key bounds)
    lo = np.searchsorted(keyl, key1, side="left")
    lo_c = np.minimum(lo, max(len(keyl) - 1, 0))
    contained = (lo < len(keyl)) & (keyl[lo_c] <= c1.astype(np.int64) * SPAN + p2max)
    ok = big_ok & contained
    return cand[np.unique(c1[ok])].astype(np.int64)


def _span_contain_partition(
    batches: Iterator[pa.RecordBatch],
    queries: list[tuple[int, str, str, str]],
    k: int,
    window: int,
    idf: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    score_little: bool,
    excl: tuple[int, ...] = (),
    vers: tuple = None,
):
    shards = load_termdata(batches, vers)
    excl_arr = np.sort(np.asarray(excl, dtype=np.int64)) if excl else None
    out_q, out_d, out_s = [], [], []
    for _shard, termdata in shards.items():
        for qid, t1, t2, tl in queries:
            docs = _span_contain_match(termdata, t1, t2, tl, window)
            if docs.size and excl_arr is not None:
                docs = docs[~np.isin(docs, excl_arr)]
            if docs.size == 0:
                continue
            score_terms = (tl,) if score_little else tuple(dict.fromkeys((t1, t2)))
            scores = np.zeros(len(docs))
            for t in score_terms:
                dt, tft, dlt, _pf, _po = termdata[t]
                rows = np.searchsorted(dt, docs)
                tfv = tft[rows].astype(np.float64)
                dlv = dlt[rows].astype(np.float64)
                scores += idf[t] * (tfv * (k1 + 1.0)) / (
                    tfv + k1 * (1.0 - b + b * dlv / avgdl)
                )
            r = np.round(scores, 6)
            order = np.lexsort((docs, -r))[:k]
            out_q.extend([qid] * len(order))
            out_d.extend(int(docs[i]) for i in order)
            out_s.extend(float(scores[i]) for i in order)
    if out_q:
        yield pa.RecordBatch.from_pydict(
            {"query_id": out_q, "doc_id": out_d, "score": out_s},
            schema=pa.schema(
                [("query_id", pa.int64()), ("doc_id", pa.int64()), ("score", pa.float64())]
            ),
        )


def _span_contain_driver(
    index: InvertedIndex,
    triples: list[tuple[int, str, str, str]],
    k: int,
    window: int,
    k1: float,
    b: float,
    score_little: bool,
) -> DataFrame:
    plan: list[tuple[int, str, str, str]] = []
    all_terms: set[str] = set()
    for qid, a_raw, b_raw, l_raw in triples:
        ta, tb, tl = a_raw.strip().lower(), b_raw.strip().lower(), l_raw.strip().lower()
        if ta and tb and tl:
            plan.append((qid, ta, tb, tl))
            all_terms.update((ta, tb, tl))
    spark = index.postings.sparkSession
    empty = "query_id long, rank int, doc_id long, score double"
    if not plan:
        return spark.createDataFrame([], empty)
    n = index.n_docs
    dfs = index.df_for_terms(all_terms)
    idf = {
        t: math.log((n - d + 0.5) / (d + 0.5) + 1.0) for t, d in dfs.items() if d > 0
    }
    plan = [
        (qid, a, c, l)
        for qid, a, c, l in plan
        if a in idf and c in idf and l in idf
    ]
    if not plan:
        return spark.createDataFrame([], empty)
    avgdl = index.avgdl
    excl = tuple(sorted(index.tombstones)) if index.tombstones else ()
    live = {t for _q, a, c, l in plan for t in (a, c, l)}
    filtered = index.postings.filter(F.col("term").isin(list(live)))
    n_parts = spark.sparkContext.defaultParallelism
    vers = index.doc_versions
    per_shard = shard_partitioned(index, filtered, n_parts).mapInArrow(
        lambda it: _span_contain_partition(
            it, plan, k, window, idf, avgdl, k1, b, score_little, excl, vers
        ),
        "query_id long, doc_id long, score double",
    )
    return topk(per_shard, k).select("query_id", "rank", "doc_id", "score")


def span_containing_topk(
    index: InvertedIndex,
    triples: list[tuple[int, str, str, str]],
    k: int = 10,
    window: int = 4,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, doc_id, score): Lucene SpanContainingQuery —
    docs where an ORDERED span t1..t2 (0 < p2 - p1 <= window, the
    span-near contract) contains an occurrence of the little term
    (p1 <= pl <= p2). The BIG side is returned, so docs are BM25-scored
    over the big span's unique terms {t1, t2} (engine phrase-scoring
    rule, engine tie semantics). Any OOV term empties the query (all
    three sides are required). Oracle shape: positions triple join —
    ``b.pos - a.pos BETWEEN 1 AND window`` and
    ``l.pos BETWEEN a.pos AND b.pos``.

    Scale shape: identical to ``proximity_topk`` — the postings scan
    is filtered to the triples' terms (parquet pushdown), each
    doc-shard resolves containment locally in one vectorized
    ``mapInArrow`` pass, and only shard-local top-k rows reach the
    global rank window. No reference analogue (the reference has no
    index; SURVEY.md §2.6 extension)."""
    return _span_contain_driver(index, triples, k, window, k1, b, score_little=False)


def span_within_topk(
    index: InvertedIndex,
    triples: list[tuple[int, str, str, str]],
    k: int = 10,
    window: int = 4,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, doc_id, score): Lucene SpanWithinQuery — the
    same doc-level match as ``span_containing_topk`` (little inside an
    ordered big span) but the LITTLE side is returned, so docs are
    BM25-scored over the little term alone. Same oracle match shape,
    little-term scoring CTE."""
    return _span_contain_driver(index, triples, k, window, k1, b, score_little=True)


def _merge_or_termdata(termdata: dict[str, tuple], alts: tuple[str, ...]):
    """One synthetic termdata entry whose occurrences are the UNION of
    the alternatives' occurrences (Lucene SpanOrQuery): docs merged,
    per-doc positions merged sorted (distinct terms can't share a
    token position, so the union stays strictly ascending). Returns
    None when no alternative is in the shard's vocabulary."""
    present = [t for t in alts if t in termdata]
    if not present:
        return None
    if len(present) == 1:
        return termdata[present[0]]
    doc_keys, poss = [], []
    for t in present:
        d, tf, _dl, pf, po = termdata[t]
        # po is the n+1 offsets array ([0, cumsum(tf)]); rows start at po[:-1]
        f, c = _ragged_gather(po[:-1], tf)
        doc_keys.append(d[c])
        poss.append(pf[f])
    dk = np.concatenate(doc_keys)
    ps = np.concatenate(poss)
    order = np.lexsort((ps, dk))
    dk, ps = dk[order], ps[order]
    docs, counts = np.unique(dk, return_counts=True)
    starts = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    d0, _tf0, dl0, _pf0, _po0 = termdata[present[0]]
    dl2 = np.zeros(len(docs), dtype=dl0.dtype)
    for t in present:
        d, _tf, dl, _pf, _po = termdata[t]
        dl2[np.searchsorted(docs, d)] = dl
    return docs, counts.astype(np.int64), dl2, ps, starts


def _span_or_partition(
    batches: Iterator[pa.RecordBatch],
    queries: list[tuple[int, tuple[str, ...], str]],
    k: int,
    window: int,
    idf: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    ordered: bool,
    excl: tuple[int, ...] = (),
    vers: tuple = None,
):
    shards = load_termdata(batches, vers)
    excl_arr = np.sort(np.asarray(excl, dtype=np.int64)) if excl else None
    OR = "\x00or"  # can't collide: real terms never contain NUL
    out_q, out_d, out_s = [], [], []
    for _shard, termdata in shards.items():
        for qid, alts, t2 in queries:
            if t2 not in termdata:
                continue
            md = _merge_or_termdata(termdata, alts)
            if md is None:
                continue
            td2 = {OR: md, t2: termdata[t2]}
            docs = _proximity_match(td2, OR, t2, window, ordered).astype(np.int64)
            if docs.size and excl_arr is not None:
                docs = docs[~np.isin(docs, excl_arr)]
            if docs.size == 0:
                continue
            score_terms = dict.fromkeys((*alts, t2))
            scores = np.zeros(len(docs))
            for t in score_terms:
                if t not in termdata or t not in idf:
                    continue
                dt, tft, dlt, _pf, _po = termdata[t]
                ix = np.searchsorted(dt, docs)
                ixc = np.minimum(ix, max(len(dt) - 1, 0))
                hit = (ix < len(dt)) & (dt[ixc] == docs)
                tfv = tft[ixc].astype(np.float64)
                dlv = dlt[ixc].astype(np.float64)
                contrib = idf[t] * (tfv * (k1 + 1.0)) / (
                    tfv + k1 * (1.0 - b + b * dlv / avgdl)
                )
                scores += np.where(hit, contrib, 0.0)
            r = np.round(scores, 6)
            order = np.lexsort((docs, -r))[:k]
            out_q.extend([qid] * len(order))
            out_d.extend(int(docs[i]) for i in order)
            out_s.extend(float(scores[i]) for i in order)
    if out_q:
        yield pa.RecordBatch.from_pydict(
            {"query_id": out_q, "doc_id": out_d, "score": out_s},
            schema=pa.schema(
                [("query_id", pa.int64()), ("doc_id", pa.int64()), ("score", pa.float64())]
            ),
        )


def span_or_near_topk(
    index: InvertedIndex,
    queries: list[tuple[int, tuple[str, ...], str]],
    k: int = 10,
    window: int = 3,
    k1: float = BM25_K1,
    b: float = BM25_B,
    ordered: bool = False,
) -> DataFrame:
    """(query_id, rank, doc_id, score): Lucene SpanOrQuery inside a
    span-near — docs where ANY of the alternative terms occurs within
    ``window`` tokens of ``t2`` (distinct occurrences; ``ordered=True``
    makes the alternative precede ``t2``, span-near inOrder). With the
    existing near / not / first / containing / within operators this
    completes the Lucene span-algebra family.

    The OR side is materialized per shard as ONE synthetic posting
    run — the union of the alternatives' (doc, position) streams
    (``_merge_or_termdata``) — and then the standard vectorized
    proximity kernel runs unchanged, so SpanOr costs one extra merge
    pass, never a per-alternative rescan. Matching docs are
    BM25-scored over the terms of the query THAT THE DOC CONTAINS
    (alternatives it lacks contribute zero — the oracle's tf join
    drops them naturally). OOV alternatives are ignored; all-OOV
    alternatives or an OOV ``t2`` empty the query.

    Oracle shape: positions join with ``p1.term IN alts``,
    ``abs(p2.pos - p1.pos) <= window AND p2.pos <> p1.pos``.

    Scale shape: identical to ``proximity_topk`` — term-filtered
    postings scan (pushdown over alts + t2), per-shard vectorized
    kernel, shard-local top-k into the global rank window."""
    plan: list[tuple[int, tuple[str, ...], str]] = []
    all_terms: set[str] = set()
    for qid, alts_raw, t2_raw in queries:
        alts = tuple(
            dict.fromkeys(a.strip().lower() for a in alts_raw if a.strip())
        )
        t2 = t2_raw.strip().lower()
        if alts and t2:
            plan.append((qid, alts, t2))
            all_terms.update((*alts, t2))
    spark = index.postings.sparkSession
    empty = "query_id long, rank int, doc_id long, score double"
    if not plan:
        return spark.createDataFrame([], empty)
    n = index.n_docs
    dfs = index.df_for_terms(all_terms)
    idf = {
        t: math.log((n - d + 0.5) / (d + 0.5) + 1.0) for t, d in dfs.items() if d > 0
    }
    plan = [
        (qid, tuple(a for a in alts if a in idf), t2)
        for qid, alts, t2 in plan
        if t2 in idf
    ]
    plan = [(qid, alts, t2) for qid, alts, t2 in plan if alts]
    if not plan:
        return spark.createDataFrame([], empty)
    avgdl = index.avgdl
    excl = tuple(sorted(index.tombstones)) if index.tombstones else ()
    live = {t for _q, alts, t2 in plan for t in (*alts, t2)}
    filtered = index.postings.filter(F.col("term").isin(list(live)))
    n_parts = spark.sparkContext.defaultParallelism
    vers = index.doc_versions
    per_shard = shard_partitioned(index, filtered, n_parts).mapInArrow(
        lambda it: _span_or_partition(
            it, plan, k, window, idf, avgdl, k1, b, ordered, excl, vers
        ),
        "query_id long, doc_id long, score double",
    )
    return topk(per_shard, k).select("query_id", "rank", "doc_id", "score")
