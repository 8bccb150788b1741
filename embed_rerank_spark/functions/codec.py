"""Posting-list compression: delta + varbyte (LEB128) with fixed-size
blocks and per-block max-score headers.

No reference analogue (the reference has no index; SURVEY.md §2.6) —
this is the engine's from-scratch storage format for term-partitioned
posting lists:

- doc ids are sorted ascending, delta-encoded (first value absolute),
  varbyte-compressed; term frequencies and doc lengths are
  varbyte-compressed raw values
- blocks hold <= ``block_size`` postings; each block header carries
  (first_doc, last_doc, n_docs, max_tf, min_dl)
- the WAND upper bound for a block is computed at QUERY time as
  ``idf * tfpart(max_tf, min_dl)`` — tfpart is increasing in tf and
  decreasing in dl, so (max_tf, min_dl) gives a safe bound that stays
  valid when corpus stats (N, avgdl) drift across snapshot merges,
  without re-encoding blocks

Both codec directions are NumPy-vectorized (the encode runs inside
Arrow batches on executors; a Python per-byte loop would dominate
index-build time at scale).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK_SIZE = 128
_MAX_VB_BYTES = 10  # ceil(64/7)


def vb_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128 varbyte encode of a uint64 array (high bit = continue).
    Returns (stream, per-value byte counts) — the counts let callers
    slice one big encoded stream into per-block payloads without
    re-encoding (the vectorized partition encoder relies on this)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
    groups = np.empty((n, _MAX_VB_BYTES), dtype=np.uint8)
    nbytes = np.ones(n, dtype=np.int64)
    tmp = v.copy()
    for i in range(_MAX_VB_BYTES):
        groups[:, i] = (tmp & np.uint64(0x7F)).astype(np.uint8)
        tmp >>= np.uint64(7)
        if i + 1 < _MAX_VB_BYTES:
            nbytes += (tmp != 0).astype(np.int64)
    cols = np.arange(_MAX_VB_BYTES)
    used = cols[None, :] < nbytes[:, None]
    # continuation bit on every byte except the last of each value
    cont = cols[None, :] < (nbytes - 1)[:, None]
    groups = np.where(cont, groups | 0x80, groups)
    return groups[used].tobytes(), nbytes


def vb_encode(values: np.ndarray) -> bytes:
    """LEB128 varbyte encode of a uint64 array (high bit = continue)."""
    return vb_encode_with_lengths(values)[0]


def vb_decode(data: bytes, count: int | None = None) -> np.ndarray:
    """Decode a varbyte stream back to uint64 values."""
    b = np.frombuffer(data, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(b < 0x80)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    n = len(ends)
    if count is not None and n != count:
        raise ValueError(f"corrupt varbyte stream: {n} values, expected {count}")
    vals = np.zeros(n, dtype=np.uint64)
    for j in range(int(lengths.max())):
        mask = lengths > j
        vals[mask] |= (b[starts[mask] + j] & np.uint8(0x7F)).astype(np.uint64) << np.uint64(
            7 * j
        )
    return vals


_SIGN_BIT = np.uint64(1 << 63)


def _bias(a: np.ndarray) -> np.ndarray:
    """Order-preserving signed-int64 -> uint64 map (XOR the sign bit).
    Doc ids are xxhash64 values spanning the full int64 range, so
    deltas between neighbors can exceed int64 — all delta arithmetic
    happens in uint64 on the biased representation."""
    return a.astype(np.int64).view(np.uint64) ^ _SIGN_BIT


def _unbias(u: np.ndarray) -> np.ndarray:
    return (u ^ _SIGN_BIT).view(np.int64)


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Ascending int64 array -> uint64 deltas (first value absolute,
    biased)."""
    u = _bias(np.asarray(sorted_ids, dtype=np.int64))
    out = np.empty_like(u)
    out[0] = u[0]
    np.subtract(u[1:], u[:-1], out=out[1:])
    if len(u) > 1 and (u[1:] <= u[:-1]).any():
        raise ValueError("doc ids must be strictly ascending")
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return _unbias(np.cumsum(deltas.astype(np.uint64), dtype=np.uint64))


def delta_decode_blocks(deltas: np.ndarray, block_starts: np.ndarray) -> np.ndarray:
    """Decode a CONCATENATED delta stream holding many blocks (first
    value of each block absolute-biased) in one vectorized pass.

    Uses a global cumsum then subtracts, per block, the cumsum value
    just before the block start — all arithmetic is modular uint64, so
    wraparound cancels exactly.
    """
    d = np.ascontiguousarray(deltas, dtype=np.uint64)
    starts = np.asarray(block_starts, dtype=np.int64)
    if len(d) == 0:
        return np.empty(0, dtype=np.int64)
    c = np.cumsum(d, dtype=np.uint64)
    prior = np.where(starts > 0, c[np.maximum(starts, 1) - 1], np.uint64(0))
    reps = np.diff(np.append(starts, len(d)))
    u = c - np.repeat(prior, reps)
    return _unbias(u)


@dataclass
class PostingBlock:
    """One encoded block of a term's posting list."""

    block_id: int
    first_doc: int
    last_doc: int
    n_docs: int
    max_tf: int
    min_dl: int
    docs_bin: bytes
    tfs_bin: bytes
    dls_bin: bytes


def encode_posting_list(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> list[PostingBlock]:
    """Encode one term's postings (sorted by doc_id asc) into blocks."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    blocks: list[PostingBlock] = []
    for bid, start in enumerate(range(0, len(doc_ids), block_size)):
        d = doc_ids[start : start + block_size]
        t = tfs[start : start + block_size]
        l = dls[start : start + block_size]
        blocks.append(
            PostingBlock(
                block_id=bid,
                first_doc=int(d[0]),
                last_doc=int(d[-1]),
                n_docs=len(d),
                max_tf=int(t.max()),
                min_dl=int(l.min()),
                docs_bin=vb_encode(delta_encode(d)),
                tfs_bin=vb_encode(t.astype(np.uint64)),
                dls_bin=vb_encode(l.astype(np.uint64)),
            )
        )
    return blocks


def decode_block(
    docs_bin: bytes, tfs_bin: bytes, dls_bin: bytes, n_docs: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (doc_ids asc int64, tfs int64, dls int64)."""
    doc_ids = delta_decode(vb_decode(docs_bin, n_docs))
    tfs = vb_decode(tfs_bin, n_docs).astype(np.int64)
    dls = vb_decode(dls_bin, n_docs).astype(np.int64)
    return doc_ids, tfs, dls
