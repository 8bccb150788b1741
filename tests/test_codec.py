"""Round-trip and property tests for the posting-list codec."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from embed_rerank_spark.functions import codec


def test_vb_roundtrip_basics():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63 - 1], dtype=np.uint64)
    enc = codec.vb_encode(vals)
    np.testing.assert_array_equal(codec.vb_decode(enc, len(vals)), vals)


def test_vb_empty():
    assert codec.vb_encode(np.array([], dtype=np.uint64)) == b""
    assert len(codec.vb_decode(b"")) == 0


def test_vb_single_byte_density():
    # values < 128 must take exactly 1 byte each
    vals = np.arange(128, dtype=np.uint64)
    assert len(codec.vb_encode(vals)) == 128


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=500)
)
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    out = codec.vb_decode(codec.vb_encode(vals))
    np.testing.assert_array_equal(out, vals)


def test_vb_count_mismatch_raises():
    enc = codec.vb_encode(np.array([1, 2, 3], dtype=np.uint64))
    with pytest.raises(ValueError, match="corrupt"):
        codec.vb_decode(enc, 2)


def test_delta_roundtrip_and_monotonicity_check():
    ids = np.array([5, 6, 100, 10_000_000_000], dtype=np.int64)
    np.testing.assert_array_equal(codec.delta_decode(codec.delta_encode(ids)), ids)
    with pytest.raises(ValueError, match="ascending"):
        codec.delta_encode(np.array([3, 3], dtype=np.int64))


def test_delta_full_int64_range():
    # xxhash64 doc ids span the whole signed range; neighbor deltas can
    # overflow int64 — the biased-uint64 path must round-trip exactly
    ids = np.array(
        [-(2**63), -5921132407428667389, -1, 0, 1, 5016596771113994359, 2**63 - 1],
        dtype=np.int64,
    )
    np.testing.assert_array_equal(codec.delta_decode(codec.delta_encode(ids)), ids)
    blocks = codec.encode_posting_list(
        ids, np.ones(len(ids), dtype=np.int64), np.full(len(ids), 9, dtype=np.int64), 3
    )
    out = np.concatenate(
        [codec.decode_block(b.docs_bin, b.tfs_bin, b.dls_bin, b.n_docs)[0] for b in blocks]
    )
    np.testing.assert_array_equal(out, ids)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=700, unique=True)
)
@settings(max_examples=100, deadline=None)
def test_posting_list_roundtrip_property(ids):
    doc_ids = np.sort(np.array(ids, dtype=np.int64))
    rng = np.random.default_rng(7)
    tfs = rng.integers(1, 50, len(doc_ids)).astype(np.int64)
    dls = rng.integers(1, 5000, len(doc_ids)).astype(np.int64)
    blocks = codec.encode_posting_list(doc_ids, tfs, dls, block_size=128)
    # headers
    assert sum(b.n_docs for b in blocks) == len(doc_ids)
    assert blocks[0].first_doc == doc_ids[0]
    assert blocks[-1].last_doc == doc_ids[-1]
    # round trip + header invariants per block
    pos = 0
    for b in blocks:
        d, t, l = codec.decode_block(b.docs_bin, b.tfs_bin, b.dls_bin, b.n_docs)
        np.testing.assert_array_equal(d, doc_ids[pos : pos + b.n_docs])
        np.testing.assert_array_equal(t, tfs[pos : pos + b.n_docs])
        np.testing.assert_array_equal(l, dls[pos : pos + b.n_docs])
        assert b.max_tf == t.max() and b.min_dl == l.min()
        assert b.first_doc == d[0] and b.last_doc == d[-1]
        pos += b.n_docs


def test_compression_is_actually_compact():
    # dense ascending ids with small gaps should approach 1 byte/posting
    doc_ids = np.arange(0, 100_000, 3, dtype=np.int64)
    tfs = np.ones(len(doc_ids), dtype=np.int64)
    dls = np.full(len(doc_ids), 100, dtype=np.int64)
    blocks = codec.encode_posting_list(doc_ids, tfs, dls)
    total = sum(len(b.docs_bin) for b in blocks)
    assert total <= len(doc_ids) * 1.1  # ~1 byte per delta
