"""Front-coded term dictionary: codec round-trip, prefix-lookup
parity with the plain dictionary scan, and the compression claim."""

from __future__ import annotations

import pytest

from embed_rerank_spark.plans.dictionary import (
    decode_block,
    dictionary_sizes,
    encode_block,
    prefix_lookup_fc,
    write_front_coded_dictionary,
)


def test_block_codec_roundtrip():
    terms = ["alpha", "alphabet", "alphabetic", "beta", "betamax", "c"]
    dfs = [5, 1, 300, 42, 7, 99999]
    buf = encode_block(terms, dfs)
    assert decode_block(buf, len(terms)) == (terms, dfs)
    # front coding beats whole strings on shared-prefix runs
    assert len(buf) < sum(len(t) for t in terms) + len(terms)


def test_prefix_lookup_matches_plain_dictionary(spark, tmp_path):
    from embed_rerank_spark.operators.postings import InvertedIndex, build_postings, write_index
    from embed_rerank_spark.operators.wand import expand_prefix

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx_dir = str(tmp_path / "idx")
    write_index(build_postings(docs, n_shards=4), idx_dir)
    write_front_coded_dictionary(spark, idx_dir, block=8)
    index = InvertedIndex.load(spark, idx_dir)
    for prefix in ("s", "ta", "zzz", "d"):
        want = expand_prefix(index, prefix, max_expansion=16)
        got = prefix_lookup_fc(spark, idx_dir, prefix, max_expansion=16)
        assert got == want, prefix
    sizes = dictionary_sizes(spark, idx_dir)
    assert sizes["n_terms"] > 0 and sizes["fc_bytes"] > 0
    # every stored df costs 8 bytes in the raw form; fc must not lose
    assert sizes["fc_bytes"] < sizes["raw_bytes"]
