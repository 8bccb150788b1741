"""Index-build correctness: encoded postings must decode back to
exactly the brute-force tf table, across batch/partition boundaries."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.functions.codec import decode_block
from embed_rerank_spark.operators.bm25 import doc_lengths, term_freqs
from embed_rerank_spark.operators.postings import (
    InvertedIndex,
    build_postings,
    lineage_manifest,
    write_index,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def index(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("index"))
    idx = build_postings(docs, n_shards=4, block_size=16)  # small blocks: force multi-block terms
    write_index(idx, path)
    return InvertedIndex.load(spark, path), path


def _decode_all(postings_pdf):
    """Decode every block -> set of (term, doc_id, tf, dl)."""
    out = set()
    for row in postings_pdf.itertuples(index=False):
        d, t, l = decode_block(row.docs_bin, row.tfs_bin, row.dls_bin, row.n_docs)
        assert row.first_doc == d[0] and row.last_doc == d[-1]
        assert row.max_tf == t.max() and row.min_dl == l.min()
        assert (np.diff(d) > 0).all()
        for i in range(len(d)):
            out.add((row.term, int(d[i]), int(t[i]), int(l[i])))
    return out


def test_postings_roundtrip_equals_tf_table(spark, docs, index):
    idx, _ = index
    postings = idx.postings.toPandas()
    decoded = _decode_all(postings)

    tf = term_freqs(docs)
    dl = doc_lengths(tf)
    expected = {
        (r.term, r.doc_id, r.tf, r.dl)
        for r in tf.join(dl, "doc_id").collect()
    }
    assert decoded == expected


def test_shard_assignment_and_block_sizing(index):
    idx, _ = index
    pdf = idx.postings.toPandas()
    # every posting's doc ids belong to the row's shard
    for row in pdf.itertuples(index=False):
        d, _, _ = decode_block(row.docs_bin, row.tfs_bin, row.dls_bin, row.n_docs)
        assert (d % 4 == row.shard).all()
        assert row.n_docs <= 16
    # multi-block terms exist (block_size=16 with hot terms over 500 docs)
    assert (pdf.block_id > 0).any()
    # block ids are dense per (shard, term)
    g = pdf.groupby(["shard", "term"])["block_id"]
    assert (g.max() + 1 == g.count()).all()


def test_corpus_and_term_stats(spark, docs, index):
    idx, _ = index
    tf = term_freqs(docs)
    expected_df = {(r.term, r.df) for r in tf.groupBy("term").count()
                   .withColumnRenamed("count", "df").collect()}
    assert {(r.term, r.df) for r in idx.term_stats.collect()} == expected_df
    dl = doc_lengths(tf)
    n, avg = dl.agg(F.count(F.lit(1)), F.avg("dl")).first()
    assert idx.n_docs == n
    assert idx.avgdl == pytest.approx(avg)


def test_lineage_manifest(spark, index):
    idx, path = index
    m = spark.read.parquet(f"{path}/manifest").toPandas()
    assert set(m.shard) == {0, 1, 2, 3}
    assert (m.postings_emitted > 0).all()
    assert (m.bytes_compressed > 0).all()
    assert (m.docs_tokenized > 0).all()
    # totals line up with the postings table
    assert m.postings_emitted.sum() == idx.postings.agg(F.sum("n_docs")).first()[0]


def test_salted_build_same_content_and_ranking(spark, docs):
    """n_salts>1 must not change decoded content, and WAND over a
    salted index must stay rank-identical to brute force."""
    from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce
    from embed_rerank_spark.operators.wand import wand_topk

    salted = build_postings(docs, n_shards=4, block_size=16, n_salts=4)
    postings = salted["postings"].toPandas()
    decoded = _decode_all(postings)
    tf = term_freqs(docs)
    dl = doc_lengths(tf)
    expected = {
        (r.term, r.doc_id, r.tf, r.dl) for r in tf.join(dl, "doc_id").collect()
    }
    assert decoded == expected

    # salt runs: no overlapping doc ranges within (shard, term)
    for (_s, _t), grp in postings.groupby(["shard", "term"]):
        g = grp.sort_values("first_doc")
        assert (g.first_doc.values[1:] > g.last_doc.values[:-1]).all()

    cs = salted["corpus_stats"].collect()[0]
    idx = InvertedIndex(
        postings=salted["postings"],
        term_stats=salted["term_stats"],
        doc_stats=salted["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )
    queries = [(0, "the data table"), (1, "spark window")]
    got = [(r.query_id, r.rank, r.doc_id) for r in wand_topk(idx, queries, k=8).collect()]
    want = [
        (r.query_id, r.rank, r.doc_id)
        for r in bm25_topk_bruteforce(spark, docs, queries, k=8).collect()
    ]
    assert sorted(got) == sorted(want)


def test_encoder_collapses_duplicate_doc_ids():
    """Duplicate (term, shard, doc_id) rows — xxhash64(url) collisions
    or re-crawled urls meeting at merge — must collapse to ONE posting
    keeping the max-tf row (ties: max dl), never raise."""
    import pyarrow as pa

    from embed_rerank_spark.operators.postings import _ARROW_OUT, encode_grouped_rows

    terms_dict = pa.array(["t"])
    tidx = np.zeros(5, dtype=np.int64)
    shard = np.zeros(5, dtype=np.int64)
    #            unique | dup pair (keep tf=4,dl=9) | tf-tie pair (keep dl=7)
    doc = np.array([10, 20, 20, 30, 30], dtype=np.int64)
    tf = np.array([1, 2, 4, 3, 3], dtype=np.int64)
    dl = np.array([5, 8, 9, 6, 7], dtype=np.int64)
    batches = list(encode_grouped_rows(terms_dict, tidx, shard, doc, tf, dl, 128))
    assert len(batches) == 1 and batches[0].schema == _ARROW_OUT
    row = batches[0].to_pylist()[0]
    d, f, l = decode_block(row["docs_bin"], row["tfs_bin"], row["dls_bin"], row["n_docs"])
    assert d.tolist() == [10, 20, 30]
    assert f.tolist() == [1, 4, 3]
    assert l.tolist() == [5, 9, 7]
    # genuinely unsorted input (descending) still fail-stops
    with pytest.raises(ValueError, match="strictly ascending"):
        list(
            encode_grouped_rows(
                terms_dict,
                np.zeros(2, dtype=np.int64),
                np.zeros(2, dtype=np.int64),
                np.array([20, 10], dtype=np.int64),
                np.array([1, 1], dtype=np.int64),
                np.array([5, 5], dtype=np.int64),
                128,
            )
        )


def test_combined_table_large_offsets_and_chunking():
    """combined_table upcasts string/binary to 64-bit-offset types (the
    2 GiB int32 overflow guard) and merges multi-batch partitions into
    one contiguous chunk per column."""
    import pyarrow as pa

    from embed_rerank_spark.operators.postings import combined_table

    batch = pa.RecordBatch.from_pydict(
        {"term": ["a", "b"], "payload": [b"\x01", b"\x02\x03"], "n": [1, 2]}
    )
    tbl = combined_table([batch, batch])
    assert tbl.schema.field("term").type == pa.large_string()
    assert tbl.schema.field("payload").type == pa.large_binary()
    assert tbl.schema.field("n").type == pa.int64()
    for name in tbl.schema.names:
        assert tbl.column(name).num_chunks == 1
    assert tbl.column("term").to_pylist() == ["a", "b", "a", "b"]


def test_preload_dictionary_completes_df_cache(spark, tmp_path):
    from embed_rerank_spark.operators.postings import (
        InvertedIndex,
        build_postings,
        write_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "idx")
    write_index(build_postings(docs, n_shards=4), path)
    idx = InvertedIndex.load(spark, path)
    lazy = idx.df_for_terms({"the", "scan", "no-such-term"})

    idx2 = InvertedIndex.load(spark, path)
    assert idx2.preload_dictionary()
    # complete dictionary answers without any further Spark job —
    # including proving absence (df 0) for unseen terms
    idx2.term_stats = None  # any lookup attempt would now blow up
    assert idx2.df_for_terms({"the", "scan", "no-such-term"}) == lazy

    idx3 = InvertedIndex.load(spark, path)
    assert not idx3.preload_dictionary(max_terms=3)  # over the cap
