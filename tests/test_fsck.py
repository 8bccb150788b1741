"""Index fsck: a clean build passes every invariant; injected header
corruption, payload truncation, and manifest drift are detected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.operators.postings import (
    InvertedIndex,
    build_postings,
    lineage_manifest,
    write_index,
)
from embed_rerank_spark.plans.fsck import fsck_blocks, fsck_index, fsck_overlaps


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    from embed_rerank_spark.sources.pages import generate_pages

    d = str(tmp_path_factory.mktemp("fsck") / "idx")
    docs = generate_pages(spark, 800, seed=11).select(
        F.xxhash64("url").alias("doc_id"), "text"
    )
    idx = build_postings(docs, n_shards=4, block_size=16, n_salts=2)
    write_index(idx, d)
    handle = InvertedIndex.load(spark, d)
    manifest = spark.read.parquet(f"{d}/manifest")
    return handle, manifest


def test_clean_index_passes(spark, built):
    handle, manifest = built
    report = fsck_index(handle, manifest)
    assert report["ok"], report
    assert report["bad_blocks"] == 0
    assert report["manifest_match"] is True
    assert report["postings"] == report["manifest_postings"] > 0
    assert report["range_overlap_groups"] == []


def test_header_corruption_detected(spark, built):
    handle, _ = built
    # stale block-max header: the exact defect that silently breaks
    # WAND pruning — fsck must flag every altered block
    corrupted = handle.postings.withColumn(
        "max_tf", F.col("max_tf") + (F.col("block_id") == 0).cast("int")
    )
    bad = fsck_blocks(corrupted).filter(~F.col("ok"))
    n_b0 = handle.postings.filter(F.col("block_id") == 0).count()
    assert bad.count() == n_b0
    assert bad.filter(F.col("err").contains("max_tf")).count() == n_b0


def test_payload_truncation_detected(spark, built):
    handle, _ = built
    corrupted = handle.postings.withColumn(
        "docs_bin",
        F.when(
            F.col("block_id") == 0,
            F.substring(F.col("docs_bin"), 1, 1),
        ).otherwise(F.col("docs_bin")),
    )
    bad = fsck_blocks(corrupted).filter(~F.col("ok"))
    assert bad.count() == handle.postings.filter(F.col("block_id") == 0).count()


def test_range_overlap_detected(spark, built):
    handle, _ = built
    # duplicate every block's doc range -> every multi-block group overlaps
    doubled = handle.postings.union(
        handle.postings.withColumn("block_id", F.col("block_id") + 1000)
    )
    assert fsck_overlaps(doubled).count() > 0
    # and the clean index has none
    assert fsck_overlaps(handle.postings).count() == 0


def test_manifest_drift_detected(spark, built):
    handle, manifest = built
    # drop one shard's postings but keep the manifest: reconciliation fails
    pruned = InvertedIndex(
        postings=handle.postings.filter(F.col("shard") != 0),
        term_stats=handle.term_stats,
        doc_stats=handle.doc_stats,
        n_docs=handle.n_docs,
        avgdl=handle.avgdl,
    )
    report = fsck_index(pruned, manifest)
    assert report["manifest_match"] is False
    assert not report["ok"]
    assert report["bad_blocks"] == 0  # surviving bytes are still valid


def test_cli_fsck(spark, built, tmp_path):
    import embed_rerank_spark.cli as cli

    idx_dir = None
    # rebuild a small index on disk for the CLI (the module fixture's
    # path lives in another tmp factory scope)
    from embed_rerank_spark.sources.pages import generate_pages

    idx_dir = str(tmp_path / "idx")
    docs = generate_pages(spark, 200, seed=3).select(
        F.xxhash64("url").alias("doc_id"), "text"
    )
    write_index(build_postings(docs, n_shards=2, block_size=16), idx_dir)

    stop = spark.stop
    spark.stop = lambda: None
    try:
        assert cli.main(["fsck", "--index", idx_dir]) == 0
        # corrupt one parquet header field via rewrite -> nonzero exit
        bad = spark.read.parquet(f"{idx_dir}/postings").withColumn(
            "max_tf", F.col("max_tf") + 1
        )
        bad.write.mode("overwrite").parquet(f"{tmp_path}/bad_postings")
        spark.read.parquet(f"{tmp_path}/bad_postings").write.mode(
            "overwrite"
        ).parquet(f"{idx_dir}/postings")
        assert cli.main(["fsck", "--index", idx_dir]) == 2
    finally:
        spark.stop = stop
