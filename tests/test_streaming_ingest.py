"""Structured Streaming ingestion into the LSM index: micro-batches
become level-0 segments, compaction folds them, queries match the
batch-built index exactly."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from embed_rerank_spark.operators.postings import InvertedIndex, build_postings  # noqa: E402
from embed_rerank_spark.operators.wand import wand_topk  # noqa: E402
from embed_rerank_spark.plans.build_index import committed_snapshots, extract_pages  # noqa: E402
from embed_rerank_spark.plans.streaming_ingest import (  # noqa: E402
    start_streaming_ingest,
    stream_batch_ingestor,
)
from embed_rerank_spark.plans.tiered import live_units, load_tiered  # noqa: E402
from embed_rerank_spark.sources.pages import generate_pages  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

QUERIES = [(1, "the w1 w2"), (2, "w3 w4 w5"), (3, "w10 w11")]


def _rows(df):
    return [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in sorted(df.collect(), key=lambda r: (r["query_id"], r["rank"]))
    ]


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_ingest")
    src = str(root / "incoming")
    pages = generate_pages(spark, 600, seed=13, n_snapshots=1, vocab_size=50)
    # several files so maxFilesPerTrigger yields several micro-batches
    pages.repartition(5).write.parquet(src)
    return root, src, pages


def test_streaming_build_matches_batch_build(spark, staged):
    root, src, pages = staged
    idx_path = str(root / "index")
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_streaming_ingest(
        stream,
        idx_path,
        checkpoint=str(root / "ckpt"),
        n_shards=4,
        fanout=3,
    )
    q.awaitTermination(300)

    # multiple micro-batches committed, compaction promoted a tier
    snaps = committed_snapshots(idx_path)
    assert len(snaps) >= 2
    assert any(lvl >= 1 for lvl, _ in live_units(idx_path))
    assert os.path.isdir(f"{idx_path}/tiers")

    streamed = load_tiered(spark, idx_path)
    got = _rows(wand_topk(streamed, QUERIES, k=10))

    # batch reference: one-shot index over the same extracted docs
    clean = extract_pages(spark.read.parquet(src)).filter(
        F.col("error").isNull() & (F.col("dl") > 0)
    )
    built = build_postings(clean, n_shards=4)
    cs = built["corpus_stats"].collect()[0]
    batch_index = InvertedIndex(
        postings=built["postings"],
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )
    expect = _rows(wand_topk(batch_index, QUERIES, k=10))
    assert got == expect
    assert len(got) > 0


def test_replayed_batch_is_skipped(spark, staged):
    root, src, _pages = staged
    idx_path = str(root / "index")
    before = committed_snapshots(idx_path)
    assert before
    # replay batch 0 (the exactly-once failure mode foreachBatch has):
    # the committed segment short-circuits, nothing is rewritten
    seg0 = sorted(before)[0]
    manifest = f"{idx_path}/segments/{seg0}/MANIFEST.json"
    mtime = os.path.getmtime(manifest)
    ingest = stream_batch_ingestor(idx_path, n_shards=4, fanout=3)
    ingest(spark.read.parquet(src), int(seg0.rsplit("-", 1)[-1]))
    assert committed_snapshots(idx_path) == before
    assert os.path.getmtime(manifest) == mtime


def test_empty_batch_commits_nothing(spark, staged, tmp_path):
    idx_path = str(tmp_path / "idx_empty")
    ingest = stream_batch_ingestor(idx_path, n_shards=2)
    empty = generate_pages(spark, 10, seed=1, n_snapshots=1).limit(0)
    ingest(empty, 0)
    assert committed_snapshots(idx_path) == set()


def test_dedup_at_the_door_composed_with_ingest(spark, tmp_path):
    """The production ingest chain in ONE pipeline: duplicate-storm
    pages stream -> streaming_exact_dedup (dedup-at-the-door) ->
    exactly-once L0 segment ingest -> tiered index, with WAND top-k
    rank-identical to a batch build over the batch-dedup'd corpus.
    Duplicates are injected both inside one file and across files, so
    the dedup state provably carries across micro-batches."""
    from embed_rerank_spark.operators.dedup import streaming_exact_dedup

    base = generate_pages(spark, 300, seed=29, n_snapshots=1, vocab_size=50)
    # exact-row duplicate storm: 2x a third of the corpus, so whichever
    # arrival survives, the surviving rows are byte-identical
    dups = base.filter(F.col("url").isNotNull()).limit(100)
    storm = base.unionAll(dups).unionAll(dups)
    src = str(tmp_path / "incoming")
    storm.repartition(6).write.parquet(src)  # 6 files -> 6 micro-batches

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped_stream = streaming_exact_dedup(stream, watermark="365 days")
    idx_path = str(tmp_path / "index")
    q = start_streaming_ingest(
        deduped_stream,
        idx_path,
        checkpoint=str(tmp_path / "ckpt"),
        n_shards=4,
        fanout=3,
    )
    q.awaitTermination(300)

    assert len(committed_snapshots(idx_path)) >= 2
    streamed = load_tiered(spark, idx_path)
    got = _rows(wand_topk(streamed, QUERIES, k=10))

    # batch reference: dedup the static corpus the same way (exact
    # content identity; rows are identical so survivor choice is moot),
    # then one-shot build
    batch_clean = extract_pages(
        spark.read.parquet(src).dropDuplicates(["text"])
    ).filter(F.col("error").isNull() & (F.col("dl") > 0))
    built = build_postings(batch_clean, n_shards=4)
    cs = built["corpus_stats"].collect()[0]
    batch_index = InvertedIndex(
        postings=built["postings"],
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )
    expect = _rows(wand_topk(batch_index, QUERIES, k=10))
    assert got == expect
    assert len(got) > 0
    # the index must hold the DEDUP'D doc count (no duplicate storm
    # inflation): 300 distinct pages minus extraction quarantine
    assert streamed.n_docs == batch_index.n_docs
