"""End-to-end index-build job tests: snapshot segments, resume
semantics, merge correctness, per-url extraction invariant."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.functions import text_processing as tp
from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce
from embed_rerank_spark.operators.wand import wand_topk
from embed_rerank_spark.plans.build_index import (
    build_incremental,
    build_index,
    committed_snapshots,
    extract_pages,
    merge_segments,
)
from embed_rerank_spark.sources.pages import generate_pages

N_DOCS = 1200
QUERIES = [
    (1, "w1 w2 w3"),
    (2, "the a"),
    (3, "zyzzyva"),
    (4, "w100 w200 the"),
    (5, "w5 data of w9"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, N_DOCS, seed=7, n_snapshots=3).cache()


@pytest.fixture(scope="module")
def built(spark, pages, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fullindex"))
    idx = build_index(spark, pages, path, n_shards=4, block_size=32)
    return idx, path


def test_pages_deterministic_and_shaped(spark, pages):
    again = generate_pages(spark, N_DOCS, seed=7, n_snapshots=3)
    a = sorted((r.url, r.text, r.lang, str(r.warc_ts)) for r in pages.collect())
    b = sorted((r.url, r.text, r.lang, str(r.warc_ts)) for r in again.collect())
    assert a == b
    assert pages.count() == N_DOCS
    # some docs must exceed the truncation threshold
    # extract uses max_tokens=2048 -> threshold 2048*4 chars
    assert pages.filter(F.length("text") > 2048 * 4).count() > 0
    assert pages.select(F.date_format("warc_ts", "yyyy-MM-dd")).distinct().count() == 3


def test_extraction_invariant_per_url(spark, pages):
    """Byte-identity: distributed extraction == driver-side oracle."""
    got = {
        r.url: r.text
        for r in extract_pages(pages).filter(F.col("error").isNull()).collect()
    }
    raw = {r.url: r.text for r in pages.collect()}
    assert len(got) > 0
    for url, raw_text in raw.items():
        expect, _ = tp.process_text_with_options(raw_text, 2048, 8192, "smart_truncate")
        assert got[url] == expect, url


def test_segments_and_manifests(built):
    _, path = built
    snaps = committed_snapshots(path)
    assert len(snaps) == 3
    for s in snaps:
        with open(f"{path}/segments/{s}/MANIFEST.json") as f:
            m = json.load(f)
        assert m["snapshot"] == s
        assert sum(sh["postings_emitted"] for sh in m["shards"]) > 0
        assert all(sh["bytes_compressed"] > 0 for sh in m["shards"])


def test_merged_index_wand_equals_bruteforce(spark, pages, built):
    idx, _ = built
    corpus = extract_pages(pages).filter(F.col("error").isNull()).select("doc_id", "text")
    for k in (5, 20):
        brute = [
            (r.query_id, r.rank, r.doc_id)
            for r in bm25_topk_bruteforce(spark, corpus, QUERIES, k=k)
            .orderBy("query_id", "rank")
            .collect()
        ]
        wand = [
            (r.query_id, r.rank, r.doc_id)
            for r in wand_topk(idx, QUERIES, k=k).orderBy("query_id", "rank").collect()
        ]
        assert brute == wand and len(brute) > 0


def test_resume_skips_committed_and_completes(spark, pages, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("resumeidx"))
    # full build, then forge a partial state by deleting one manifest
    build_incremental(spark, pages, path, n_shards=4, block_size=32)
    assert len(committed_snapshots(path)) == 3
    victim = sorted(committed_snapshots(path))[1]
    os.remove(f"{path}/segments/{victim}/MANIFEST.json")
    assert len(committed_snapshots(path)) == 2

    built_now = build_incremental(spark, pages, path, n_shards=4, block_size=32)
    assert built_now == [victim]  # only the uncommitted snapshot redone
    # second resume: nothing left to do
    assert build_incremental(spark, pages, path, n_shards=4, block_size=32) == []

    # resumed build must produce an identical index to a fresh one
    idx_resumed = merge_segments(spark, path, block_size=32)
    fresh_path = str(tmp_path_factory.mktemp("freshidx"))
    idx_fresh = build_index(spark, pages, fresh_path, n_shards=4, block_size=32)

    cols = ["shard", "term", "block_id", "first_doc", "last_doc", "n_docs",
            "max_tf", "min_dl", "docs_bin", "tfs_bin", "dls_bin"]
    a = sorted(map(tuple, idx_resumed.postings.select(cols).collect()))
    b = sorted(map(tuple, idx_fresh.postings.select(cols).collect()))
    assert a == b
    assert idx_resumed.n_docs == idx_fresh.n_docs
    assert idx_resumed.avgdl == pytest.approx(idx_fresh.avgdl)


def test_salted_build_and_merge_rank_identical(spark, pages, tmp_path_factory):
    """Full build+merge with range salting: merged index must answer
    rank-identically to the unsalted brute-force scorer."""
    from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce
    from embed_rerank_spark.operators.wand import wand_topk

    path = str(tmp_path_factory.mktemp("saltidx"))
    idx = build_index(spark, pages, path, n_shards=4, block_size=32, n_salts=4)
    corpus = spark.read.parquet(f"{path}/segments/*/extracted").filter(
        F.col("error").isNull()
    ).select("doc_id", "text")
    queries = [(0, "the w3 w500"), (1, "w77 w901 w15")]
    wand = [(r.query_id, r.rank, r.doc_id) for r in wand_topk(idx, queries, k=7).collect()]
    brute = [
        (r.query_id, r.rank, r.doc_id)
        for r in bm25_topk_bruteforce(spark, corpus, queries, k=7).collect()
    ]
    assert sorted(wand) == sorted(brute) and len(wand) > 0


def test_merge_rejects_mismatched_salts(spark, pages, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("saltguard"))
    build_incremental(spark, pages, path, n_shards=4, block_size=32, n_salts=2)
    with pytest.raises(ValueError, match="must match the segment layout"):
        merge_segments(spark, path, block_size=32, n_salts=8)
    # defaulting to the manifest value works
    idx = merge_segments(spark, path, block_size=32)
    assert idx.n_docs > 0


def test_zero_token_docs_excluded_from_corpus_stats(spark, tmp_path_factory):
    """Whitespace-only pages pass extraction (error=None) with dl=0;
    they must not count toward n_docs/avgdl or idf/length-norm drift
    breaks WAND-vs-bruteforce exactness on such corpora."""
    import datetime as dt

    from embed_rerank_spark.sources.pages import PAGES_SCHEMA

    base = generate_pages(spark, 150, seed=11, n_snapshots=2)
    day = dt.datetime(2025, 6, 1, 12)
    blanks = spark.createDataFrame(
        [(f"https://blank.example/{i}", day, None, "   \t  \n ", "en") for i in range(7)],
        PAGES_SCHEMA,
    )
    corpus_pages = base.unionByName(blanks)
    path = str(tmp_path_factory.mktemp("zerotok"))
    idx = build_index(spark, corpus_pages, path, n_shards=4, block_size=32)

    extracted = extract_pages(corpus_pages).filter(F.col("error").isNull())
    n_with_tokens = extracted.filter(F.col("dl") > 0).count()
    assert extracted.count() == n_with_tokens + 7
    assert idx.n_docs == n_with_tokens

    corpus = extracted.select("doc_id", "text")
    queries = [(1, "the w3"), (2, "w10 w55 data")]
    brute = [
        (r.query_id, r.rank, r.doc_id, round(r.score, 6))
        for r in bm25_topk_bruteforce(spark, corpus, queries, k=9).collect()
    ]
    wand = [
        (r.query_id, r.rank, r.doc_id, round(r.score, 6))
        for r in wand_topk(idx, queries, k=9).collect()
    ]
    assert sorted(brute) == sorted(wand) and len(wand) > 0


def test_duplicate_urls_across_snapshots_collapse_at_merge(spark, tmp_path_factory):
    """A url re-crawled in a later snapshot meets itself at merge
    (same xxhash64 doc_id in two segments): the merge must collapse to
    one posting per (term, doc) keeping max tf — not fail-stop, not
    double-count n_docs."""
    import datetime as dt

    from embed_rerank_spark.sources.pages import PAGES_SCHEMA

    d1, d2 = dt.datetime(2025, 6, 1, 9), dt.datetime(2025, 6, 2, 9)
    rows = []
    for i in range(30):
        url = f"https://recrawl.example/{i}"
        rows.append((url, d1, None, "alpha beta gamma", "en"))
        rows.append((url, d2, None, "alpha alpha beta", "en"))
    pages2 = spark.createDataFrame(rows, PAGES_SCHEMA)
    path = str(tmp_path_factory.mktemp("recrawl"))
    idx = build_index(spark, pages2, path, n_shards=2, block_size=8)

    assert idx.n_docs == 30  # unique docs, not 60
    out = wand_topk(idx, [(0, "alpha")], k=60).collect()
    assert len(out) == 30  # one hit per doc, no duplicates

    # scores must equal brute force over the collapsed corpus (max-tf
    # row survives: tf(alpha)=2 from the second crawl, dl=3 either way)
    collapsed = spark.createDataFrame(
        [(f"https://recrawl.example/{i}", "alpha alpha beta") for i in range(30)],
        "url string, text string",
    ).select(F.xxhash64("url").alias("doc_id"), "text")
    brute = bm25_topk_bruteforce(spark, collapsed, [(0, "alpha")], k=60).collect()
    assert sorted((r.doc_id, round(r.score, 6)) for r in out) == sorted(
        (r.doc_id, round(r.score, 6)) for r in brute
    )


def test_partition_sizing_scales_with_data(spark):
    """Shuffle sizing targets constant per-task volume: floor at
    cores/shards for small corpora, linear growth past the knee (the
    session-11 weak-scaling fix — a fixed core-count partitioning made
    per-task memory grow with the corpus and the build superlinear)."""
    from embed_rerank_spark.plans.build_index import (
        ENCODE_DOCS_PER_TASK,
        MERGE_BLOCKS_PER_TASK,
        encode_partitions,
        merge_partitions,
    )

    cores = spark.sparkContext.defaultParallelism
    # small corpus: floor at max(cores, shards), never fewer
    assert encode_partitions(spark, 100, 8) == max(8, cores)
    assert merge_partitions(spark, 100) == max(8, cores)
    # big corpus: linear in volume (ceil division), independent of cores
    n = 100 * ENCODE_DOCS_PER_TASK + 1
    assert encode_partitions(spark, n, 8) == 101
    b = 100 * MERGE_BLOCKS_PER_TASK + 1
    assert merge_partitions(spark, b) == 101


def test_sized_shards_floors_and_volume(spark, monkeypatch):
    """Auto shard sizing: floors at max(min, cores), grows with corpus
    at SHARD_DOCS_PER_SHARD docs per shard (the r04 oversharding rule)."""
    from embed_rerank_spark.plans import build_index as bi

    monkeypatch.setattr(bi, "SHARD_DOCS_PER_SHARD", 100)
    cores = spark.sparkContext.defaultParallelism
    assert bi.sized_shards(spark, 1) == max(8, cores)
    big = 100 * (cores + 50)
    assert bi.sized_shards(spark, big) == cores + 50
    assert bi.sized_shards(spark, big + 1) == cores + 51


def test_build_incremental_auto_shards_consistent_across_segments(
    spark, pages, tmp_path, monkeypatch
):
    """n_shards=None resolves ONCE from the total corpus (not per
    snapshot segment): every segment manifest carries the same shard
    count, and the merged index loads/queries normally."""
    from embed_rerank_spark.plans import build_index as bi

    monkeypatch.setattr(bi, "SHARD_DOCS_PER_SHARD", 200)
    cores = spark.sparkContext.defaultParallelism
    want = max(8, cores, -(-N_DOCS // 200))
    path = str(tmp_path / "autoshards")
    bi.build_incremental(spark, pages, path, n_shards=None, block_size=32)
    seen = set()
    seg_root = f"{path}/segments"
    snaps = os.listdir(seg_root)
    assert len(snaps) == 3
    for snap in snaps:
        with open(f"{seg_root}/{snap}/MANIFEST.json") as f:
            seen.add(json.load(f)["n_shards"])
    assert seen == {want}
