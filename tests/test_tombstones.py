"""LSM deletion tombstones: query-time masking is exact under
unchanged stats, compaction folds deletes in physically, and the
conjunctive/WAND paths agree."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce
from embed_rerank_spark.operators.wand import conjunctive_topk, wand_topk
from embed_rerank_spark.plans.build_index import build_incremental, extract_pages
from embed_rerank_spark.plans.tiered import (
    compact,
    delete_docs,
    load_tiered,
    load_tombstones,
)
from embed_rerank_spark.sources.pages import generate_pages

QUERIES = [(1, "w1 w2 the"), (2, "w40 data w7"), (3, "w3 w11 w200")]


def _canon(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tombs"))
    pages = generate_pages(spark, 800, seed=23, n_snapshots=4).cache()
    build_incremental(spark, pages, path, n_shards=4, block_size=32)
    corpus = (
        extract_pages(pages).filter(F.col("error").isNull()).select("doc_id", "text")
    ).cache()
    # delete the top-1 doc of each query (so masking visibly changes
    # results) plus some arbitrary ids
    top1 = [
        r["doc_id"]
        for r in wand_topk(load_tiered(spark, path), QUERIES, k=1).collect()
    ]
    victims = sorted(set(top1))
    delete_docs(path, victims)
    return path, pages, corpus, victims


def test_query_time_mask_is_exact_under_full_stats(spark, setup):
    """Before compaction: stats still count deleted docs (Lucene
    visibility model); results = brute force over the full corpus with
    deleted docs filtered out of the candidate set."""
    path, _pages, corpus, victims = setup
    assert load_tombstones(path) == frozenset(victims)
    idx = load_tiered(spark, path)
    assert idx.tombstones == frozenset(victims)

    from embed_rerank_spark.operators.bm25 import (
        bm25_scores_bruteforce,
        query_terms,
        topk,
    )

    got = _canon(wand_topk(idx, QUERIES, k=8))
    scored = bm25_scores_bruteforce(corpus, query_terms(spark, QUERIES))
    want = _canon(
        topk(scored.filter(~F.col("doc_id").isin(victims)), 8).select(
            "query_id", "rank", "doc_id", "score"
        )
    )
    assert got == want
    assert not any(d in victims for _q, _r, d, _s in got)
    assert got, "mask test produced no rows"


def test_conjunctive_masks_tombstones(spark, setup):
    path, _pages, _corpus, victims = setup
    idx = load_tiered(spark, path)
    out = _canon(conjunctive_topk(idx, QUERIES, k=8))
    assert out and not any(d in victims for _q, _r, d, _s in out)
    # both conjunctive paths agree under the mask
    leap = _canon(conjunctive_topk(idx, QUERIES, k=8, taat_threshold=0))
    vect = _canon(conjunctive_topk(idx, QUERIES, k=8, taat_threshold=10**9))
    assert leap == vect == out


def test_compaction_applies_tombstones_physically(spark, setup):
    """Compacting ALL units into one tier removes the deleted docs'
    postings and doc stats: post-compaction results equal brute force
    over the REDUCED corpus (stats recomputed without deleted docs)."""
    path, pages, corpus, victims = setup
    created = compact(spark, path, fanout=4)  # 4 L0 -> one L1
    assert created
    with open(f"{path}/{created[-1]}/MANIFEST.json") as f:
        assert json.load(f)["tombstones_applied"] == len(victims)

    idx = load_tiered(spark, path)
    # stats shrank: deleted docs are out of doc_stats entirely
    assert idx.n_docs == corpus.count() - len(victims)

    reduced = corpus.filter(~F.col("doc_id").isin(victims))
    got = _canon(wand_topk(idx, QUERIES, k=8))
    want = _canon(bm25_topk_bruteforce(spark, reduced, QUERIES, k=8))
    assert got == want and got


def test_filtered_retrieval_both_paths_and_with_tombstones(spark, setup):
    """allowed_docs masks BOTH query paths identically (force each via
    taat_threshold) and composes with tombstones: allowed minus
    deleted."""
    from embed_rerank_spark.operators.bm25 import (
        bm25_scores_bruteforce,
        query_terms,
        topk,
    )

    path, _pages, corpus, victims = setup
    idx = load_tiered(spark, path)
    allowed = [
        r["doc_id"] for r in corpus.select("doc_id").limit(120).collect()
    ]

    taat = _canon(wand_topk(idx, QUERIES, k=8, taat_threshold=10**9,
                            allowed_docs=allowed))
    walk = _canon(wand_topk(idx, QUERIES, k=8, taat_threshold=0,
                            allowed_docs=allowed))
    assert taat == walk and taat

    # this test runs after the compaction test: deletes are already
    # folded into the index's corpus stats, so the brute-force
    # reference scores over the REDUCED corpus
    reduced = corpus.filter(~F.col("doc_id").isin(victims))
    scored = bm25_scores_bruteforce(reduced, query_terms(spark, QUERIES))
    want = _canon(
        topk(scored.filter(F.col("doc_id").isin(allowed)), 8).select(
            "query_id", "rank", "doc_id", "score"
        )
    )
    assert taat == want
    assert not any(d in victims for _q, _r, d, _s in taat)


def test_positional_readers_mask_tombstones(spark, tmp_path_factory):
    """Phrase, proximity, and boolean readers honor the handle's
    tombstones (same contract as WAND/conjunctive)."""
    from embed_rerank_spark.operators.boolean import boolean_topk
    from embed_rerank_spark.operators.positions import (
        build_positional_postings,
        load_positional_index,
        phrase_topk,
        proximity_topk,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = load_positional_index(build_positional_postings(docs, n_shards=4))
    PH = [(1, "fast table")]
    top = phrase_topk(idx, PH, k=1).collect()[0]["doc_id"]
    idx.tombstones = frozenset([top])
    assert top not in {r["doc_id"] for r in phrase_topk(idx, PH, k=10).collect()}
    assert top not in {
        r["doc_id"]
        for r in proximity_topk(idx, [(1, "fast", "table")], k=50, window=3).collect()
    }
    assert top not in {
        r["doc_id"] for r in boolean_topk(idx, [(1, '"fast table"')], k=50).collect()
    }


def test_retire_tombstones_after_full_compaction(spark, tmp_path_factory):
    """A tombstone whose docs are physically gone from every live unit
    retires at compaction, so a later re-ingest of the same doc id is
    visible again (correct LSM shadowing)."""
    import os

    from embed_rerank_spark.plans.tiered import _tombstone_dir

    path = str(tmp_path_factory.mktemp("retire"))
    pages = generate_pages(spark, 400, seed=29, n_snapshots=4).cache()
    build_incremental(spark, pages, path, n_shards=4, block_size=32)
    victim = wand_topk(load_tiered(spark, path), QUERIES, k=1).collect()[0]["doc_id"]
    delete_docs(path, [victim])
    assert load_tombstones(path) == frozenset([victim])

    compact(spark, path, fanout=4)  # applies the delete everywhere
    assert load_tombstones(path) == frozenset()  # retired
    assert os.listdir(_tombstone_dir(path)) == []

    idx = load_tiered(spark, path)
    assert idx.tombstones is None
    assert victim not in {
        r["doc_id"] for r in wand_topk(idx, QUERIES, k=10).collect()
    }  # physically gone from the compacted unit
