"""Tiered compaction: same-level merges only, higher tiers never
rewritten by new snapshots, and the multi-unit query view answers
rank-identically to brute force."""

from __future__ import annotations

import os
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce
from embed_rerank_spark.operators.wand import wand_topk
from embed_rerank_spark.plans.build_index import build_incremental, extract_pages
from embed_rerank_spark.plans.tiered import compact, live_units, load_tiered
from embed_rerank_spark.sources.pages import generate_pages

QUERIES = [(1, "w1 w2 the"), (2, "w40 data w7"), (3, "w3 w11 w200")]


def _snapshot_days(pages):
    return sorted(
        r[0]
        for r in pages.select(F.date_format("warc_ts", "yyyy-MM-dd")).distinct().collect()
    )


def _file_state(d: str) -> dict[str, tuple[int, float]]:
    out = {}
    for p in Path(d).rglob("*"):
        if p.is_file():
            st = p.stat()
            out[str(p)] = (st.st_size, st.st_mtime_ns)
    return out


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, 1000, seed=13, n_snapshots=5).cache()


def test_compaction_levels_and_no_higher_tier_rewrite(spark, pages, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiered"))
    days = _snapshot_days(pages)
    first4 = pages.filter(F.date_format("warc_ts", "yyyy-MM-dd").isin(days[:4]))

    build_incremental(spark, first4, path, n_shards=4, block_size=32)
    created = compact(spark, path, fanout=4)
    assert len(created) == 1 and created[0].startswith("tiers/L1/")
    assert live_units(path) == [(1, created[0])]

    # query over the single L1 tier == brute force over the 4-day corpus
    idx = load_tiered(spark, path)
    corpus = extract_pages(first4).filter(F.col("error").isNull()).select("doc_id", "text")
    brute = [
        (r.query_id, r.rank, r.doc_id, round(r.score, 6))
        for r in bm25_topk_bruteforce(spark, corpus, QUERIES, k=8).collect()
    ]
    wand = [
        (r.query_id, r.rank, r.doc_id, round(r.score, 6))
        for r in wand_topk(idx, QUERIES, k=8).collect()
    ]
    assert sorted(brute) == sorted(wand) and len(wand) > 0

    l1_state = _file_state(f"{path}/{created[0]}")

    # 5th snapshot: builds one L0 segment; compaction must NOT touch L1
    build_incremental(spark, pages, path, n_shards=4, block_size=32)
    assert compact(spark, path, fanout=4) == []  # 1 live L0 + 1 live L1 < fanout
    assert _file_state(f"{path}/{created[0]}") == l1_state
    assert live_units(path) == [(0, f"segments/{days[4]}"), (1, created[0])]

    # multi-unit query view (L1 tier + fresh L0 segment): still exact
    idx2 = load_tiered(spark, path)
    corpus5 = extract_pages(pages).filter(F.col("error").isNull()).select("doc_id", "text")
    brute5 = [
        (r.query_id, r.rank, r.doc_id, round(r.score, 6))
        for r in bm25_topk_bruteforce(spark, corpus5, QUERIES, k=8).collect()
    ]
    wand5 = [
        (r.query_id, r.rank, r.doc_id, round(r.score, 6))
        for r in wand_topk(idx2, QUERIES, k=8).collect()
    ]
    assert sorted(brute5) == sorted(wand5) and len(wand5) > 0


def test_level_promotion_merges_same_level_only(spark, pages, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiered2"))
    build_incremental(spark, pages, path, n_shards=4, block_size=32)  # 5 segments
    created = compact(spark, path, fanout=2)
    # 5 L0 -> two L1 (+1 leftover L0) -> one L2; leftover L0 stays live
    levels = sorted(lvl for lvl, _ in live_units(path))
    assert levels == [0, 2]
    assert [c.split("/")[1] for c in created] == ["L1", "L1", "L2"]
    # every tier's inputs are all from ONE level below it
    import json

    for c in created:
        with open(f"{path}/{c}/MANIFEST.json") as f:
            m = json.load(f)
        lvl = int(c.split("/")[1][1:])
        for u in m["inputs"]:
            input_lvl = 0 if u.startswith("segments/") else int(u.split("/")[1][1:])
            assert input_lvl == lvl - 1

    idx = load_tiered(spark, path)
    corpus = extract_pages(pages).filter(F.col("error").isNull()).select("doc_id", "text")
    brute = [
        (r.query_id, r.rank, r.doc_id)
        for r in bm25_topk_bruteforce(spark, corpus, QUERIES, k=6).collect()
    ]
    wand = [
        (r.query_id, r.rank, r.doc_id)
        for r in wand_topk(idx, QUERIES, k=6).collect()
    ]
    assert sorted(brute) == sorted(wand) and len(wand) > 0
