"""Snapshot time travel (as-of views) over the tiered LSM index."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce  # noqa: E402
from embed_rerank_spark.operators.wand import wand_topk  # noqa: E402
from embed_rerank_spark.plans.build_index import build_incremental, extract_pages  # noqa: E402
from embed_rerank_spark.plans.tiered import (  # noqa: E402
    compact,
    load_tiered_as_of,
    units_as_of,
)
from embed_rerank_spark.sources.pages import generate_pages  # noqa: E402

QUERIES = [(1, "w1 w2 the"), (2, "w4 data w7"), (3, "w3 w11 w20")]


def _days(pages):
    return sorted(
        r[0]
        for r in pages.select(F.date_format("warc_ts", "yyyy-MM-dd")).distinct().collect()
    )


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("asof"))
    pages = generate_pages(spark, 800, seed=17, n_snapshots=5, vocab_size=60).cache()
    build_incremental(spark, pages, path, n_shards=4, block_size=32)
    # fanout 4: snaps 1-4 fold into one L1 tier, snap 5 stays L0
    created = compact(spark, path, fanout=4)
    assert len(created) == 1
    return path, pages


def test_as_of_cut_inside_a_tier_falls_back_to_segments(spark, built):
    path, pages = built
    days = _days(pages)
    cut = days[1]  # inside the compacted 4-day tier
    units = units_as_of(path, cut)
    assert units == [
        (0, f"segments/{days[0]}"),
        (0, f"segments/{days[1]}"),
    ]
    idx = load_tiered_as_of(spark, path, cut)
    sub = pages.filter(F.date_format("warc_ts", "yyyy-MM-dd") <= cut)
    corpus = extract_pages(sub).filter(F.col("error").isNull()).select("doc_id", "text")
    assert _rows(wand_topk(idx, QUERIES, k=8)) == _rows(
        bm25_topk_bruteforce(spark, corpus, QUERIES, k=8)
    )


def test_as_of_cut_at_tier_boundary_uses_the_tier(spark, built):
    path, pages = built
    days = _days(pages)
    cut = days[3]  # exactly the tier's last snapshot
    units = units_as_of(path, cut)
    assert len(units) == 1 and units[0][0] == 1  # the L1 tier alone
    idx = load_tiered_as_of(spark, path, cut)
    sub = pages.filter(F.date_format("warc_ts", "yyyy-MM-dd") <= cut)
    corpus = extract_pages(sub).filter(F.col("error").isNull()).select("doc_id", "text")
    assert _rows(wand_topk(idx, QUERIES, k=8)) == _rows(
        bm25_topk_bruteforce(spark, corpus, QUERIES, k=8)
    )


def test_as_of_latest_equals_live_view(spark, built):
    path, pages = built
    days = _days(pages)
    got = units_as_of(path, days[-1])
    from embed_rerank_spark.plans.tiered import live_units

    assert got == live_units(path)


def test_index_stats_reports_live_units(spark, built):
    from embed_rerank_spark.plans.tiered import index_stats, live_units

    path, _pages = built
    stats = index_stats(spark, path).collect()
    assert {(r["level"], r["unit"]) for r in stats} == set(live_units(path))
    tier = [r for r in stats if r["level"] == 1][0]
    assert tier["snapshots"] == 4
    assert tier["postings"] > 0 and tier["bytes"] > 0 and tier["docs"] > 0
    assert tier["bytes_per_posting"] > 0


def test_gc_units_respects_retention_horizon(spark, tmp_path_factory):
    """gc_units deletes only absorbed units below the horizon: live
    queries unchanged, as-of at/after the horizon works, deeper time
    travel fails with a retention error, manifests survive."""
    from embed_rerank_spark.plans.build_index import committed_snapshots
    from embed_rerank_spark.plans.tiered import gc_units, load_tiered

    path = str(tmp_path_factory.mktemp("gc"))
    pages = generate_pages(spark, 400, seed=23, n_snapshots=5, vocab_size=50).cache()
    build_incremental(spark, pages, path, n_shards=4, block_size=32)
    created = compact(spark, path, fanout=4)
    assert len(created) == 1
    days = _days(pages)

    # horizon older than everything: only the tier-boundary segment is
    # GC-able (every possible cut either uses the L1 tier covering
    # days 1-4 or the pre-boundary segments — day 4's own payload is
    # redundant the moment the tier commits)
    assert gc_units(path, retain_asof=days[0]) == [f"segments/{days[3]}"]
    # as-of inside the tier still answers from the surviving segments
    mid = _rows(wand_topk(load_tiered_as_of(spark, path, days[2]), QUERIES, k=10))
    assert mid

    before = _rows(wand_topk(load_tiered(spark, path), QUERIES, k=10))

    gced = gc_units(path, retain_asof=days[4])
    assert sorted(gced) == [f"segments/{d}" for d in days[:3]]
    # idempotent
    assert gc_units(path, retain_asof=days[4]) == []
    # manifests survive: the commit record is intact
    assert committed_snapshots(path) == set(days)

    # live queries unchanged
    after = _rows(wand_topk(load_tiered(spark, path), QUERIES, k=10))
    assert after == before
    # as-of at the horizon still answers (latest view == live view here)
    asof = _rows(wand_topk(load_tiered_as_of(spark, path, days[4]), QUERIES, k=10))
    assert asof == before
    # deeper time travel fails loudly
    with pytest.raises(ValueError, match="retention"):
        load_tiered_as_of(spark, path, days[1])


def test_merge_segments_rejects_gced_tree(spark, tmp_path_factory):
    """A full merge over a GC'd tree must fail loudly, not with a
    missing-parquet stack."""
    from embed_rerank_spark.plans.build_index import merge_segments
    from embed_rerank_spark.plans.tiered import gc_units

    path = str(tmp_path_factory.mktemp("gcmerge"))
    pages = generate_pages(spark, 200, seed=29, n_snapshots=4, vocab_size=40)
    build_incremental(spark, pages, path, n_shards=4, block_size=32)
    compact(spark, path, fanout=4)
    days = _days(pages)
    assert gc_units(path, retain_asof=days[3])
    with pytest.raises(ValueError, match="garbage-collected"):
        merge_segments(spark, path)


def test_gc_crash_leaves_marker_and_clear_error(spark, tmp_path_factory, monkeypatch):
    """Kill the payload deletion mid-GC: the GCED marker must already
    be on disk (written BEFORE deletion), so deeper as-of reads fail
    with the designed retention-horizon error instead of a raw
    missing-parquet stack; a re-run self-heals the leftover payload
    without re-reporting the unit."""
    import shutil

    from embed_rerank_spark.plans.tiered import gc_units, load_tiered

    path = str(tmp_path_factory.mktemp("gccrash"))
    pages = generate_pages(spark, 400, seed=29, n_snapshots=5, vocab_size=50).cache()
    build_incremental(spark, pages, path, n_shards=4, block_size=32)
    assert len(compact(spark, path, fanout=4)) == 1
    days = _days(pages)

    real_rmtree = shutil.rmtree

    def boom(p, *a, **k):
        raise OSError("simulated crash mid-GC")

    monkeypatch.setattr(shutil, "rmtree", boom)
    with pytest.raises(OSError, match="simulated"):
        gc_units(path, retain_asof=days[4])
    monkeypatch.setattr(shutil, "rmtree", real_rmtree)

    marked = sorted(
        u for u in (Path(path) / "segments").iterdir() if (u / "GCED").exists()
    )
    assert marked, "crash window must leave the marker in place"
    # deeper time travel fails with the retention error, not FileNotFound
    with pytest.raises(ValueError, match="garbage-collected"):
        load_tiered_as_of(spark, path, days[0])
    # re-run heals the leftovers; the crashed unit is not re-reported
    # as newly GC'd (its marker predates this run)
    healed = gc_units(path, retain_asof=days[4])
    assert f"segments/{marked[0].name}" not in healed
    assert not (marked[0] / "postings").exists()
    # live queries unaffected throughout
    assert _rows(wand_topk(load_tiered(spark, path), QUERIES, k=10))
