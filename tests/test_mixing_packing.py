"""Round-3 pipeline operators: temperature-based domain mixing and
training-sequence packing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.operators.packing import pack_sequences
from embed_rerank_spark.operators.sampling import temperature_mix


def _skewed(spark):
    # domain sizes 16 / 4 / 1
    rows = (
        [(i, "big") for i in range(16)]
        + [(100 + i, "mid") for i in range(4)]
        + [(200, "tiny")]
    )
    return spark.createDataFrame(rows, "doc_id long, source string")


def _counts(df):
    return {
        r["source"]: r["n"]
        for r in df.groupBy("source").agg(F.count("*").alias("n")).collect()
    }


def _expected_targets(sizes, alpha, budget):
    w = {d: round(n**alpha * 1e6) for d, n in sizes.items()}
    tot = sum(w.values())
    return {d: min(sizes[d], (budget * w[d]) // tot) for d in sizes}


def test_temperature_mix_target_math(spark):
    docs = _skewed(spark)
    sizes = {"big": 16, "mid": 4, "tiny": 1}
    for alpha, budget in [(0.5, 10), (1.0, 10), (0.0, 9)]:
        got = _counts(temperature_mix(docs, alpha, budget))
        want = _expected_targets(sizes, alpha, budget)
        want = {d: n for d, n in want.items() if n > 0}
        assert got == want, (alpha, budget, got, want)


def test_temperature_mix_alpha_one_is_proportional(spark):
    # alpha=1: targets are proportional to domain size (floor'd).
    docs = _skewed(spark)
    got = _counts(temperature_mix(docs, 1.0, 21))
    assert got == {"big": 16, "mid": 4, "tiny": 1}


def test_temperature_mix_alpha_zero_is_uniform(spark):
    # alpha=0: every domain has equal weight; budget splits evenly
    # (capped by domain size).
    docs = _skewed(spark)
    got = _counts(temperature_mix(docs, 0.0, 9))
    assert got == {"big": 3, "mid": 3, "tiny": 1}


def test_temperature_mix_membership_is_hash_stable(spark):
    # With a fixed per-domain target, the KEPT doc set depends only on
    # the domain's own docs (md5 order) — growing another domain must
    # not change it.
    docs = _skewed(spark)
    grown = docs.unionByName(
        spark.createDataFrame([(300 + i, "big") for i in range(8)], docs.schema)
    )
    kept_before = {
        r["doc_id"]
        for r in temperature_mix(docs, 1.0, 21).filter(F.col("source") == "mid").collect()
    }
    kept_after = {
        r["doc_id"]
        for r in temperature_mix(grown, 1.0, 29).filter(F.col("source") == "mid").collect()
    }
    # both runs give mid the same target (4 = all of it)
    assert kept_before == kept_after == {100, 101, 102, 103}


def _pack_rows(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_pack_sequences_contiguous_fill(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * n)) for i, n in [(1, 5), (2, 5), (3, 5), (4, 2)]],
        "doc_id long, text string",
    )
    out = pack_sequences(docs, seq_len=8)
    rows = _pack_rows(out)
    assert len(rows) == 4
    # reconstruct global offsets: they must tile [0, total) exactly
    spans = sorted(
        (r["seq_id"] * 8 + r["offset"], r["tokens"]) for r in rows.values()
    )
    cursor = 0
    for g, tokens in spans:
        assert g == cursor
        cursor += tokens
    assert cursor == 17
    # a doc of 5 tokens starting at offset 5 straddles into the next
    # sequence: n_seqs = 2
    for r in rows.values():
        want = (r["seq_id"] * 8 + r["offset"] + r["tokens"] - 1) // 8 - r["seq_id"] + 1
        assert r["n_seqs"] == want


def test_pack_sequences_partition_invariant(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (1 + i % 7))) for i in range(60)],
        "doc_id long, text string",
    )
    one = {(r["doc_id"], r["seq_id"], r["offset"]) for r in pack_sequences(docs, 16).collect()}
    many = {
        (r["doc_id"], r["seq_id"], r["offset"])
        for r in pack_sequences(docs.repartition(13), 16).collect()
    }
    assert one == many


def test_pack_sequences_drops_empty_and_rejects_bad_len(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    out = pack_sequences(docs, 4)
    assert {r["doc_id"] for r in out.collect()} == {1}
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(docs, 0)


def test_chunk_documents_windows_and_edges(spark):
    """Chunk spans, overlap, tail clipping, no contained trailing
    chunk, empty docs dropped, bad knobs rejected; plan is
    shuffle-free."""
    import pytest

    from embed_rerank_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),
            (2, "only"),
            (3, ""),
            (4, " ".join(f"u{i}" for i in range(4))),  # exactly one window
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=1)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: stride 3, ceil(9/3) = 3 chunks
    assert {k for k in rows if k[0] == 1} == {(1, 0), (1, 1), (1, 2)}
    assert rows[(1, 0)]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[(1, 1)]["chunk_text"] == "t3 t4 t5 t6"  # 1-token overlap
    assert rows[(1, 2)]["chunk_text"] == "t6 t7 t8 t9"
    assert rows[(1, 2)]["n_tokens"] == 4
    assert rows[(2, 0)]["chunk_text"] == "only" and rows[(2, 0)]["n_tokens"] == 1
    assert not any(k[0] == 3 for k in rows)
    assert {k for k in rows if k[0] == 4} == {(4, 0)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)
