"""Reciprocal-rank fusion of ranked lists."""

from __future__ import annotations

import sys
from collections import defaultdict
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from embed_rerank_spark.operators.fusion import rrf_fuse  # noqa: E402

L1 = [(1, 1, 10), (1, 2, 11), (1, 3, 12), (2, 1, 20), (2, 2, 21)]
L2 = [(1, 1, 12), (1, 2, 13), (2, 1, 21), (2, 2, 20)]
L3 = [(1, 1, 11), (2, 1, 22)]


def _reference(lists, k0=60, k=10):
    acc: dict[tuple[int, int], float] = defaultdict(float)
    for lst in lists:
        for qid, rank, doc in lst:
            acc[(qid, doc)] += 1.0 / (k0 + rank)
    out = defaultdict(list)
    for (qid, doc), s in acc.items():
        out[qid].append((doc, s))
    rows = []
    for qid, pairs in out.items():
        pairs.sort(key=lambda ds: (-round(ds[1], 6), ds[0]))
        rows.extend(
            (qid, r + 1, d, round(s, 6)) for r, (d, s) in enumerate(pairs[:k])
        )
    return sorted(rows)


def _df(spark, rows):
    return spark.createDataFrame(rows, "query_id long, rank int, doc_id long")


def test_rrf_matches_python_reference(spark):
    got = rrf_fuse([_df(spark, L1), _df(spark, L2), _df(spark, L3)], k=10)
    g = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in got.collect()
    )
    assert g == _reference([L1, L2, L3])


def test_doc_missing_from_a_list_contributes_nothing(spark):
    got = rrf_fuse([_df(spark, L1), _df(spark, L3)], k=10)
    scores = {
        (r["query_id"], r["doc_id"]): round(r["score"], 6) for r in got.collect()
    }
    # doc 10: only in L1 at rank 1; doc 11: L1 rank 2 + L3 rank 1
    assert scores[(1, 10)] == round(1 / 61, 6)
    assert scores[(1, 11)] == round(1 / 62 + 1 / 61, 6)


def test_empty_input_rejected(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_linear_fuse_semantics(spark):
    """Min-max per list per query; degenerate pool -> 1.0; absent doc
    contributes 0; weights blend."""
    import pytest
    from pyspark.sql import functions as F

    from embed_rerank_spark.operators.fusion import linear_fuse

    a = spark.createDataFrame(
        [(1, 10, 4.0), (1, 11, 2.0), (1, 12, 0.0)],
        "query_id long, doc_id long, score double",
    )
    b = spark.createDataFrame(
        [(1, 11, 7.0), (1, 13, 7.0)],  # degenerate: max == min
        "query_id long, doc_id long, score double",
    )
    out = {
        r.doc_id: round(r.score, 6)
        for r in linear_fuse([(a, 0.6), (b, 0.4)], k=10).collect()
    }
    # a normalized: 10->1.0, 11->0.5, 12->0.0; b degenerate: 11,13 -> 1.0
    assert out == {
        10: 0.6,            # 0.6*1.0 + absent
        11: round(0.6 * 0.5 + 0.4, 6),
        13: 0.4,            # absent + 0.4*1.0
        12: 0.0,
    }
    with pytest.raises(ValueError):
        linear_fuse([], k=5)
