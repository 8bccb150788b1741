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
