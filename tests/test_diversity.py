"""MMR diversification (operators/diversity.py): greedy semantics vs
a pure-python replay, cluster interleaving, the lam=1 degenerate
case, and pool exhaustion."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.operators.diversity import mmr_topk


def _clustered(spark):
    """Two tight clusters: ids 0-3 hug the query direction, ids 10-13
    hug an orthogonal-ish one; a lone vector 20 in between."""
    rng = np.random.default_rng(3)
    base_a = np.array([1.0, 0.0, 0.0, 0.0])
    base_b = np.array([0.6, 0.8, 0.0, 0.0])
    rows = []
    for i in range(4):
        rows.append((i, [float(x) for x in base_a + 0.01 * rng.normal(size=4)]))
    for i in range(4):
        rows.append((10 + i, [float(x) for x in base_b + 0.01 * rng.normal(size=4)]))
    rows.append((20, [0.9, 0.43, 0.0, 0.0]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(0, [1.0, 0.05, 0.0, 0.0])], "query_id long, qvec array<double>"
    )
    return vecs, q


def test_mmr_interleaves_clusters(spark):
    vecs, q = _clustered(spark)
    out = sorted(mmr_topk(vecs, q, k=4, pool=9, lam=0.5).collect(),
                 key=lambda r: r["rank"])
    picked = [r["vec_id"] for r in out]
    # pure relevance would take all of cluster A first; MMR must pull
    # in a non-A vector by the second pick
    assert picked[0] in (0, 1, 2, 3)
    assert picked[1] not in (0, 1, 2, 3)
    # ranks are 1..k and mmr of the first pick equals its relevance
    assert [r["rank"] for r in out] == [1, 2, 3, 4]
    assert abs(out[0]["mmr"] - out[0]["rel"]) < 1e-12


def test_mmr_lam_one_is_pure_relevance(spark):
    vecs, q = _clustered(spark)
    mmr = sorted(mmr_topk(vecs, q, k=5, pool=9, lam=1.0).collect(),
                 key=lambda r: r["rank"])
    by_rel = sorted(mmr, key=lambda r: (-round(r["rel"], 6), r["vec_id"]))
    assert [r["vec_id"] for r in mmr] == [r["vec_id"] for r in by_rel]


def test_mmr_matches_python_replay(spark):
    vecs, q = _clustered(spark)
    out = sorted(mmr_topk(vecs, q, k=5, pool=9, lam=0.5).collect(),
                 key=lambda r: r["rank"])
    rows = {r[0]: np.array(r[1]) for r in vecs.collect()}
    qv = np.array([1.0, 0.05, 0.0, 0.0])

    def cos(a, b):
        return round(
            float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6
        )

    rel = {i: cos(qv, v) for i, v in rows.items()}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:9]
    picked, expect = [], []
    remaining = sorted(cand)
    for _ in range(5):
        best, bobj = None, None
        for c in remaining:
            if not picked:
                obj = rel[c]
            else:
                obj = round(
                    0.5 * rel[c]
                    - 0.5 * max(cos(rows[c], rows[p]) for p in picked),
                    6,
                )
            if bobj is None or obj > bobj:
                best, bobj = c, obj
        picked.append(best)
        remaining.remove(best)
        expect.append((best, bobj))
    assert [(r["vec_id"], round(r["mmr"], 6)) for r in out] == expect


def test_mmr_pool_exhaustion_and_validation(spark):
    vecs, q = _clustered(spark)
    out = mmr_topk(vecs, q, k=50, pool=3, lam=0.5).collect()
    assert len(out) == 3  # only pool candidates exist
    with pytest.raises(ValueError):
        mmr_topk(vecs, q, lam=1.5)
