"""Spherical k-means + SemDeDup (operators/clustering.py)."""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from embed_rerank_spark.operators.clustering import (  # noqa: E402
    kmeans_assign,
    kmeans_fit,
    kmeans_init,
    semdedup,
)


def _np_kmeans(vecs: dict[int, list[float]], k: int, iters: int):
    """Pure-Python/NumPy replay of the engine contract: hash-ordered
    init, round(cos, 6) desc / cluster asc assignment, mean ->
    normalize -> round(6) update, empty clusters keep centroids."""
    ids = sorted(vecs)
    vn = {}
    for i in ids:
        a = np.asarray(vecs[i], dtype=np.float64)
        n = float(np.sqrt((a * a).sum()))
        if n > 0:
            vn[i] = a / n
    order = sorted(vn, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cent = np.round(np.array([vn[i] for i in order[:k]]), 6)

    def assign():
        out = {}
        for i, v in vn.items():
            cos = np.round(cent @ v, 6)
            c = int(np.lexsort((np.arange(k), -cos))[0])
            out[i] = (c, float(cos[c]))
        return out

    for _ in range(iters):
        a = assign()
        new = cent.copy()
        for c in range(k):
            members = [vn[i] for i in vn if a[i][0] == c]
            if not members:
                continue
            m = np.mean(members, axis=0)
            nrm = float(np.sqrt((m * m).sum()))
            if nrm > 0:
                new[c] = np.round(m / nrm, 6)
        cent = new
    return cent, assign()


RNG = np.random.default_rng(7)
# two tight blobs around orthogonal axes + noise dims
BLOB_A = [(i, (RNG.normal(0, 0.05, 6) + [5, 0, 0, 0, 0, 0]).tolist()) for i in range(10)]
BLOB_B = [
    (i, (RNG.normal(0, 0.05, 6) + [0, 5, 0, 0, 0, 0]).tolist()) for i in range(10, 20)
]
VECS = BLOB_A + BLOB_B


def _vecs_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_kmeans_matches_numpy_reference(spark):
    # float32 storage: the reference must see the same float32-rounded
    # inputs the engine reads back from the array<float> column
    df = _vecs_df(spark, VECS)
    stored = {i: np.asarray(v, dtype=np.float32).astype(np.float64).tolist() for i, v in VECS}
    ref_cent, ref_assign = _np_kmeans(stored, k=3, iters=2)

    cent = kmeans_fit(spark, df, k=3, iters=2)
    assert np.array_equal(cent, ref_cent)

    got = {
        r["vec_id"]: (r["cluster"], round(r["cosine"], 6))
        for r in kmeans_assign(spark, df, k=3, iters=2).collect()
    }
    assert got == {i: (c, round(s, 6)) for i, (c, s) in ref_assign.items()}


def test_two_blobs_split_cleanly(spark):
    df = _vecs_df(spark, VECS)
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(spark, df, k=2, iters=2).collect()
    }
    ca = {got[i] for i, _ in BLOB_A}
    cb = {got[i] for i, _ in BLOB_B}
    assert len(ca) == 1 and len(cb) == 1 and ca != cb


def test_empty_cluster_keeps_init_centroid_and_zero_vec_dropped(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.01]),
        (3, [0.0, 1.0]),
        (4, [0.0, 0.0]),  # zero vector: no direction, dropped
    ]
    df = _vecs_df(spark, rows)
    init = kmeans_init(df, k=3)
    cent = kmeans_fit(spark, df, k=3, iters=2)
    assigned = kmeans_assign(spark, df, k=3, iters=2, centroids=cent)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert 4 not in got and set(got) == {1, 2, 3}
    # with 3 centroids over 2 effective directions, some centroid ends
    # every iteration empty -> it must still equal SOME init row
    # (never NaN, never a stale mean)
    assert not np.isnan(cent).any()
    kept = [
        c for c in range(3) if any(np.array_equal(cent[c], init[j]) for j in range(3))
    ]
    assert kept  # at least the starved centroid survives verbatim


def test_semdedup_drops_within_cluster_dups_only(spark):
    base = np.asarray([5.0, 0, 0, 0, 0, 0])
    rows = [
        (1, base.tolist()),
        (2, (base * 1.0001).tolist()),  # same direction: cos ~ 1
        (3, [0.0, 5, 0, 0, 0, 0]),
        (4, [0.0, 5.001, 0.001, 0, 0, 0]),  # near-dup of 3, other blob
        (5, [3.6, 3.6, 0, 0, 0, 0]),  # diagonal: no near neighbor
    ]
    df = _vecs_df(spark, rows)
    out = semdedup(spark, df, k=2, iters=2, tau=0.99)
    pairs = {(r["a"], r["b"]) for r in out["pairs"].collect()}
    assert (1, 2) in pairs and (3, 4) in pairs
    surv = {r["vec_id"] for r in out["survivors"].collect()}
    assert 1 in surv and 3 in surv  # min-id canonicals kept
    assert 2 not in surv and 4 not in surv
    assert 5 in surv  # diagonal not near anything


def test_semdedup_cluster_cap_skips_pairing(spark):
    rows = [(i, [1.0, float(i) * 1e-4]) for i in range(6)]
    df = _vecs_df(spark, rows)
    capped = semdedup(spark, df, k=1, iters=1, tau=0.5, max_cluster=3)
    assert capped["pairs"].count() == 0
    assert capped["survivors"].count() == 6
    full = semdedup(spark, df, k=1, iters=1, tau=0.5, max_cluster=100)
    assert full["survivors"].count() == 1


def test_semdedup_pair_join_is_cluster_equijoin(spark):
    df = _vecs_df(spark, VECS)
    out = semdedup(spark, df, k=2, iters=1, tau=0.9)
    plan = out["pairs"]._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
