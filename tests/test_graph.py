"""Link-graph operators: PageRank vs a NumPy power-iteration reference,
connected components on known topologies, degree stats."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.operators.graph import (
    connected_components,
    degree_stats,
    pagerank,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(s), int(d)) for s, d in pairs], "src long, dst long"
    )


def _numpy_pagerank(pairs, damping, iters):
    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for s, _ in pairs:
        outdeg[idx[s]] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - damping) / n)
        for s, d in pairs:
            nxt[idx[d]] += damping * pr[idx[s]] / outdeg[idx[s]]
        pr = nxt
    return {v: pr[idx[v]] for v in nodes}


@pytest.fixture(scope="module")
def web_graph():
    # two hubs (0, 1), a chain, and a node with no in-links
    return [
        (2, 0), (3, 0), (4, 0), (5, 0),
        (2, 1), (3, 1), (6, 1),
        (0, 1), (1, 0),
        (6, 7), (7, 8),
        (9, 0),  # 9 has no in-links
    ]


def test_pagerank_matches_numpy_reference(spark, web_graph):
    got = {
        r["id"]: r["pr"]
        for r in pagerank(_edges_df(spark, web_graph), damping=0.85, iters=7).collect()
    }
    want = _numpy_pagerank(web_graph, 0.85, 7)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_pagerank_hubs_outrank_leaves(spark, web_graph):
    got = {
        r["id"]: r["pr"]
        for r in pagerank(_edges_df(spark, web_graph), iters=5).collect()
    }
    assert got[0] > got[9] and got[1] > got[9]
    # rank mass is bounded and positive
    assert all(v > 0 for v in got.values())


def test_pagerank_checkpoint_boundary_identical(spark, web_graph):
    """Lineage cuts must not change values: run with checkpoint_every
    straddling the iteration count both ways."""
    e = _edges_df(spark, web_graph)
    a = {r["id"]: r["pr"] for r in pagerank(e, iters=4, checkpoint_every=2).collect()}
    b = {r["id"]: r["pr"] for r in pagerank(e, iters=4, checkpoint_every=100).collect()}
    assert a == b


def test_connected_components_known_topology(spark):
    # component A: triangle {0,1,2}; B: chain 10-11-12-13; C: singleton pair {20,21}
    pairs = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 13), (20, 21)]
    got = {
        r["id"]: r["comp"]
        for r in connected_components(_edges_df(spark, pairs)).collect()
    }
    assert {got[0], got[1], got[2]} == {0}
    assert {got[10], got[11], got[12], got[13]} == {10}
    assert {got[20], got[21]} == {20}


def test_connected_components_long_chain_converges(spark):
    # diameter > checkpoint_every exercises the lineage-cut path
    pairs = [(i, i + 1) for i in range(30)]
    got = {
        r["id"]: r["comp"]
        for r in connected_components(_edges_df(spark, pairs)).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 31


def test_degree_stats(spark, web_graph):
    got = {
        r["id"]: (r["out_deg"], r["in_deg"])
        for r in degree_stats(_edges_df(spark, web_graph)).collect()
    }
    assert got[0] == (1, 6)  # 0 -> 1; in from 2,3,4,5,1,9
    assert got[9] == (1, 0)
    assert got[8] == (0, 1)


def test_pagerank_plan_has_no_cartesian(spark, web_graph):
    plan = pagerank(
        _edges_df(spark, web_graph), iters=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_blend_static_prior_reference_and_plan(spark):
    import math

    from embed_rerank_spark.operators.bm25 import blend_static_prior

    scored = spark.createDataFrame(
        [(1, 10, 2.0), (1, 11, 1.9), (1, 12, 1.8), (2, 10, 1.0), (2, 13, 0.9)],
        "query_id long, doc_id long, score double",
    )
    prior = spark.createDataFrame(
        [(10, 0.001), (11, 0.01), (13, 0.002)], "id long, pr double"
    )  # doc 12 has no prior -> zero boost
    out = blend_static_prior(scored, prior, k=10, weight=5.0)
    got = {(r.query_id, r.doc_id): (r.prior, r.blended, r.rank) for r in out.collect()}
    n = 3
    for (q, d, s) in [(1, 10, 2.0), (1, 11, 1.9), (1, 12, 1.8), (2, 10, 1.0), (2, 13, 0.9)]:
        pr = {10: 0.001, 11: 0.01, 13: 0.002}.get(d, 0.0)
        assert got[(q, d)][0] == pr
        assert got[(q, d)][1] == pytest.approx(s + 5.0 * math.log(1 + n * pr), abs=1e-12)
    # doc 11's big prior overtakes doc 10's higher BM25 for query 1
    assert got[(1, 11)][2] == 1 and got[(1, 10)][2] == 2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan  # both joins must broadcast


def test_star_cc_matches_minlabel_on_random_graphs(spark):
    import random

    from embed_rerank_spark.operators.graph import connected_components_star

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        n = 60
        pairs = {(rng.randrange(n), rng.randrange(n)) for _ in range(45)}
        pairs = [(a, b) for a, b in pairs if a != b]
        e = _edges_df(spark, pairs)
        want = {r["id"]: r["comp"] for r in connected_components(e).collect()}
        got = {r["id"]: r["comp"] for r in connected_components_star(e).collect()}
        assert got == want, f"seed {seed}"


def test_star_cc_long_chain(spark):
    # diameter 80: min-label would need ~80 rounds; star finishes in O(log n)
    from embed_rerank_spark.operators.graph import connected_components_star

    pairs = [(i, i + 1) for i in range(80)] + [(100, 101), (101, 102)]
    got = {r["id"]: r["comp"] for r in connected_components_star(_edges_df(spark, pairs)).collect()}
    assert all(got[i] == 0 for i in range(81))
    assert got[100] == got[101] == got[102] == 100


def test_anchor_token_stream_weighted_counts(spark):
    """Inlink anchors (first tokens of each source) land in the target's
    stream anchor_weight times; no-inlink docs keep body unchanged."""
    from collections import Counter

    from embed_rerank_spark.operators.graph import anchor_token_stream

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta body0"),
            (1, "one two three four body1"),
            (2, "t2 only body here"),
        ],
        "doc_id long, text string",
    )
    edges = spark.createDataFrame([(0, 2), (1, 2)], "src long, dst long")
    out = {
        r["doc_id"]: Counter(r["text"].split())
        for r in anchor_token_stream(
            docs, edges, anchor_len=2, anchor_weight=3
        ).collect()
    }
    # target 2: body once + (alpha beta one two) x3
    assert out[2]["alpha"] == 3 and out[2]["beta"] == 3
    assert out[2]["one"] == 3 and out[2]["two"] == 3
    assert out[2]["t2"] == 1 and out[2]["body"] == 1
    # no inlinks -> body only
    assert out[0] == Counter("alpha beta gamma delta body0".split())
    assert out[1] == Counter("one two three four body1".split())


def test_anchor_token_stream_inlink_cap_deterministic(spark):
    """max_inlinks keeps the smallest src ids — the oracle-mirrored,
    skew-bounding cap."""
    from collections import Counter

    from embed_rerank_spark.operators.graph import anchor_token_stream

    docs = spark.createDataFrame(
        [(i, f"s{i} x y z") for i in range(5)] + [(9, "target body")],
        "doc_id long, text string",
    )
    edges = spark.createDataFrame([(i, 9) for i in range(5)], "src long, dst long")
    out = {
        r["doc_id"]: Counter(r["text"].split())
        for r in anchor_token_stream(
            docs, edges, anchor_len=1, anchor_weight=1, max_inlinks=2
        ).collect()
    }
    assert out[9]["s0"] == 1 and out[9]["s1"] == 1  # two smallest srcs win
    assert out[9]["s2"] == 0 and out[9]["s4"] == 0


def _numpy_hits(pairs, iters):
    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    hub = np.full(n, 1.0 / n)
    auth = np.full(n, 1.0 / n)
    for _ in range(iters):
        h = np.zeros(n)
        for s, d in pairs:
            h[idx[s]] += auth[idx[d]]
        hub = h / h.sum()
        a = np.zeros(n)
        for s, d in pairs:
            a[idx[d]] += hub[idx[s]]
        auth = a / a.sum()
    return {v: (hub[idx[v]], auth[idx[v]]) for v in nodes}


def test_hits_matches_numpy_reference(spark, web_graph):
    from embed_rerank_spark.operators.graph import hits

    got = {
        r["id"]: (r["hub"], r["auth"])
        for r in hits(_edges_df(spark, web_graph), iters=4).collect()
    }
    want = _numpy_hits(web_graph, 4)
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == pytest.approx(want[v][0], abs=1e-12), v
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-12), v
    # the two hubs are the top authorities; node 9 (no in-links) has 0
    auths = {v: a for v, (_, a) in got.items()}
    assert sorted(auths, key=auths.get, reverse=True)[:2] == sorted(
        [0, 1], key=lambda v: -auths[v]
    )
    assert auths[9] == 0.0


def test_hits_checkpoint_boundary_equivalent(spark, web_graph):
    """Lineage cuts must not change values beyond float-summation
    order: unlike pagerank (per-node updates only), HITS has a GLOBAL
    L1-normalizer sum whose accumulation order shifts with the
    checkpoint's partitioning — ulp-level differences are expected,
    anything larger is a bug."""
    from embed_rerank_spark.operators.graph import hits

    e = _edges_df(spark, web_graph)
    a = {r["id"]: (r["hub"], r["auth"])
         for r in hits(e, iters=3, checkpoint_every=2).collect()}
    b = {r["id"]: (r["hub"], r["auth"])
         for r in hits(e, iters=3, checkpoint_every=100).collect()}
    assert set(a) == set(b)
    for v in a:
        assert a[v][0] == pytest.approx(b[v][0], abs=1e-12)
        assert a[v][1] == pytest.approx(b[v][1], abs=1e-12)
