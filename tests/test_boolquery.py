"""Nested bool DSL: Lucene BooleanQuery semantics pinned on a
hand-checkable corpus — msm defaulting, filter context scoring zero,
nested must_not, should-group score summation."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from embed_rerank_spark.operators.boolquery import (  # noqa: E402
    Bool,
    nested_bool_topk,
)

DOCS = [
    (1, "fast join"),
    (2, "slow join"),
    (3, "fast slow join"),
    (4, "join join"),
    (5, "fast scan"),
    (6, "fast join dup"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _collect(spark, docs, tree, k=10):
    rows = nested_bool_topk(spark, docs, [(1, tree)], k=k).collect()
    return {r["doc_id"]: r["score"] for r in rows}


def test_must_and_should_group_and_not(spark, docs):
    """must=[(fast OR slow), join], must_not=[dup]: docs 1,2,3 match
    (4 lacks fast/slow, 5 lacks join, 6 has dup); score sums the
    matching should scores inside the nested group."""
    tree = Bool(must=[Bool(should=["fast", "slow"]), "join"], must_not=["dup"])
    got = _collect(spark, docs, tree)
    assert set(got) == {1, 2, 3}


def test_msm_default_one_when_only_shoulds(spark, docs):
    tree = Bool(should=["scan", "dup"])
    got = _collect(spark, docs, tree)
    assert set(got) == {5, 6}


def test_msm_two_requires_two_clauses(spark, docs):
    tree = Bool(should=["fast", "slow", "dup"], minimum_should_match=2)
    got = _collect(spark, docs, tree)
    # doc3 fast+slow, doc6 fast+dup; doc1/5 only fast, doc2 only slow
    assert set(got) == {3, 6}


def test_filter_matches_without_scoring(spark, docs):
    """filter context constrains the match set but contributes no
    score: score(must=[join], filter=[fast]) == the join-only term
    score of the same doc."""
    with_filter = _collect(spark, docs, Bool(must=["join"], filter=["fast"]))
    plain = _collect(spark, docs, Bool(must=["join"]))
    assert set(with_filter) == {1, 3, 6}
    for d, s in with_filter.items():
        assert s == pytest.approx(plain[d], rel=1e-9)


def test_nested_must_not_is_an_and_group(spark, docs):
    """must_not=[Bool(must=[fast, slow])] excludes only docs that
    contain BOTH (doc 3), not docs with either alone."""
    tree = Bool(must=["join"], must_not=[Bool(must=["fast", "slow"])])
    got = _collect(spark, docs, tree)
    assert set(got) == {1, 2, 4, 6}


def test_scores_match_hand_bm25(spark, docs):
    """Leaf scores are corpus-wide Okapi BM25 term scores; node score
    is the sum over matching positive clauses."""
    tree = Bool(must=["join"], should=["fast"])
    got = _collect(spark, docs, tree)

    toks = {d: t.split() for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(ts) for ts in toks.values()) / n

    def term_score(term, d):
        tf = toks[d].count(term)
        if tf == 0:
            return 0.0
        df = sum(1 for ts in toks.values() if term in ts)
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        dl = len(toks[d])
        return idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    for d in got:
        want = term_score("join", d) + term_score("fast", d)
        assert got[d] == pytest.approx(want, rel=1e-9)


def test_must_not_only_rejected(spark, docs):
    with pytest.raises(ValueError):
        nested_bool_topk(spark, docs, [(1, Bool(must_not=["dup"]))])


def test_decay_family_semantics(spark):
    """m(origin)=1, m(origin±scale)=decay for all three kinds; linear
    hits a hard zero past scale/(1-decay); gauss flatter than exp
    near the origin."""
    import pytest as _pt

    from embed_rerank_spark.operators.bm25 import rescore_by_decay

    cands = spark.createDataFrame(
        [(1, d, 1.0) for d in range(1, 6)], "query_id long, doc_id long, score double"
    )
    vals = spark.createDataFrame(
        [(1, 100.0), (2, 190.0), (3, 10.0), (4, 460.0), (5, 130.0)],
        "doc_id long, value double",
    )
    for kind, at_scale in (("gauss", 0.5), ("exp", 0.5), ("linear", 0.5)):
        got = {
            r["doc_id"]: r["score"]
            for r in rescore_by_decay(
                cands, vals, kind=kind, origin=100.0, scale=90.0, decay=0.5, k=10
            ).collect()
        }
        assert got[1] == _pt.approx(1.0)  # at origin
        assert got[2] == _pt.approx(at_scale)  # |190-100| = scale
        assert got[3] == _pt.approx(at_scale)  # symmetric side
    lin = {
        r["doc_id"]: r["score"]
        for r in rescore_by_decay(
            cands, vals, kind="linear", origin=100.0, scale=90.0, decay=0.5, k=10
        ).collect()
    }
    assert lin[4] == 0.0  # |460-100|=360 = 2*scale/(1-decay) -> clamped
    g = {
        r["doc_id"]: r["score"]
        for r in rescore_by_decay(
            cands, vals, kind="gauss", origin=100.0, scale=90.0, decay=0.5, k=10
        ).collect()
    }
    e = {
        r["doc_id"]: r["score"]
        for r in rescore_by_decay(
            cands, vals, kind="exp", origin=100.0, scale=90.0, decay=0.5, k=10
        ).collect()
    }
    assert g[5] > e[5]  # |130-100| < scale: bell is flatter near origin
    with _pt.raises(ValueError):
        rescore_by_decay(cands, vals, kind="nope")


def test_bool_from_json_parses_wire_shape_and_rejects_unknown():
    import pytest as _pytest

    from embed_rerank_spark.operators.boolquery import Bool

    tree = Bool.from_json({
        "bool": {
            "must": ["scan", {"term": "table"}],
            "should": [{"bool": {"must": ["sort", "merge"]}}, "hash"],
            "must_not": ["dup"],
            "minimum_should_match": 1,
        }
    })
    assert tree.must == ["scan", "table"]
    assert tree.must_not == ["dup"] and tree.minimum_should_match == 1
    assert isinstance(tree.should[0], Bool) and tree.should[0].must == ["sort", "merge"]
    assert tree.terms() == {"scan", "table", "sort", "merge", "hash", "dup"}
    # the "bool" wrapper is optional
    assert Bool.from_json({"must": ["a"]}).must == ["a"]
    with _pytest.raises(ValueError):
        Bool.from_json({"bool": {"shuold": ["typo"]}})
    with _pytest.raises(ValueError):
        Bool.from_json("bare-term")
