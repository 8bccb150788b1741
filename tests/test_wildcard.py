"""General Lucene WildcardQuery: dictionary expansion semantics
(whole-term match, `*` any run, `?` exactly one char, literal-prefix
pruning) and retrieval equivalence to disjunctive BM25 over the
expansion."""

from __future__ import annotations

import re
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce  # noqa: E402
from embed_rerank_spark.operators.postings import InvertedIndex, build_postings  # noqa: E402
from embed_rerank_spark.operators.wand import (  # noqa: E402
    expand_wildcard,
    wildcard_topk,
)

DOCS = [
    (1, "fast hash join beats sort merge join"),
    (2, "slow table scan over the table"),
    (3, "hash table lookup the fast path"),
    (4, "merge sort merge the slow path"),
    (5, "scan scan scan row row"),
    (6, "a lone row span"),
]


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    built = build_postings(docs, n_shards=2)
    cs = built["corpus_stats"].collect()[0]
    return InvertedIndex(
        postings=built["postings"],
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )


def _python_expand(index, pattern: str, cap: int) -> list[str]:
    rx = re.compile(
        "^"
        + "".join(".*" if c == "*" else "." if c == "?" else re.escape(c) for c in pattern)
        + "$"
    )
    rows = [(r["term"], r["df"]) for r in index.term_stats.collect() if rx.match(r["term"])]
    rows.sort(key=lambda t: (-t[1], t[0]))
    return [t for t, _ in rows[:cap]]


@pytest.mark.parametrize(
    "pattern",
    [
        "s*n",       # middle star, prefix-prunable: scan, span
        "s?an",      # ? = exactly one char: scan, span (NOT san)
        "*ast",      # leading wildcard, no prefix prune: fast
        "jo*",       # pure prefix form: join
        "?ow",       # leading ?: row (not slow: ? is one char)
        "t*",        # table, the
        "q*zz?",     # no match
        "scan",      # no wildcard chars: exact-term match only
    ],
)
def test_expand_wildcard_matches_python_reference(index, pattern):
    assert expand_wildcard(index, pattern, max_expansion=64) == _python_expand(
        index, pattern, 64
    )


def test_expand_wildcard_whole_term_and_cap(index):
    # `s*` must NOT match terms merely containing s elsewhere (whole-term
    # anchor) and the df-desc cap keeps the heaviest matches
    full = _python_expand(index, "s*", 64)
    assert expand_wildcard(index, "s*", max_expansion=2) == full[:2]
    assert "fast" not in expand_wildcard(index, "s*", 64)  # no leading s


def test_wildcard_topk_equals_bruteforce_on_expansion(spark, index):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = [(1, "s*n"), (2, "*ast"), (3, "q*zz?")]
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 6))
        for r in wildcard_topk(index, queries, k=5).collect()
    }
    want = {}
    for qid, pat in queries:
        terms = _python_expand(index, pat, 64)
        if not terms:
            continue
        for r in bm25_topk_bruteforce(spark, docs, [(qid, " ".join(terms))], k=5).collect():
            want[(r["query_id"], r["rank"])] = (r["doc_id"], round(r["score"], 6))
    assert got == want
    assert not any(q == 3 for q, _ in got)  # no-match pattern yields no rows


def test_expand_term_range_bounds_and_cap(index):
    from embed_rerank_spark.operators.wand import expand_term_range

    vocab = sorted(r["term"] for r in index.term_stats.collect())
    # [s, t): every term starting in the s range
    want = [t for t in vocab if "s" <= t < "t"]
    got = expand_term_range(index, "s", "t")
    assert sorted(got) == want
    # inclusivity flags
    assert "scan" not in expand_term_range(index, "scan", "t", include_lower=False)
    assert "scan" in expand_term_range(index, "row", "scan", include_upper=True)
    assert "scan" not in expand_term_range(index, "row", "scan")
    # open bounds = whole dictionary (capped)
    assert sorted(expand_term_range(index, None, None, max_expansion=1000)) == vocab
    # cap keeps df-desc leaders
    full = expand_term_range(index, None, None, max_expansion=1000)
    dfs = {r["term"]: r["df"] for r in index.term_stats.collect()}
    ordered = sorted(full, key=lambda t: (-dfs[t], t))
    assert expand_term_range(index, None, None, max_expansion=3) == ordered[:3]


def test_term_range_topk_equals_bruteforce_on_expansion(spark, index):
    from embed_rerank_spark.operators.wand import expand_term_range, term_range_topk

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    ranges = [(1, "s", "t"), (2, "zzzz", "zzzzz")]
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 6))
        for r in term_range_topk(index, ranges, k=5).collect()
    }
    want = {}
    for qid, lo, hi in ranges:
        terms = expand_term_range(index, lo, hi)
        if not terms:
            continue
        for r in bm25_topk_bruteforce(spark, docs, [(qid, " ".join(terms))], k=5).collect():
            want[(r["query_id"], r["rank"])] = (r["doc_id"], round(r["score"], 6))
    assert got == want
    assert not any(q == 2 for q, _ in got)
