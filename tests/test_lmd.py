"""Dirichlet-smoothed query-likelihood ranking vs a Python reference."""

from __future__ import annotations

import math
import sys
from collections import Counter, defaultdict
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from embed_rerank_spark.operators.lmd import cf_for_terms, lmd_topk, total_tokens  # noqa: E402
from embed_rerank_spark.operators.postings import InvertedIndex, build_postings  # noqa: E402

DOCS = [
    (1, "fast hash join beats sort merge join"),
    (2, "slow table scan over the table"),
    (3, "hash table lookup the fast path"),
    (4, "merge sort merge the slow path"),
    (5, "a lone row"),
]
MU = 2000.0


def _reference(queries, k=5):
    tfs = {d: Counter(t.lower().split()) for d, t in DOCS}
    cf: Counter = Counter()
    for c in tfs.values():
        cf.update(c)
    c_tot = sum(cf.values())
    rows = []
    for qid, q in queries:
        terms = list(dict.fromkeys(q.lower().split()))
        scores = defaultdict(float)
        for d, c in tfs.items():
            dl = sum(c.values())
            for t in terms:
                if cf[t] and c[t]:
                    mup = MU * cf[t] / c_tot
                    scores[d] += math.log(1.0 + c[t] / mup) + math.log(
                        MU / (dl + MU)
                    )
        ranked = sorted(scores.items(), key=lambda ds: (-round(ds[1], 6), ds[0]))
        rows.extend(
            (qid, r + 1, d, round(s, 6)) for r, (d, s) in enumerate(ranked[:k])
        )
    return sorted(rows)


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


def test_lmd_matches_python_reference(spark, index):
    queries = [(1, "fast join"), (2, "the table"), (3, "zyzzyva"), (4, "merge")]
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in lmd_topk(index, queries, k=5).collect()
    )
    assert got == _reference(queries)


def test_collection_stats_from_index(spark, index):
    cf = cf_for_terms(index, {"join", "the", "zyzzyva"})
    assert cf == {"join": 2, "the": 3, "zyzzyva": 0}
    # memoized: second call hits the cache (poke it to prove reuse)
    index._cf_cache["join"] = 99
    assert cf_for_terms(index, {"join"})["join"] == 99
    index._cf_cache["join"] = 2
    assert total_tokens(index) == sum(len(t.split()) for _d, t in DOCS)


def test_lmd_masks_tombstones(spark, index):
    full = {r["doc_id"] for r in lmd_topk(index, [(1, "the table")], k=5).collect()}
    assert 2 in full
    index.tombstones = frozenset({2})
    try:
        masked = {
            r["doc_id"] for r in lmd_topk(index, [(1, "the table")], k=5).collect()
        }
    finally:
        index.tombstones = None
    assert masked == full - {2}
