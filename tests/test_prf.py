"""Pseudo-relevance-feedback expansion: the mined terms and final
ranking must match a pure-Python BM25+Rocchio reference exactly."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from embed_rerank_spark.operators.postings import InvertedIndex, build_postings, write_index
from embed_rerank_spark.operators.prf import prf_expansion_terms, prf_topk

SF_DIR = "/root/testdata/sf0.001"
QUERIES = [(1, "fast hash join"), (2, "slow table scan"), (3, "the a")]
K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def index(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("prfidx"))
    write_index(build_postings(docs, n_shards=4, block_size=16), path)
    return InvertedIndex.load(spark, path)


def _python_reference(docs_rows, queries, fb_docs, fb_terms, k):
    toks = {r["doc_id"]: r["text"].strip().lower().split() for r in docs_rows}
    toks = {d: [t for t in ts if t] for d, ts in toks.items()}
    tf = {d: Counter(ts) for d, ts in toks.items()}
    dl = {d: len(ts) for d, ts in toks.items() if ts}
    n = len(dl)
    avgdl = sum(dl.values()) / n
    df = Counter()
    for d in dl:
        df.update(set(toks[d]))

    def idf(t):
        return math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)

    def bm25(terms):
        scores = {}
        for d in dl:
            s = 0.0
            for t in terms:
                f = tf[d].get(t, 0)
                if f:
                    s += idf(t) * f * (K1 + 1) / (f + K1 * (1 - B + B * dl[d] / avgdl))
            if s > 0:
                scores[d] = s
        return sorted(scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))

    out_exp, out_rank = {}, {}
    for qid, q in queries:
        qterms = list(dict.fromkeys(q.strip().lower().split()))
        fb = [d for d, _ in bm25(qterms)[:fb_docs]]
        w = Counter()
        for d in fb:
            for t, f in tf[d].items():
                w[t] += f * idf(t)
        cand = sorted(
            ((t, v) for t, v in w.items() if t not in qterms),
            key=lambda kv: (-round(kv[1], 6), kv[0]),
        )[:fb_terms]
        out_exp[qid] = [t for t, _ in cand]
        out_rank[qid] = [d for d, _ in bm25(qterms + out_exp[qid])[:k]]
    return out_exp, out_rank


def test_prf_matches_python_reference(spark, docs, index):
    rows = docs.collect()
    ref_exp, ref_rank = _python_reference(rows, QUERIES, fb_docs=5, fb_terms=3, k=10)

    got_exp = {}
    for r in prf_expansion_terms(index, docs, QUERIES, fb_docs=5, fb_terms=3).orderBy(
        "query_id", "trk"
    ).collect():
        got_exp.setdefault(r["query_id"], []).append(r["term"])
    assert got_exp == {q: ts for q, ts in ref_exp.items() if ts}

    got_rank = {}
    for r in prf_topk(index, docs, QUERIES, k=10, fb_docs=5, fb_terms=3).orderBy(
        "query_id", "rank"
    ).collect():
        got_rank.setdefault(r["query_id"], []).append(r["doc_id"])
    assert got_rank == {q: ds for q, ds in ref_rank.items() if ds}


def test_prf_expansion_changes_results(spark, docs, index):
    """Expansion must actually widen recall: pass-2 result sets differ
    from plain BM25 for at least one query (else the operator is a
    no-op on this corpus)."""
    from embed_rerank_spark.operators.wand import wand_topk

    plain = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in wand_topk(index, QUERIES, k=10).collect()
    }
    prf = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in prf_topk(index, docs, QUERIES, k=10).collect()
    }
    assert prf != plain
