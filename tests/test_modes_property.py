"""Randomized sweep: the new query modes (search_after pagination,
fuzzy expansion, BM25F) hold their exactness contracts on generated
corpora — seeds are fixed, so failures replay deterministically."""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from embed_rerank_spark.operators.bm25 import (  # noqa: E402
    bm25_topk_bruteforce,
    bm25f_topk_bruteforce,
    fielded_weighted_docs,
)
from embed_rerank_spark.operators.postings import InvertedIndex, build_postings  # noqa: E402
from embed_rerank_spark.operators.rewrite import expand_fuzzy, fuzzy_topk  # noqa: E402
from embed_rerank_spark.operators.wand import search_after_topk, wand_topk  # noqa: E402

VOCAB = [
    "fast", "hash", "join", "scan", "slow", "table", "merge", "sort",
    "row", "key", "agg", "the", "a", "data", "batch", "line",
]


def _mk_corpus(rng: random.Random, n: int):
    return [
        (
            i + 1,
            " ".join(rng.choices(VOCAB, k=rng.randint(3, 30))),
        )
        for i in range(n)
    ]


def _mk_index(spark, docs_rows, n_shards):
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    built = build_postings(docs, n_shards=n_shards)
    cs = built["corpus_stats"].collect()[0]
    return docs, InvertedIndex(
        postings=built["postings"],
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )


def _rows(df):
    return [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in sorted(df.collect(), key=lambda r: (r["query_id"], r["rank"]))
    ]


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_pagination_tiles_random_rankings(spark, seed):
    rng = random.Random(seed)
    docs_rows = _mk_corpus(rng, rng.randint(60, 150))
    _docs, index = _mk_index(spark, docs_rows, n_shards=rng.choice([2, 4, 8]))
    queries = [
        (qid, " ".join(rng.sample(VOCAB, rng.randint(1, 4))))
        for qid in range(1, 5)
    ]
    page_size = rng.randint(3, 9)
    full = _rows(wand_topk(index, queries, k=3 * page_size))
    tiled = []
    for page in (1, 2, 3):
        got = _rows(search_after_topk(index, queries, page_size=page_size, page=page))
        tiled.extend(
            (qid, rk + (page - 1) * page_size, d, s) for qid, rk, d, s in got
        )
    assert sorted(tiled) == sorted(full)


def _typo(rng: random.Random, w: str) -> str:
    i = rng.randrange(len(w))
    op = rng.choice(["del", "sub", "ins"])
    if op == "del" and len(w) > 1:
        return w[:i] + w[i + 1 :]
    if op == "sub":
        return w[:i] + rng.choice("qxz") + w[i + 1 :]
    return w[:i] + rng.choice("qxz") + w[i:]


@pytest.mark.parametrize("seed", [11, 22])
def test_fuzzy_equals_bruteforce_on_random_typos(spark, seed):
    rng = random.Random(seed)
    docs_rows = _mk_corpus(rng, 80)
    docs, index = _mk_index(spark, docs_rows, n_shards=4)
    queries = [
        (qid, " ".join(_typo(rng, w) for w in rng.sample(VOCAB, rng.randint(1, 3))))
        for qid in range(1, 6)
    ]
    terms = sorted({t for _q, q in queries for t in q.split()})
    exp = expand_fuzzy(index, terms)
    synth = []
    for qid, q in queries:
        out: list[str] = []
        for tok in q.split():
            for t in exp.get(tok, ()):
                if t not in out:
                    out.append(t)
        if out:
            synth.append((qid, " ".join(out)))
    assert _rows(fuzzy_topk(index, queries, k=8)) == _rows(
        bm25_topk_bruteforce(spark, docs, synth, k=8)
    )


@pytest.mark.parametrize("seed", [7, 77])
def test_bm25f_index_path_equals_bruteforce(spark, seed):
    rng = random.Random(seed)
    docs_rows = _mk_corpus(rng, rng.randint(50, 120))
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    tl, tw = rng.randint(2, 6), rng.randint(2, 4)
    built = build_postings(
        fielded_weighted_docs(docs, title_len=tl, title_weight=tw), n_shards=4
    )
    cs = built["corpus_stats"].collect()[0]
    index = InvertedIndex(
        postings=built["postings"],
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )
    queries = [
        (qid, " ".join(rng.sample(VOCAB, rng.randint(1, 3))))
        for qid in range(1, 5)
    ]
    assert _rows(wand_topk(index, queries, k=7)) == _rows(
        bm25f_topk_bruteforce(
            spark, docs, queries, k=7, title_len=tl, title_weight=tw
        )
    )


@pytest.mark.parametrize("seed", [17, 29])
def test_constant_score_random_corpora(spark, seed):
    from embed_rerank_spark.operators.wand import constant_score_topk

    rng = random.Random(seed)
    docs_rows = _mk_corpus(rng, rng.randint(60, 150))
    _docs, index = _mk_index(spark, docs_rows, n_shards=rng.choice([2, 4, 8]))
    queries = [
        (qid, " ".join(rng.sample(VOCAB, rng.randint(1, 3))))
        for qid in range(1, 6)
    ]
    k = rng.randint(3, 12)
    boost = round(rng.uniform(0.5, 4.0), 3)
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in constant_score_topk(index, queries, k=k, boost=boost).collect()
    }
    # python reference over the raw corpus
    toks = {d: set(t.split()) for d, t in docs_rows}
    want = {}
    for qid, q in queries:
        terms = set(q.split())
        match = sorted(d for d, ts in toks.items() if terms <= ts)
        for i, d in enumerate(match[:k]):
            want[(qid, i + 1)] = (d, boost)
    assert got == want
