"""Randomized boolean-query sweep: arbitrary clause combinations over
a random corpus must match a direct Python evaluation of the pinned
semantics (the same strategy test_wand_property.py uses for WAND)."""

from __future__ import annotations

import math
import random

import pytest

from embed_rerank_spark.operators.boolean import boolean_topk, parse_query
from embed_rerank_spark.operators.positions import (
    build_positional_postings,
    load_positional_index,
)

VOCAB = [f"t{i}" for i in range(12)]


def _random_corpus(rng: random.Random, n_docs: int):
    return [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 40))))
        for i in range(n_docs)
    ]


def _random_query(rng: random.Random) -> str:
    parts = []
    n = rng.randint(1, 4)
    for _ in range(n):
        kind = rng.choice(["must", "should", "not", "phrase", "prefix"])
        if kind == "phrase":
            parts.append(
                '"' + " ".join(rng.choice(VOCAB) for _ in range(rng.randint(2, 3))) + '"'
            )
        elif kind == "prefix":
            parts.append(rng.choice(["t1", "t"]) + "*")
        else:
            t = rng.choice(VOCAB)
            parts.append({"must": "+", "not": "-", "should": ""}[kind] + t)
    return " ".join(parts)


def _python_eval(corpus, query: str, k: int, max_expansion: int = 64):
    """Direct evaluation of the pinned boolean semantics."""
    bq = parse_query(query)
    docs = {d: t.split() for d, t in corpus}
    n = len(docs)
    dls = {d: len(t) for d, t in docs.items()}
    avgdl = sum(dls.values()) / n
    dfs: dict[str, int] = {}
    for toks in docs.values():
        for t in set(toks):
            dfs[t] = dfs.get(t, 0) + 1
    # prefix expansion: df desc, term asc, capped
    shoulds = list(bq.shoulds)
    for p in bq.prefixes:
        exp = sorted(
            (t for t in dfs if t.startswith(p)), key=lambda t: (-dfs[t], t)
        )[:max_expansion]
        shoulds.extend(exp)
    positives: dict[str, None] = {}
    for t in bq.musts:
        positives[t] = None
    for ph in bq.phrases:
        for t in ph:
            positives[t] = None
    for t in shoulds:
        positives[t] = None
    if not positives:
        return []
    if any(dfs.get(t, 0) == 0 for t in bq.musts):
        return []
    if any(dfs.get(t, 0) == 0 for ph in bq.phrases for t in ph):
        return []

    def contains_phrase(toks, ph):
        m = len(ph)
        return any(toks[i : i + m] == ph for i in range(len(toks) - m + 1))

    out = []
    for d, toks in docs.items():
        tokset = set(toks)
        if any(t not in tokset for t in bq.musts):
            continue
        if any(not contains_phrase(toks, ph) for ph in bq.phrases):
            continue
        if any(t in tokset for t in bq.nots):
            continue
        present = [t for t in positives if t in tokset]
        if not bq.musts and not bq.phrases and not present:
            continue
        score = 0.0
        for t in present:
            if dfs.get(t, 0) == 0:
                continue
            tf = toks.count(t)
            idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
            score += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
        out.append((d, score))
    out.sort(key=lambda x: (-round(x[1], 6), x[0]))
    return [(d, round(s, 6)) for d, s in out[:k]]


@pytest.mark.parametrize("seed", [11, 29, 47])
def test_boolean_random_sweep(spark, seed):
    rng = random.Random(seed)
    corpus = _random_corpus(rng, rng.randint(30, 80))
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    index = load_positional_index(
        build_positional_postings(docs, n_shards=3, block_size=8)
    )
    queries = [(i, _random_query(rng)) for i in range(12)]
    got_rows = boolean_topk(index, queries, k=6).collect()
    got: dict[int, list] = {}
    for r in sorted(got_rows, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 6))
        )
    for qid, q in queries:
        want = _python_eval(corpus, q, k=6)
        assert got.get(qid, []) == want, (qid, q, got.get(qid), want)
