"""Lucene interval queries (ordered + max_gaps) over the positional
index: pinned hand-corpus semantics, the phrase degenerate case, and
randomized parity against a per-doc Python existential check."""

from __future__ import annotations

import random

import pytest

from embed_rerank_spark.operators.positions import (
    build_positional_postings,
    interval_topk,
    load_positional_index,
    phrase_topk,
)


def _index(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return load_positional_index(build_positional_postings(docs, n_shards=2))


def _by_query(df):
    out: dict[int, list[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append(r["doc_id"])
    return {q: sorted(v) for q, v in out.items()}


def test_interval_gap_budget_pinned(spark):
    idx = _index(
        spark,
        [
            (1, "a b c"),          # a..c slack 1 (b between)
            (2, "a x x b x c"),    # a..c slack 3
            (3, "c b a"),          # wrong order
            (4, "a c"),            # slack 0, adjacent
            (5, "a x b"),          # no c
        ],
    )
    got = _by_query(interval_topk(idx, [(1, "a c", 0), (2, "a c", 1), (3, "a b c", 3)]))
    # a->c adjacent only in doc 4
    assert got.get(1) == [4]
    # one token of slack admits doc 1 (b between)
    assert got.get(2) == [1, 4]
    # ordered 3-chain with slack 3: doc 1 (slack 0) and doc 2 (slack 3)
    assert got.get(3) == [1, 2]


def test_interval_duplicate_term_needs_two_occurrences(spark):
    idx = _index(spark, [(1, "the fast the"), (2, "the fast car")])
    got = _by_query(interval_topk(idx, [(1, "the the", 4)]))
    assert got.get(1) == [1]


def test_interval_oov_term_empty(spark):
    idx = _index(spark, [(1, "a b c")])
    assert interval_topk(idx, [(1, "a zyzzyva", 5)]).count() == 0


def test_interval_maxgaps_zero_degenerates_to_phrase(spark):
    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = load_positional_index(build_positional_postings(corpus, n_shards=4))
    for phrase in ("fast table", "sort merge", "hash join"):
        ph = _by_query(phrase_topk(idx, [(1, phrase)], k=1000))
        iv = _by_query(interval_topk(idx, [(1, phrase, 0)], k=1000))
        assert iv == ph, phrase


def _brute_match(tokens: list[str], terms: list[str], gaps: int) -> bool:
    """Existential check by explicit position enumeration (tiny docs)."""
    from itertools import product

    poss = [[p for p, t in enumerate(tokens) if t == term] for term in terms]
    for combo in product(*poss):
        if all(combo[i] < combo[i + 1] for i in range(len(combo) - 1)) and (
            combo[-1] - combo[0] + 1 - len(terms) <= gaps
        ):
            return True
    return False


def test_interval_randomized_parity_vs_enumeration(spark):
    rng = random.Random(42)
    vocab = ["a", "b", "c", "d"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12))))
        for i in range(40)
    ]
    idx = _index(spark, rows)
    queries = []
    wants: dict[int, list[int]] = {}
    for qid in range(1, 9):
        k = rng.randint(2, 3)
        terms = [rng.choice(vocab) for _ in range(k)]
        gaps = rng.randint(0, 4)
        queries.append((qid, " ".join(terms), gaps))
        wants[qid] = sorted(
            d for d, text in rows if _brute_match(text.split(), terms, gaps)
        )
    got = _by_query(interval_topk(idx, queries, k=1000))
    for qid, want in wants.items():
        assert got.get(qid, []) == want, (qid, queries[qid - 1])


def test_highlight_fragments_tiles_and_order(spark):
    from embed_rerank_spark.operators.positions import highlight_fragments

    docs = spark.createDataFrame(
        [(1, "a b c d a b x x x a"), (2, "x y z")],
        "doc_id long, text string",
    )
    idx = _index(spark, [(r.doc_id, r.text) for r in docs.collect()])
    out = highlight_fragments(idx, docs, [(1, "a b")], k=5, window=3, n_fragments=2)
    rows = sorted(
        ((r["frag_rank"], r["frag_start"], r["n_terms"], r["fragment"]) for r in out.collect()),
    )
    # doc 1 tiles: [a b c][d a b][x x x][a]; both query terms in tiles
    # 0 and 1, ties break on earlier tile
    assert rows == [
        (1, 0, 2, "a b c"),
        (2, 3, 2, "d a b"),
    ]
