"""Randomized stress test: block-max WAND == brute force on synthetic
posting lists across corpus shapes (dense/sparse, skewed tf, tiny k,
k > matches, single-posting terms, heavy ties)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from embed_rerank_spark import BM25_B, BM25_K1
from embed_rerank_spark.functions.codec import encode_posting_list
from embed_rerank_spark.operators.wand import _wand_one_query


def _mk_corpus(rng, n_docs, n_terms, density, tie_heavy=False):
    """-> tf dict term -> list[(doc, tf)], dls"""
    postings = {}
    dls = np.zeros(n_docs, dtype=np.int64)
    for ti in range(n_terms):
        term = f"t{ti}"
        docs = np.flatnonzero(rng.random(n_docs) < density * rng.uniform(0.2, 1.8))
        if len(docs) == 0:
            continue
        tfs = (
            np.ones(len(docs), dtype=np.int64)
            if tie_heavy
            else rng.integers(1, 8, len(docs)).astype(np.int64)
        )
        postings[term] = (docs.astype(np.int64), tfs)
        np.add.at(dls, docs, tfs)
    dls = np.maximum(dls, 1)
    return postings, dls


def _run_case(seed, n_docs, n_terms, density, q_size, k, block_size, tie_heavy=False):
    rng = np.random.default_rng(seed)
    postings, dls = _mk_corpus(rng, n_docs, n_terms, density, tie_heavy)
    if not postings:
        return
    avgdl = float(dls.mean())
    n = n_docs
    idf = {
        t: math.log((n - len(d[0]) + 0.5) / (len(d[0]) + 0.5) + 1.0)
        for t, d in postings.items()
    }
    terms = list(postings)
    qterms = list(rng.choice(terms, size=min(q_size, len(terms)), replace=False))

    # brute force (float64, same formula association)
    scores = defaultdict(float)
    for t in qterms:
        docs, tfs = postings[t]
        for d, tf in zip(docs, tfs):
            dl = float(dls[d])
            scores[int(d)] += (
                idf[t]
                * (float(tf) * (BM25_K1 + 1.0))
                / (float(tf) + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
            )
    # engine tie semantics: rank on round(score, 6), then doc_id asc
    brute = sorted(scores.items(), key=lambda x: (-round(x[1], 6), x[0]))[:k]

    def encode_runs(split_runs: bool):
        """term -> list of runs; optionally split each posting list
        into two interleaved runs (the multi-unit tiered-index shape:
        disjoint docs, overlapping ranges)."""
        term_blocks = {}
        for t in qterms:
            docs, tfs = postings[t]
            parts = (
                [(docs[0::2], tfs[0::2]), (docs[1::2], tfs[1::2])]
                if split_runs and len(docs) > 1
                else [(docs, tfs)]
            )
            runs = []
            for seg, (d_r, tf_r) in enumerate(parts):
                blks = encode_posting_list(d_r, tf_r, dls[d_r], block_size)
                runs.append(
                    (
                        seg,
                        [
                            (b.first_doc, b.last_doc, b.n_docs, b.max_tf, b.min_dl,
                             b.docs_bin, b.tfs_bin, b.dls_bin)
                            for b in blks
                        ],
                    )
                )
            term_blocks[t] = runs
        return term_blocks

    for split_runs in (False, True):
        wand = sorted(
            _wand_one_query(
                encode_runs(split_runs), [(t, idf[t]) for t in qterms], k, avgdl,
                BM25_K1, BM25_B,
            ),
            key=lambda x: (-round(x[1], 6), x[0]),
        )
        assert [d for d, _ in brute] == [d for d, _ in wand], (
            seed, n_docs, density, q_size, k, block_size, split_runs,
            brute[:5], wand[:5],
        )
        for (_, bs), (_, ws) in zip(brute, wand):
            assert abs(bs - ws) < 1e-9

    # term-at-a-time path on the same corpus: identical ranking
    from embed_rerank_spark.operators.wand import _taat_topk, _tfpart

    cache = {}
    for t in qterms:
        docs, tfs = postings[t]
        cache[t] = (
            np.asarray(docs, dtype=np.int64),
            _tfpart(
                np.asarray(tfs, dtype=np.float64),
                dls[docs].astype(np.float64),
                avgdl,
                BM25_K1,
                BM25_B,
            ),
        )
    taat = sorted(
        _taat_topk(cache, [(t, idf[t]) for t in qterms], k),
        key=lambda x: (-round(x[1], 6), x[0]),
    )
    assert [d for d, _ in brute] == [d for d, _ in taat]
    for (_, bs), (_, ts) in zip(brute, taat):
        assert abs(bs - ts) < 1e-9


def test_wand_random_sweep():
    case = 0
    for n_docs in (50, 1000, 20000):
        for density in (0.005, 0.05, 0.6):
            for q_size in (1, 3, 6):
                for k in (1, 7, 100):
                    for block_size in (4, 128):
                        _run_case(case, n_docs, 12, density, q_size, k, block_size)
                        case += 1


def test_wand_tie_heavy():
    # uniform tf=1 corpora produce mass score ties — tie-break must hold
    for seed in range(20):
        _run_case(1000 + seed, 3000, 8, 0.3, 4, 15, 16, tie_heavy=True)
