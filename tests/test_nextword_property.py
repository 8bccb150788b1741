"""Randomized stress test: the next-word phrase kernel (bigram
adjacency streams + score-only unigrams) == the unigram phrase kernel
== a pure-Python sliding-window reference, across corpus shapes
(tiny vocab / heavy repeats, duplicated phrase tokens, overlapping
self-bigrams like "b b b", single-token phrases, OOV)."""

from __future__ import annotations

import numpy as np

from embed_rerank_spark.operators.positions import (
    NEXTWORD_JOINER,
    _phrase_match_score,
)


def _termdata_from_docs(doc_tokens: dict[int, list[str]], bigrams: bool):
    """doc_id -> token list  ->  termdata dict in the loader's shape:
    term -> (docs asc, tf, dl, pos_flat, pos_offsets). ``bigrams``
    adds supertoken entries (position = first-token position); dl
    stays the UNIGRAM doc length for supertokens too, matching the
    separate-build semantics where only unigram dl is ever scored."""
    by_term: dict[str, dict[int, list[int]]] = {}
    for did, toks in sorted(doc_tokens.items()):
        for i, t in enumerate(toks):
            by_term.setdefault(t, {}).setdefault(did, []).append(i)
        if bigrams:
            for i in range(len(toks) - 1):
                bg = toks[i] + NEXTWORD_JOINER + toks[i + 1]
                by_term.setdefault(bg, {}).setdefault(did, []).append(i)
    td = {}
    for t, per_doc in by_term.items():
        docs = np.array(sorted(per_doc), dtype=np.int64)
        tf = np.array([len(per_doc[d]) for d in docs], dtype=np.int64)
        dl = np.array([len(doc_tokens[d]) for d in docs], dtype=np.int64)
        pf = np.array([p for d in docs for p in per_doc[d]], dtype=np.int64)
        po = np.concatenate(([0], np.cumsum(tf)))
        td[t] = (docs, tf, dl, pf, po)
    return td


def _ref_match(doc_tokens, phrase):
    """{doc_id: first_pos} via the naive sliding window."""
    out = {}
    n = len(phrase)
    for did, toks in doc_tokens.items():
        for i in range(len(toks) - n + 1):
            if toks[i : i + n] == phrase:
                out[did] = i
                break
    return out


def _run_case(seed, n_docs, vocab, doc_len_hi, n_phrases):
    rng = np.random.default_rng(seed)
    words = [f"v{i}" for i in range(vocab)]
    doc_tokens = {
        d: [words[int(i)] for i in rng.integers(0, vocab, int(rng.integers(1, doc_len_hi)))]
        for d in range(n_docs)
    }
    td = _termdata_from_docs(doc_tokens, bigrams=True)
    idf = {t: 1.0 + (hash(t) % 7) / 10 for t in words}
    avgdl = float(np.mean([len(t) for t in doc_tokens.values()]))
    for pi in range(n_phrases):
        plen = int(rng.integers(1, 4))
        phrase = [words[int(i)] for i in rng.integers(0, vocab, plen)]
        if pi == 0:
            phrase = ["zyzzyva"]  # OOV
        uni = _phrase_match_score(td, phrase, idf, avgdl, 1.2, 0.75)
        if plen >= 2 or pi == 0:
            bgs = [
                phrase[i] + NEXTWORD_JOINER + phrase[i + 1]
                for i in range(len(phrase) - 1)
            ] or ["zyzzyva"]
            nw = _phrase_match_score(td, phrase, idf, avgdl, 1.2, 0.75, bgs)
            assert list(uni[0]) == list(nw[0]), (seed, phrase)
            np.testing.assert_allclose(uni[1], nw[1])
            assert list(uni[2]) == list(nw[2])
        ref = _ref_match(doc_tokens, phrase)
        assert {int(d): int(p) for d, p in zip(uni[0], uni[2])} == ref, (seed, phrase)


def test_nextword_kernel_randomized():
    # tiny vocab -> dense overlapping bigrams ("b b b") and duplicated
    # phrase tokens; larger vocab -> sparse rare-match shapes
    for seed in range(12):
        _run_case(seed, n_docs=30, vocab=3, doc_len_hi=40, n_phrases=12)
        _run_case(seed + 100, n_docs=40, vocab=12, doc_len_hi=25, n_phrases=10)
