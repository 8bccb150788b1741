"""Distributed BPE training parity against a pure-Python Sennrich
reference (pair counting over the word-frequency dict, leftmost
non-overlapping merge, count-desc/pair-asc tie rule)."""

from __future__ import annotations

from collections import Counter

import pytest

from embed_rerank_spark.operators.bpe import (
    END_OF_WORD,
    bpe_train,
    bpe_train_reference,
    bpe_vocab,
    word_counts,
)

CORPUS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new"),
    (2, "wide wider widest new low"),
    (3, "low new lower newer"),
]


# the pure-Python Sennrich reference now lives in the package (it
# doubles as the .oracle_aux recompute for the bpe_merges contract
# entry); these tests keep pinning the distributed path against it
_ref_bpe = bpe_train_reference


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string").repartition(7)


def test_merges_match_reference(spark, docs):
    merges, symtab = bpe_train(spark, docs, n_merges=12)
    ref_merges, ref_symtab = _ref_bpe([t for _, t in CORPUS], 12)
    assert merges == ref_merges and len(merges) > 3
    got = {r.word: tuple(r.syms) for r in symtab.collect()}
    assert got == ref_symtab


def test_early_stop_on_min_pair_count(spark):
    # every word unique, all pair counts 1 -> zero merges at floor 2
    docs = spark.createDataFrame(
        [(0, "ab cd ef")], "doc_id long, text string"
    )
    merges, _ = bpe_train(spark, docs, n_merges=5, min_pair_count=2)
    assert merges == []
    # floor 1 merges greedily and still terminates deterministically
    merges1, _ = bpe_train(spark, docs, n_merges=3, min_pair_count=1)
    ref1, _ = _ref_bpe(["ab cd ef"], 3, min_pair_count=1)
    assert merges1 == ref1 and len(merges1) == 3


def test_vocab_totals(spark, docs):
    _, symtab = bpe_train(spark, docs, n_merges=6)
    vocab = bpe_vocab(symtab).collect()
    wc = {r.word: r.n for r in word_counts(docs).collect()}
    syms = {r.word: r.syms for r in symtab.collect()}
    want: Counter = Counter()
    for w, seq in syms.items():
        for s in seq:
            want[s] += wc[w]
    got = {r.token: r.total for r in vocab}
    assert got == dict(want)
    # ordering pinned: total desc, token asc
    keys = [(r.token, r.total) for r in vocab]
    assert keys == sorted(keys, key=lambda kv: (-kv[1], kv[0]))


def test_partition_invariance(spark, docs):
    m1, _ = bpe_train(spark, docs, n_merges=8)
    m2, _ = bpe_train(spark, docs.repartition(3), n_merges=8)
    assert m1 == m2


def test_bpe_apply_exact_sequences(spark):
    """Hand-checked encode: leftmost non-overlapping repeats, chained
    merges, end-of-word merges, never-firing merges, word order kept."""
    from embed_rerank_spark.operators.bpe import bpe_apply

    docs = spark.createDataFrame(
        [(0, "batch data aggg"), (1, "scan batch")],
        "doc_id long, text string",
    )
    merges = [
        ("a", "t"), ("g", "g"), ("at", "c"), ("atc", "h"),
        ("atch", "</w>"), ("s", "c"), ("sc", "a"), ("sca", "n"),
        ("q", "z"),
    ]
    out = {r.doc_id: (r.n_tokens, r.tokens) for r in bpe_apply(docs, merges).collect()}
    # aggg: a g g g </w> -> (g,g) leftmost non-overlapping -> a gg g </w>
    assert out[0] == (
        10,
        ["b", "atch</w>", "d", "at", "a", "</w>", "a", "gg", "g", "</w>"],
    )
    assert out[1] == (4, ["scan", "</w>", "b", "atch</w>"])


def test_bpe_encode_reproduces_training_segmentation(spark, docs):
    """Encoding the training corpus with the trained merge table yields
    exactly the final training symtab — the apply step and the encoder
    are the same algorithm."""
    from embed_rerank_spark.operators.bpe import bpe_train, bpe_word_map

    merges, symtab = bpe_train(spark, docs, n_merges=6)
    trained = {r.word: list(r.syms) for r in symtab.collect()}
    encoded = {
        r.word: list(r.subwords)
        for r in bpe_word_map(docs, [(a, b) for a, b, _ in merges]).collect()
    }
    assert encoded == trained
