"""Block-max WAND must reproduce the brute-force BM25 top-k EXACTLY
(doc ids rank-identical, scores equal to float-sum tolerance) — the
engine's core correctness gate (BASELINE.json north_rule)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce
from embed_rerank_spark.operators.postings import InvertedIndex, build_postings, write_index
from embed_rerank_spark.operators.wand import wand_topk
from embed_rerank_spark.queryset import QUERY_SET

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def index(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("windex"))
    write_index(build_postings(docs, n_shards=4, block_size=16), path)
    return InvertedIndex.load(spark, path)


def _rows(df):
    return [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in df.orderBy("query_id", "rank").collect()
    ]


def test_wand_matches_bruteforce_exactly(spark, docs, index):
    k = 10
    brute = _rows(bm25_topk_bruteforce(spark, docs, QUERY_SET, k=k))
    wand = _rows(wand_topk(index, QUERY_SET, k=k, taat_threshold=0))
    assert len(brute) == len(wand) > 0
    for (bq, br, bd, bs), (wq, wr, wd, ws) in zip(brute, wand):
        assert (bq, br, bd) == (wq, wr, wd)
        assert ws == pytest.approx(bs, abs=1e-9)


def test_wand_various_k(spark, docs, index):
    for k in (1, 3, 25):
        brute = _rows(bm25_topk_bruteforce(spark, docs, QUERY_SET[:3], k=k))
        wand = _rows(wand_topk(index, QUERY_SET[:3], k=k, taat_threshold=0))
        assert [(q, r, d) for q, r, d, _ in brute] == [(q, r, d) for q, r, d, _ in wand]


def test_wand_rare_and_hot_terms(spark, docs, index):
    # rare term 'dup' (df~26) + hot stopwords
    qs = [(1, "dup"), (2, "the a the the")]
    brute = _rows(bm25_topk_bruteforce(spark, docs, qs, k=50))
    wand = _rows(wand_topk(index, qs, k=50, taat_threshold=0))
    assert [(q, r, d) for q, r, d, _ in brute] == [(q, r, d) for q, r, d, _ in wand]


def test_wand_out_of_vocab_query(index):
    out = wand_topk(index, [(9, "zzz unknown words")], k=5)
    assert out.count() == 0


def test_wand_k_exceeds_matches(spark, docs, index):
    qs = [(1, "dup")]
    brute = _rows(bm25_topk_bruteforce(spark, docs, qs, k=100000))
    wand = _rows(wand_topk(index, qs, k=100000))
    assert [(q, r, d) for q, r, d, _ in brute] == [(q, r, d) for q, r, d, _ in wand]


def test_wand_single_doc_scores_match_formula(spark, docs, index):
    # independent sanity: hand-compute the score of the top hit for 'dup'
    import math

    from embed_rerank_spark import BM25_B, BM25_K1
    from embed_rerank_spark.operators.bm25 import doc_lengths, term_freqs

    tf = term_freqs(docs)
    dl = doc_lengths(tf)
    n, avgdl = dl.agg(F.count(F.lit(1)), F.avg("dl")).first()
    df = tf.filter(F.col("term") == "dup").count()
    top = wand_topk(index, [(1, "dup")], k=1).collect()[0]
    row = tf.filter((F.col("term") == "dup") & (F.col("doc_id") == top.doc_id)).first()
    d_len = dl.filter(F.col("doc_id") == top.doc_id).first().dl
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    expect = idf * (row.tf * (BM25_K1 + 1)) / (
        row.tf + BM25_K1 * (1 - BM25_B + BM25_B * d_len / avgdl)
    )
    assert top.score == pytest.approx(expect, rel=1e-12)


def test_taat_path_equals_pivot_path(spark, docs, index):
    """The vectorized term-at-a-time path (default for short lists)
    must produce byte-identical results to the pivot WAND walk."""
    taat = _rows(wand_topk(index, QUERY_SET, k=10))  # default: taat
    pivot = _rows(wand_topk(index, QUERY_SET, k=10, taat_threshold=0))
    assert [(q, r, d) for q, r, d, _ in taat] == [(q, r, d) for q, r, d, _ in pivot]
    for (_, _, _, sa), (_, _, _, sb) in zip(taat, pivot):
        assert abs(sa - sb) < 1e-9  # float summation order only


def test_boosted_topk_matches_python_reference(spark, docs, index):
    """term^w boosts: exact vs a weighted-BM25 python reference; WAND
    pruning bounds must absorb the boost (taat_threshold=0 forces the
    pivot path too)."""
    import math
    from collections import Counter

    from embed_rerank_spark.queryset import BOOSTED_SET, boosted_terms_literal

    rows = [(r["doc_id"], r["text"].strip().lower().split()) for r in docs.collect()]
    rows = [(d, t) for d, t in rows if t]
    n = len(rows)
    avgdl = sum(len(t) for _d, t in rows) / n
    dfs: Counter = Counter()
    for _d, t in rows:
        dfs.update(set(t))

    by_q: dict[int, list[tuple[str, float]]] = {}
    for qid, t, w in boosted_terms_literal():
        by_q.setdefault(qid, []).append((t, w))
    want = {}
    for qid, terms in by_q.items():
        scored = []
        for d, toks in rows:
            s = 0.0
            for t, w in terms:
                tf = toks.count(t)
                if tf and dfs[t]:
                    idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
                    s += w * idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
            if s > 0:
                scored.append((d, s))
        scored.sort(key=lambda x: (-round(x[1], 6), x[0]))
        for rk, (d, s) in enumerate(scored[:10], 1):
            want[(qid, rk)] = (d, round(s, 6))

    for taat in (0, 10**9):
        got = {
            (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 6))
            for r in wand_topk(
                index, BOOSTED_SET, k=10, parse_boosts=True, taat_threshold=taat
            ).collect()
        }
        assert got == want

    # boosts actually reorder: boosted != unboosted for some query
    plain = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in wand_topk(
            index, [(q, s.replace("^2", "").replace("^0.5", "").replace("^3", ""))
                    for q, s in BOOSTED_SET], k=10
        ).collect()
    }
    boosted_ids = {k: v[0] for k, v in want.items()}
    assert boosted_ids != plain


def test_negative_and_nan_boosts_fall_back_to_literal(spark, docs, index):
    """term^-3 / term^nan must NOT parse as weights: a negative (or
    NaN) idf inverts the term upper bound — max contribution would sit
    at MIN tf — so block-max WAND could prune true top-k members. The
    parse falls back to the literal token (out of vocabulary, hence
    dropped), like any malformed suffix; Lucene rejects negative
    boosts for the same reason."""
    _qid, q = QUERY_SET[0]
    first = q.split()[0]
    base = _rows(wand_topk(index, [(1, q)], k=10))
    for bad in (f"{q} {first}^-3", f"{q} {first}^nan", f"{q} {first}^-0.5"):
        got = _rows(wand_topk(index, [(1, bad)], k=10, parse_boosts=True))
        assert got == base, bad


# ---- ES terms-lookup query (seed-doc term set, ANY-match filter) ----

TL_DOCS = [
    (1, "fast hash join beats sort merge join"),
    (2, "slow table scan over the table"),
    (3, "hash table lookup the fast path"),
    (4, "merge sort merge the slow path"),
    (5, "scan scan scan row row"),
    (6, "a lone row span"),
]


@pytest.fixture(scope="module")
def tl_setup(spark, tmp_path_factory):
    tl_docs = spark.createDataFrame(TL_DOCS, "doc_id long, text string")
    path = str(tmp_path_factory.mktemp("tlindex"))
    write_index(build_postings(tl_docs, n_shards=2, block_size=8), path)
    return tl_docs, InvertedIndex.load(spark, path)


def test_terms_lookup_matches_any_seed_term(spark, tl_setup):
    from embed_rerank_spark.operators.wand import terms_lookup_topk

    tl_docs, tl_index = tl_setup
    out = terms_lookup_topk(tl_index, tl_docs, [(1, 2), (2, 6)], k=10, boost=2.0)
    rows = out.collect()
    assert rows and all(r["score"] == 2.0 for r in rows)
    toks = {d: set(t.lower().split()) for d, t in TL_DOCS}
    for qid, seed in [(1, 2), (2, 6)]:
        got = sorted(r["doc_id"] for r in rows if r["query_id"] == qid)
        want = sorted(d for d, ts in toks.items() if ts & toks[seed])
        assert got == want
        assert seed in got  # ES: the seed matches itself
        ranks = [r["rank"] for r in sorted(
            (r for r in rows if r["query_id"] == qid), key=lambda r: r["doc_id"]
        )]
        assert ranks == list(range(1, len(ranks) + 1))  # doc_id asc order


def test_terms_lookup_max_terms_guard(spark, tl_setup):
    import pytest as _pytest

    from embed_rerank_spark.operators.wand import terms_lookup_topk

    tl_docs, tl_index = tl_setup
    with _pytest.raises(ValueError):
        terms_lookup_topk(tl_index, tl_docs, [(1, 1)], max_terms=2)
