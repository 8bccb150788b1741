"""BM25F field-weighted retrieval (weighted token stream)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from embed_rerank_spark.operators.bm25 import (  # noqa: E402
    bm25_topk_bruteforce,
    bm25f_topk_bruteforce,
    fielded_weighted_docs,
)
from embed_rerank_spark.operators.postings import InvertedIndex, build_postings  # noqa: E402
from embed_rerank_spark.operators.wand import wand_topk  # noqa: E402

# doc 1: "join" only in the BODY (beyond the 3-token title window);
# doc 2: "join" in the TITLE. Same tf otherwise, so plain BM25 scores
# them closely while BM25F must put the title match first.
DOCS = [
    (1, "alpha beta gamma join join delta epsilon zeta"),
    (2, "join join alpha beta gamma delta epsilon zeta"),
    (3, "alpha beta gamma delta epsilon zeta eta theta"),
]


def test_title_weight_reorders_and_paths_agree(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = [(1, "join")]

    brute = bm25f_topk_bruteforce(
        spark, docs, queries, k=3, title_len=3, title_weight=3
    ).collect()
    assert [r["doc_id"] for r in sorted(brute, key=lambda r: r["rank"])] == [2, 1]

    # plain BM25 ties the two docs (same tf/dl) -> doc_id asc breaks it
    plain = bm25_topk_bruteforce(spark, docs, queries, k=3).collect()
    s = {r["doc_id"]: round(r["score"], 6) for r in plain}
    assert s[1] == s[2]

    # index path over the weighted stream == brute force
    built = build_postings(
        fielded_weighted_docs(docs, title_len=3, title_weight=3), n_shards=2
    )
    cs = built["corpus_stats"].collect()[0]
    index = InvertedIndex(
        postings=built["postings"],
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )
    wand = wand_topk(index, queries, k=3).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in sorted(wand, key=key)
    ] == [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in sorted(brute, key=key)
    ]


def test_short_docs_title_only(spark):
    # docs shorter than the title window: every token is title, body
    # slice is empty — weighting scales tf AND dl uniformly
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a a")], "doc_id long, text string"
    )
    out = bm25f_topk_bruteforce(
        spark, docs, [(1, "a")], k=2, title_len=8, title_weight=2
    ).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [2, 1]


def test_cross_fields_rewards_terms_split_across_fields(spark):
    from embed_rerank_spark.operators.bm25 import (
        cross_fields_topk_bruteforce,
        dismax_topk_bruteforce,
    )

    # title = first 2 tokens. doc 1 splits the query across fields
    # (alice in title, smith in body); doc 2 has both only in body.
    rows = [
        (1, "alice cooper here is smith writing filler filler"),
        (2, "other words alice smith in the body text"),
        (3, "unrelated content entirely different words here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = [(1, "alice smith")]
    cf = {r["doc_id"]: r["score"] for r in
          cross_fields_topk_bruteforce(spark, docs, q, k=5, title_len=2).collect()}
    assert set(cf) == {1, 2}
    # term-centric: both docs cover both terms, so both get credit for
    # both terms; per-term best-field must be >= any single field score
    dm = {r["doc_id"]: r["score"] for r in
          dismax_topk_bruteforce(spark, docs, q, k=5, tie_breaker=0.0, title_len=2).collect()}
    # with tie_breaker=0 dis_max keeps only the best FIELD; cross_fields
    # keeps the best field PER TERM, so it can only be >= dis_max
    for d in cf:
        assert cf[d] >= dm[d] - 1e-12
    # doc 1's cross_fields score strictly beats its dis_max score: its
    # terms live in different fields
    assert cf[1] > dm[1] + 1e-9


def test_cross_fields_single_field_degenerates_to_bm25(spark):
    from embed_rerank_spark.operators.bm25 import (
        bm25_topk_bruteforce,
        cross_fields_topk_bruteforce,
    )

    # title_len larger than any doc: body is empty, title == whole doc,
    # so cross_fields == plain BM25 over the title "field" == the corpus
    rows = [(1, "scan fast table"), (2, "scan slow"), (3, "other words")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = [(1, "scan table")]
    cf = [(r["rank"], r["doc_id"], round(r["score"], 6)) for r in
          cross_fields_topk_bruteforce(spark, docs, q, k=5, title_len=100).collect()]
    bm = [(r["rank"], r["doc_id"], round(r["score"], 6)) for r in
          bm25_topk_bruteforce(spark, docs, q, k=5).collect()]
    assert cf == bm


def test_most_fields_is_boost_weighted_sum(spark):
    """most_fields == w_t * title-BM25 + w_b * body-BM25; with
    tie_breaker=1 and unit boosts it equals dis_max exactly (max +
    1.0 * rest == sum)."""
    from embed_rerank_spark.operators.bm25 import (
        dismax_topk_bruteforce,
        most_fields_topk_bruteforce,
    )

    rows = [
        (1, "scan fast table body words about scan here scan again"),
        (2, "other title terms entirely scan scan scan scan scan scan"),
        (3, "scan table scan table filler filler filler filler filler filler"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = [(1, "scan table")]
    mf = {(r.doc_id): round(r.score, 9) for r in
          most_fields_topk_bruteforce(
              spark, docs, q, k=5, title_len=4, field_boosts=(1.0, 1.0)
          ).collect()}
    dm1 = {(r.doc_id): round(r.score, 9) for r in
           dismax_topk_bruteforce(
               spark, docs, q, k=5, title_len=4, tie_breaker=1.0
           ).collect()}
    assert mf == dm1 and mf
    # a title boost reorders: doc whose match sits in the title gains
    mf2 = {r.doc_id: r.score for r in
           most_fields_topk_bruteforce(
               spark, docs, q, k=5, title_len=4, field_boosts=(3.0, 1.0)
           ).collect()}
    mf1 = {r.doc_id: r.score for r in
           most_fields_topk_bruteforce(
               spark, docs, q, k=5, title_len=4, field_boosts=(1.0, 1.0)
           ).collect()}
    assert all(mf2[d] >= mf1[d] - 1e-12 for d in mf1)
    assert mf2[3] > mf1[3] + 1e-9  # doc 3's terms are all in the title


def test_random_score_deterministic_and_seed_sensitive(spark):
    from embed_rerank_spark.operators.bm25 import random_score_topk

    rows = [(i, f"w{i % 5} common") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = [(0, "common")]
    a = [(r.rank, r.doc_id, round(r.score, 9)) for r in
         random_score_topk(spark, docs, q, seed="s1", k=10).collect()]
    b = [(r.rank, r.doc_id, round(r.score, 9)) for r in
         random_score_topk(spark, docs.repartition(5), q, seed="s1", k=10).collect()]
    assert a == b  # same seed, partitioning-invariant
    c = [r.doc_id for r in random_score_topk(spark, docs, q, seed="s2", k=10).collect()]
    assert c != [d for _, d, _ in a]  # a new seed reshuffles
    assert all(0.0 <= s < 1.0 for _, _, s in a)


def test_terms_set_per_doc_minimum(spark):
    """terms_set honors each doc's own minimum: identical content,
    different required_matches -> different qualification."""
    from embed_rerank_spark.operators.bm25 import (
        bm25_topk_msm_bruteforce,
        terms_set_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "scan table fast", 1),
            (2, "scan table fast", 2),
            (3, "scan table fast", 3),
            (4, "scan only here", 1),
            (5, "scan only here", 2),
        ],
        "doc_id long, text string, req long",
    )
    q = [(0, "scan table")]
    got = {r.doc_id for r in terms_set_topk(spark, docs, q, "req", k=10).collect()}
    # docs 1-2 match 2 terms (req 1, 2 ok; doc 3 needs 3 > 2 -> out);
    # doc 4 matches 1 term (req 1 ok); doc 5 needs 2 > 1 -> out
    assert got == {1, 2, 4}
    # with a constant minimum the result equals static msm
    docs_const = docs.withColumn("req", docs.req * 0 + 2)
    a = sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 6))
        for r in terms_set_topk(spark, docs_const, q, "req", k=10).collect()
    )
    b = sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 6))
        for r in bm25_topk_msm_bruteforce(
            spark, docs_const.select("doc_id", "text"), q, k=10, msm=2
        ).collect()
    )
    assert a == b and a


def test_combined_fields_unit_weights_equal_plain_bm25(spark):
    # with w_title = w_body = 1 the pseudo-field IS the whole doc:
    # tf~ = tf, dl~ = dl, df~ = df, so combined_fields == plain BM25
    from embed_rerank_spark.operators.bm25 import combined_fields_topk_bruteforce

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = [(1, "join alpha"), (2, "zeta")]
    combined = combined_fields_topk_bruteforce(
        spark, docs, queries, k=3, title_len=3, title_weight=1.0, body_weight=1.0
    ).collect()
    plain = bm25_topk_bruteforce(spark, docs, queries, k=3).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in sorted(combined, key=key)
    ] == [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in sorted(plain, key=key)
    ]


def test_combined_fields_title_weight_reorders(spark):
    # doc 2 has "join" in the title window -> weighted tf~ is larger,
    # so combined_fields breaks the plain-BM25 tie in doc 2's favor
    from embed_rerank_spark.operators.bm25 import combined_fields_topk_bruteforce

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = combined_fields_topk_bruteforce(
        spark, docs, [(1, "join")], k=3, title_len=3, title_weight=3.0
    ).collect()
    ordered = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ordered == [2, 1]


def test_combined_fields_python_reference(spark):
    # exact parity with a pure-Python replay of the combined-statistics
    # BM25 (shared saturation, weighted tf/dl, any-field df)
    import math

    from embed_rerank_spark.operators.bm25 import combined_fields_topk_bruteforce

    title_len, wt, wb, k1, b = 3, 2.0, 1.0, 1.2, 0.75
    toks = {d: t.split() for d, t in DOCS}
    tfc: dict[int, dict[str, float]] = {}
    dlc: dict[int, float] = {}
    for d, ts in toks.items():
        title, body = ts[:title_len], ts[title_len:]
        acc: dict[str, float] = {}
        for t in title:
            acc[t] = acc.get(t, 0.0) + wt
        for t in body:
            acc[t] = acc.get(t, 0.0) + wb
        tfc[d] = acc
        dlc[d] = wt * len(title) + wb * len(body)
    n = len(dlc)
    avg = sum(dlc.values()) / n
    dfc: dict[str, int] = {}
    for acc in tfc.values():
        for t in acc:
            dfc[t] = dfc.get(t, 0) + 1

    def score(d: int, q: str) -> float:
        s = 0.0
        for t in set(q.split()):
            f = tfc[d].get(t)
            if f is None:
                continue
            idf = math.log((n - dfc[t] + 0.5) / (dfc[t] + 0.5) + 1.0)
            s += idf * f * (k1 + 1.0) / (f + k1 * (1.0 - b + b * dlc[d] / avg))
        return s

    queries = [(1, "join delta"), (2, "alpha zeta")]
    expect = {}
    for qid, q in queries:
        ranked = sorted(
            ((round(score(d, q), 6), d) for d in tfc if score(d, q) > 0),
            key=lambda x: (-x[0], x[1]),
        )
        expect[qid] = [(i + 1, d, s) for i, (s, d) in enumerate(ranked)]

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = combined_fields_topk_bruteforce(
        spark, docs, queries, k=3, title_len=title_len,
        title_weight=wt, body_weight=wb,
    ).collect()
    got: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 6))
        )
    assert got == expect


def test_sparse_vector_dot_product_reference(spark):
    import math

    import pytest as _pytest

    from embed_rerank_spark.operators.bm25 import sparse_vector_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple cherry cherry cherry"),
            (4, "durian"),
        ],
        "doc_id long, text string",
    )
    qv = [(1, [("apple", 2.0), ("cherry", 0.5)]), (2, [("zzz", 1.0)])]
    got = {
        (r["query_id"], r["doc_id"]): (r["rank"], round(r["score"], 6))
        for r in sparse_vector_topk(spark, docs, qv, k=10).collect()
    }

    # python reference: w_d = ln(1+tf) * idf, score = sum qw * w_d
    n = 4
    tf = {1: {"apple": 2, "banana": 1}, 2: {"banana": 1, "cherry": 1},
          3: {"apple": 1, "cherry": 3}, 4: {"durian": 1}}
    dfreq = {"apple": 2, "banana": 2, "cherry": 2, "durian": 1}
    def idf(t):
        d = dfreq[t]
        return math.log((n - d + 0.5) / (d + 0.5) + 1.0)
    want_scores = {}
    for qid, vec in qv:
        for d, terms in tf.items():
            s = sum(w * math.log(1 + terms[t]) * idf(t) for t, w in vec if t in terms)
            if s > 0:
                want_scores[(qid, d)] = s
    assert set(got) == set(want_scores)
    for key, s in want_scores.items():
        assert got[key][1] == round(s, 6)
    # ranking: q1 ranks docs by the dot product desc
    q1 = sorted(
        ((d, s) for (q, d), s in want_scores.items() if q == 1),
        key=lambda x: (-round(x[1], 6), x[0]),
    )
    assert [got[(1, d)][0] for d, _ in q1] == list(range(1, len(q1) + 1))
    # dup term keeps max weight; non-positive weights rejected
    one = sparse_vector_topk(
        spark, docs, [(9, [("apple", 1.0), ("apple", 2.0)])], k=5
    ).collect()
    two = sparse_vector_topk(spark, docs, [(9, [("apple", 2.0)])], k=5).collect()
    assert sorted((r["doc_id"], round(r["score"], 6)) for r in one) == sorted(
        (r["doc_id"], round(r["score"], 6)) for r in two
    )
    with _pytest.raises(ValueError):
        sparse_vector_topk(spark, docs, [(9, [("apple", -1.0)])], k=5)
