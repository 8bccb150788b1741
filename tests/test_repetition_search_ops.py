"""Round-3 operators: repetition signals, dis_max, field collapse,
range facets, trigram infix wildcard."""

from __future__ import annotations

from pyspark.sql import functions as F

from embed_rerank_spark.operators.bm25 import (
    bm25_scores_bruteforce,
    collapse_topk,
    dismax_topk_bruteforce,
    query_terms,
)
from embed_rerank_spark.operators.facets import range_facets
from embed_rerank_spark.operators.textstats import repetition_signals


def test_repetition_signals_values(spark):
    rows = [
        (1, "a b a b a b c"),
        (2, "nav\nnav\nbody text\n\npar\n\npar"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    # 6 bigrams, 'a b' x3; 5 trigrams, 'a b a' x2
    assert got[1]["top_bigram_frac"] == 0.5
    assert got[1]["top_trigram_frac"] == 0.4
    # 5 lines 3 distinct; 21 line chars 15 distinct; 3 paras 2 distinct
    assert got[2]["n_lines"] == 5
    assert got[2]["dup_line_frac"] == 0.4
    assert got[2]["dup_line_char_frac"] == round((21 - 15) / 21, 6)
    assert got[2]["dup_para_frac"] == round(1 / 3, 6)
    assert got[3]["n_lines"] == 0 and got[3]["top_bigram_frac"] == 0.0


def test_repetition_signals_no_shuffle(spark):
    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    plan = repetition_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dismax_formula_against_per_field_scores(spark):
    # tie_breaker 0 -> pure best-field max; tie_breaker 1 -> plain sum.
    # Each field carries its OWN statistics (df/dl/avgdl), so the
    # per-field reference scorers are the ground truth.
    filler = " ".join(f"f{i}" for i in range(8))
    rows = [
        (1, "apple apple apple " + " ".join(f"x{i}" for i in range(5)) + " " + filler),
        (2, "apple " + " ".join(f"y{i}" for i in range(7)) + " apple " + filler),
        (3, "zz " + " ".join(f"w{i}" for i in range(15))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from embed_rerank_spark.operators.bm25 import split_fields

    fields = split_fields(docs)
    qt = query_terms(spark, [(1, "apple")])
    st = {r["doc_id"]: r["score"] for r in bm25_scores_bruteforce(fields["title"], qt).collect()}
    sb = {r["doc_id"]: r["score"] for r in bm25_scores_bruteforce(fields["body"], qt).collect()}
    for tie in (0.0, 0.3, 1.0):
        got = {r["doc_id"]: r["score"] for r in
               dismax_topk_bruteforce(spark, docs, [(1, "apple")], k=3, tie_breaker=tie).collect()}
        assert set(got) == set(st) | set(sb)
        for d, s in got.items():
            a, b2 = st.get(d, 0.0), sb.get(d, 0.0)
            want = max(a, b2) + tie * (a + b2 - max(a, b2))
            assert abs(s - want) < 1e-9


def test_collapse_topk_one_per_group_with_inner_hits(spark):
    scored = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 4.0), (1, 12, 3.0), (1, 13, 2.0)],
        "query_id long, doc_id long, score double",
    )
    meta = spark.createDataFrame(
        [(10, "a"), (11, "a"), (12, "b"), (13, "a")], "doc_id long, source string"
    )
    got = collapse_topk(scored, meta, k=10).collect()
    assert [(r["doc_id"], r["source"], r["inner_hits"]) for r in got] == [
        (10, "a", 3),
        (12, "b", 1),
    ]


def test_range_facets_buckets_and_tails(spark):
    docs = spark.createDataFrame(
        [(1, "apple", 10), (2, "apple", 100), (3, "apple", 250), (4, "none", 999)],
        "doc_id long, text string, n_chars long",
    )
    got = range_facets(spark, docs, [(1, "apple")], "n_chars", [100.0, 200.0]).collect()
    by_bucket = {r["bucket"]: (r["lo"], r["n_docs"]) for r in got}
    assert by_bucket == {
        "(-inf,100)": (99.0, 1),
        "[100,200)": (100.0, 1),
        "[200,inf)": (200.0, 1),
    }


def test_infix_trigram_path_matches_fallback(spark):
    from embed_rerank_spark.operators.postings import InvertedIndex, build_postings
    from embed_rerank_spark.operators.wand import (
        build_trigram_dictionary,
        expand_infix,
        infix_topk,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    built = build_postings(docs, n_shards=4)
    cs = built["corpus_stats"].collect()[0]
    idx = InvertedIndex(
        postings=built["postings"],
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )
    td = build_trigram_dictionary(idx)
    for needle in ["ash", "can", "alu", "zzz"]:
        assert expand_infix(idx, needle, 16, td) == expand_infix(idx, needle, 16, None)
    qs = [(1, "ash"), (2, "in"), (3, "zzz")]
    a = infix_topk(idx, qs, k=5, tri_dict=td).collect()
    b = infix_topk(idx, qs, k=5, tri_dict=None).collect()
    key = lambda r: (r["query_id"], r["rank"], r["doc_id"])  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))
    assert not [r for r in a if r["query_id"] == 3]  # no-match infix empty


def test_bigram_ce_edges_and_interpolation(spark):
    from embed_rerank_spark.operators.textstats import bigram_cross_entropy
    import math

    rows = [(1, "a b a b"), (2, "x"), (3, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_cross_entropy(docs, lam=0.7).collect()}
    # doc 2/3: fewer than 2 tokens -> no bigrams, ce pinned to 0
    assert got[2]["n_bigrams"] == 0 and got[2]["ce"] == 0.0
    assert got[3]["n_bigrams"] == 0 and got[3]["ce"] == 0.0
    # doc 1: grams ab, ba, ab; unigrams: a x2? a appears 2, b 2, x 1; C=5
    # p(b|a) = .7*2/2 + .3*2/5 ; p(a|b) = .7*1/2 + .3*2/5
    p_ab = 0.7 * 2 / 2 + (1.0 - 0.7) * 2 / 5
    p_ba = 0.7 * 1 / 2 + (1.0 - 0.7) * 2 / 5
    want = -(2 * math.log(p_ab) + 1 * math.log(p_ba)) / 3
    assert got[1]["n_bigrams"] == 3
    assert abs(got[1]["ce"] - round(want, 6)) < 1e-6


def test_hit_counts_includes_zero_match_queries(spark):
    from embed_rerank_spark.operators.bm25 import hit_counts

    docs = spark.createDataFrame(
        [(1, "apple pie"), (2, "apple tart"), (3, "banana")],
        "doc_id long, text string",
    )
    got = {r["query_id"]: r["total_hits"] for r in
           hit_counts(spark, docs, [(1, "apple banana"), (2, "zzz")]).collect()}
    assert got == {1: 3, 2: 0}


def test_boosting_demotes_without_excluding(spark):
    """ES boosting query: a negative match is demoted by exactly
    negative_boost but never dropped; non-matching docs keep their
    positive score; an OOV negative is a no-op."""
    from embed_rerank_spark.operators.bm25 import boosting_topk_bruteforce

    rows = [
        (1, "apple pie recipe"),
        (2, "apple apple orchard"),
        (3, "apple banana smoothie"),
        (4, "pear tart"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qs = [(1, "apple", "banana"), (2, "apple", "zyzzyva")]
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in boosting_topk_bruteforce(spark, docs, qs, k=10, negative_boost=0.5).collect()
    }
    base = {
        r["doc_id"]: r["score"]
        for r in bm25_scores_bruteforce(docs, query_terms(spark, [(1, "apple")])).collect()
    }
    # q1: doc 3 matches the negative term -> exactly half its base score
    assert abs(got[(1, 3)] - 0.5 * base[3]) < 1e-12
    assert abs(got[(1, 1)] - base[1]) < 1e-12
    assert abs(got[(1, 2)] - base[2]) < 1e-12
    # demoted, not excluded: doc 3 still present for q1
    assert (1, 3) in got
    # q2: OOV negative is a no-op — scores equal the positive baseline
    for d in (1, 2, 3):
        assert abs(got[(2, d)] - base[d]) < 1e-12
    # no query retrieves the positive-non-matching doc 4
    assert (1, 4) not in got and (2, 4) not in got


def test_rank_feature_saturation_and_log(spark):
    """rank_feature == base BM25 + boost * S(f) per matching doc, for
    both saturation and log shapes; unsupported shapes raise."""
    import math

    import pytest

    from embed_rerank_spark.operators.bm25 import rank_feature_topk

    rows = [(1, "apple pie", 100), (2, "apple tart", 400), (3, "pear", 50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    base = {
        r["doc_id"]: r["score"]
        for r in bm25_scores_bruteforce(docs, query_terms(spark, [(1, "apple")])).collect()
    }
    sat = {
        r["doc_id"]: r["score"]
        for r in rank_feature_topk(
            spark, docs, [(1, "apple")], "n_chars", pivot=200.0, boost=2.0
        ).collect()
    }
    assert abs(sat[1] - (base[1] + 2.0 * 100 / 300)) < 1e-12
    assert abs(sat[2] - (base[2] + 2.0 * 400 / 600)) < 1e-12
    assert 3 not in sat  # rank_feature never matches on its own
    lg = {
        r["doc_id"]: r["score"]
        for r in rank_feature_topk(
            spark, docs, [(1, "apple")], "n_chars",
            function="log", scaling_factor=1.0, boost=0.1,
        ).collect()
    }
    assert abs(lg[1] - (base[1] + 0.1 * math.log(101))) < 1e-12
    with pytest.raises(ValueError):
        rank_feature_topk(spark, docs, [(1, "apple")], "n_chars", function="sigmoid")


def test_boosting_and_rank_feature_reject_unsound_knobs(spark):
    """negative_boost outside [0,1] and non-positive pivot/scaling
    would invert pruning bounds — rejected like ES rejects them."""
    import pytest

    from embed_rerank_spark.operators.bm25 import (
        boosting_topk_bruteforce,
        rank_feature_topk,
    )

    docs = spark.createDataFrame([(1, "apple")], "doc_id long, text string")
    with pytest.raises(ValueError):
        boosting_topk_bruteforce(spark, docs, [(1, "apple", "pie")], negative_boost=1.5)
    with pytest.raises(ValueError):
        boosting_topk_bruteforce(spark, docs, [(1, "apple", "pie")], negative_boost=-0.1)
    with pytest.raises(ValueError):
        rank_feature_topk(spark, docs, [(1, "apple")], "doc_id", pivot=0.0)
    with pytest.raises(ValueError):
        rank_feature_topk(spark, docs, [(1, "apple")], "doc_id", boost=-1.0)
    with pytest.raises(ValueError):
        rank_feature_topk(
            spark, docs, [(1, "apple")], "doc_id", function="log", scaling_factor=0.0
        )


def test_distance_feature_boosts_near_origin(spark):
    import pytest as _pytest

    from embed_rerank_spark.operators.bm25 import distance_feature_topk

    # equal BM25 for both docs (same text); n_chars decides the order
    rows = [(1, "apple pie", 100), (2, "apple pie", 500)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    out = distance_feature_topk(
        spark, docs, [(1, "apple")], field="n_chars",
        origin=100.0, pivot=10.0, boost=2.0, k=2,
    ).collect()
    assert [r["doc_id"] for r in out] == [1, 2]
    # doc 1 at distance 0 gets the full boost; doc 2 gets 2*10/410
    assert out[0]["score"] - out[1]["score"] == _pytest.approx(
        2.0 - 2.0 * 10.0 / 410.0, rel=1e-9
    )
    # flipping the origin flips the order
    flipped = distance_feature_topk(
        spark, docs, [(1, "apple")], field="n_chars",
        origin=500.0, pivot=10.0, boost=2.0, k=2,
    ).collect()
    assert [r["doc_id"] for r in flipped] == [2, 1]
    with _pytest.raises(ValueError):
        distance_feature_topk(
            spark, docs, [(1, "apple")], field="n_chars",
            origin=0.0, pivot=0.0,
        )


def test_bm25f_full_title_not_punished_by_body_length(spark):
    from embed_rerank_spark.operators.bm25 import (
        bm25f_full_topk,
        bm25f_topk_bruteforce,
    )

    # query term only in the (identical) titles; doc 2 drags a much
    # longer body. Per-field norm: title contribution identical ->
    # rounded scores tie. Shared norm: doc 2 is punished.
    title = "zebra news daily report front page top stories"  # 8 tokens
    rows = [
        (1, title + " short body here"),
        (2, title + " " + " ".join(f"w{i}" for i in range(200))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = bm25f_full_topk(spark, docs, [(1, "zebra")], k=2).collect()
    assert [r["doc_id"] for r in full] == [1, 2]
    assert round(full[0]["score"], 6) == round(full[1]["score"], 6)
    shared = bm25f_topk_bruteforce(spark, docs, [(1, "zebra")], k=2).collect()
    assert round(shared[0]["score"], 6) != round(shared[1]["score"], 6)
