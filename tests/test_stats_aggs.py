"""Advanced metric aggregations (ES extended_stats / weighted_avg /
matrix_stats / t_test) pinned against direct NumPy computation on a
hand corpus — population-moment definitions throughout."""

from __future__ import annotations

import numpy as np
import pytest

from embed_rerank_spark.operators.facets import (
    extended_stats_facets,
    matrix_stats_facets,
    t_test_facets,
    weighted_avg_facets,
)

# value v and weight w per doc; all docs contain "x", docs 3-5 "y"
ROWS = [
    (1, "x a", 10.0, 2),
    (2, "x b", 25.0, 3),
    (3, "x y", 40.0, 4),
    (4, "x y c", 55.0, 5),
    (5, "x y y", 90.0, 6),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, text string, v double, w long"
    )


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_extended_stats_population_moments(spark, docs):
    r = _one(extended_stats_facets(spark, docs, [(1, "x")], "v", sigma=2.0))
    v = np.array([row[2] for row in ROWS])
    assert r["n_docs"] == 5
    assert r["avg_v"] == pytest.approx(v.mean())
    assert r["sum_of_squares"] == pytest.approx((v * v).sum())
    assert r["variance"] == pytest.approx(v.var())  # population
    assert r["std_deviation"] == pytest.approx(v.std())
    assert r["std_upper"] == pytest.approx(v.mean() + 2 * v.std())
    assert r["std_lower"] == pytest.approx(v.mean() - 2 * v.std())


def test_weighted_avg(spark, docs):
    r = _one(weighted_avg_facets(spark, docs, [(1, "y")], "v", "w"))
    sub = [(row[2], row[3]) for row in ROWS if "y" in row[1].split()]
    want = sum(v * w for v, w in sub) / sum(w for _v, w in sub)
    assert r["n_docs"] == 3
    assert r["weighted_avg"] == pytest.approx(want)


def test_matrix_stats_matches_numpy(spark, docs):
    r = _one(matrix_stats_facets(spark, docs, [(1, "x")], "v", "w"))
    x = np.array([row[2] for row in ROWS], dtype=float)
    y = np.array([row[3] for row in ROWS], dtype=float)

    def m(a, k):
        return ((a - a.mean()) ** k).mean()

    assert r["mean_x"] == pytest.approx(x.mean())
    assert r["var_y"] == pytest.approx(y.var())
    assert r["skew_x"] == pytest.approx(m(x, 3) / x.var() ** 1.5)
    assert r["kurt_x"] == pytest.approx(m(x, 4) / x.var() ** 2)
    cov = ((x - x.mean()) * (y - y.mean())).mean()
    assert r["covariance"] == pytest.approx(cov)
    assert r["correlation"] == pytest.approx(cov / (x.std() * y.std()))
    # w here is a perfect affine function of v on this corpus? it is
    # not -- but correlation must still be in [-1, 1]
    assert -1.0 <= r["correlation"] <= 1.0


def test_t_test_welch_and_small_population_null(spark, docs):
    out = {
        r["query_id"]: r
        for r in t_test_facets(
            spark, docs, [(1, "x", "y"), (2, "a", "y")], "v"
        ).collect()
    }
    xa = np.array([row[2] for row in ROWS], dtype=float)
    yb = np.array([row[2] for row in ROWS if "y" in row[1].split()], dtype=float)
    want = (xa.mean() - yb.mean()) / np.sqrt(
        xa.var(ddof=1) / len(xa) + yb.var(ddof=1) / len(yb)
    )
    r1 = out[1]
    assert (r1["n_a"], r1["n_b"]) == (5, 3)
    assert r1["t_stat"] == pytest.approx(want)
    # population "a" has a single doc: sample variance undefined -> NULL
    assert out[2]["t_stat"] is None


def test_ccnet_buckets_tercile_invariants(spark):
    from embed_rerank_spark.operators.textstats import ccnet_perplexity_buckets

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = ccnet_perplexity_buckets(docs).collect()
    assert len(out) == docs.count()
    by_lang: dict[str, dict[str, list[float]]] = {}
    for r in out:
        by_lang.setdefault(r["lang"], {}).setdefault(r["bucket"], []).append(r["ce"])
    for lang, buckets in by_lang.items():
        n = sum(len(v) for v in buckets.values())
        # tercile sizes within interpolation slack of n/3
        for name in ("head", "middle", "tail"):
            assert abs(len(buckets.get(name, [])) - n / 3) <= 2, (lang, name)
        # ce strictly ordered across buckets: head <= middle <= tail
        assert max(buckets["head"]) <= min(buckets["middle"])
        assert max(buckets["middle"]) <= min(buckets["tail"])


def test_percentile_ranks_exact(spark, docs):
    from embed_rerank_spark.operators.facets import percentile_ranks_facets

    out = {
        r["value"]: r["pct_rank"]
        for r in percentile_ranks_facets(
            spark, docs, [(1, "x")], "v", [10.0, 54.9, 95.0]
        ).collect()
    }
    # v = [10, 25, 40, 55, 90]
    assert out[10.0] == pytest.approx(20.0)
    assert out[54.9] == pytest.approx(60.0)
    assert out[95.0] == pytest.approx(100.0)


def test_mad_matches_numpy(spark, docs):
    from embed_rerank_spark.operators.facets import mad_facets

    r = _one(mad_facets(spark, docs, [(1, "x")], "v"))
    v = np.array([row[2] for row in ROWS])
    med = np.median(v)
    assert r["median_v"] == pytest.approx(med)
    assert r["mad"] == pytest.approx(np.median(np.abs(v - med)))


def test_gopher_rules_each_rule_fires(spark):
    from embed_rerank_spark.operators.textstats import gopher_quality_rules

    good = "the of " + "word " * 58          # 60 words, mwl ok, 2 stopwords
    short = "the of word"                     # too few words
    tiny_words = "the of " + "ab " * 58       # mean word len < 3
    numeric = "the of " + "1234 " * 58        # alpha fraction < 0.8
    no_stop = "word " * 60                    # no Gopher stopwords
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, tiny_words), (4, numeric), (5, no_stop)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality_rules(docs).collect()}
    assert out[1]["keep"] and out[1]["n_stopwords"] == 2
    assert not out[2]["pass_words"] and out[2]["pass_stopwords"]
    assert not out[3]["pass_word_len"] and out[3]["pass_words"]
    assert not out[4]["pass_alpha"]
    assert not out[5]["pass_stopwords"] and out[5]["pass_alpha"]
    for d in (2, 3, 4, 5):
        assert not out[d]["keep"]


def test_precision_and_err_pinned(spark):
    from embed_rerank_spark.functions.quality import err_at_k, precision_at_k, rank_eval

    ranking = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 20), (1, 3, 30)], "query_id long, rank int, doc_id long"
    )
    judgments = spark.createDataFrame(
        [(1, 10, 3), (1, 30, 1)], "query_id long, doc_id long, rel int"
    )
    p = precision_at_k(ranking, judgments, k=10).collect()[0]["precision"]
    assert p == pytest.approx(2.0 / 3.0)
    # p_i = (2^rel - 1)/8: [0.875, 0, 0.125]
    # ERR = 0.875/1 + 0 + 0.125 * (1 - 0.875) / 3
    err = err_at_k(ranking, judgments, k=10, max_rel=3).collect()[0]["err"]
    assert err == pytest.approx(0.875 + 0.125 * 0.125 / 3)
    # a universe query with zero retrieved rows scores 0 everywhere
    universe = spark.createDataFrame([(1,), (2,)], "query_id long")
    out = {r["query_id"]: r for r in
           rank_eval(ranking, judgments, k=10, queries=universe).collect()}
    assert out[2]["precision"] == 0.0 and out[2]["err"] == 0.0
    assert out[2]["ndcg"] == 0.0 and out[2]["recall"] == 0.0


def test_top_metrics_order_and_size(spark, docs):
    from embed_rerank_spark.operators.facets import top_metrics_facets

    out = top_metrics_facets(spark, docs, [(1, "x")], "v", ["w"], size=2).collect()
    got = [(r["mrank"], r["doc_id"], r["v_sort"], r["w"]) for r in sorted(out, key=lambda r: r["mrank"])]
    # v = [10,25,40,55,90] -> top 2 by v desc: docs 5 (90) then 4 (55)
    assert got == [(1, 5, 90.0, 6), (2, 4, 55.0, 5)]
    asc = top_metrics_facets(spark, docs, [(1, "x")], "v", ["w"], size=1, ascending=True).collect()
    assert (asc[0]["doc_id"], asc[0]["v_sort"]) == (1, 10.0)
