"""Faceted search and more-like-this: facet counts must equal the
distinct matched-doc counts implied by the brute-force scorer, and MLT
retrieval must equal disjunctive brute-force BM25 over its own selected
terms with the seed excluded."""

from __future__ import annotations

from collections import Counter

import pytest

from embed_rerank_spark.operators.bm25 import (
    bm25_scores_bruteforce,
    bm25_topk_bruteforce,
    query_terms,
)
from pyspark.sql import functions as F
from embed_rerank_spark.operators.facets import facet_counts
from embed_rerank_spark.operators.mlt import mlt_select_terms, more_like_this
from embed_rerank_spark.operators.postings import InvertedIndex, build_postings
from embed_rerank_spark.queryset import QUERY_SET

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def index(spark, docs):
    built = build_postings(docs, n_shards=4)
    cs = built["corpus_stats"].collect()[0]
    return InvertedIndex(
        postings=built["postings"],
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
    )


def test_facet_counts_match_bruteforce_match_set(spark, docs):
    """n_docs per (query, facet) == distinct docs the brute-force
    scorer scores for that query, bucketed by the facet column."""
    qt = query_terms(spark, QUERY_SET)
    scored = bm25_scores_bruteforce(docs, qt).select("query_id", "doc_id").collect()
    langs = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    want = Counter((r["query_id"], langs[r["doc_id"]]) for r in scored)

    got = facet_counts(spark, docs, QUERY_SET, facet_col="lang").collect()
    got_map = {(r["query_id"], r["facet_value"]): r["n_docs"] for r in got}
    assert got_map == dict(want)
    assert got_map, "facet fixture produced no matches"


def test_facet_top_n_cap_and_tie_order(spark, docs):
    got = facet_counts(spark, docs, QUERY_SET, facet_col="source", top_n=3).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["facet_rank"], r["n_docs"], r["facet_value"])
        )
    full = {
        (r["query_id"], r["facet_value"]): r["n_docs"]
        for r in facet_counts(spark, docs, QUERY_SET, facet_col="source").collect()
    }
    for q, rows in by_q.items():
        rows.sort()
        assert len(rows) <= 3
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        # engine tie order: count desc, value asc — the kept set must be
        # the head of the full per-query facet list under that order
        all_q = sorted(
            ((v, fv) for (qq, fv), v in full.items() if qq == q),
            key=lambda t: (-t[0], t[1]),
        )
        assert [(n, v) for _rk, n, v in rows] == all_q[: len(rows)]


def test_mlt_matches_bruteforce_over_selected_terms(spark, docs, index):
    seeds = [r["doc_id"] for r in docs.limit(3).collect()]
    selected = mlt_select_terms(docs, seeds, max_query_terms=10, min_term_freq=1)
    assert any(selected.values())
    got = more_like_this(index, docs, seeds, k=5, max_query_terms=10)
    got_rows = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in got.collect()
    )
    want_rows = []
    for sid, terms in selected.items():
        if not terms:
            continue
        bf = bm25_topk_bruteforce(spark, docs, [(sid, " ".join(terms))], k=6)
        kept = [r for r in bf.collect() if r["doc_id"] != sid]
        kept.sort(key=lambda r: (-round(r["score"], 6), r["doc_id"]))
        for i, r in enumerate(kept[:5], start=1):
            want_rows.append((sid, i, r["doc_id"], round(r["score"], 6)))
    assert got_rows == sorted(want_rows)
    # the seed itself never appears in its own result list
    assert all(q != d for q, _r, d, _s in got_rows)


def test_mlt_term_selection_knobs(spark, docs):
    seeds = [docs.first()["doc_id"]]
    loose = mlt_select_terms(docs, seeds, max_query_terms=100, min_term_freq=1)
    tight_tf = mlt_select_terms(docs, seeds, max_query_terms=100, min_term_freq=2)
    tight_df = mlt_select_terms(docs, seeds, max_query_terms=100, min_doc_freq=10)
    capped = mlt_select_terms(docs, seeds, max_query_terms=3)
    sid = seeds[0]
    assert set(tight_tf[sid]) <= set(loose[sid])
    assert set(tight_df[sid]) <= set(loose[sid])
    assert len(capped[sid]) <= 3
    # cap keeps the interestingness-order head of the loose selection
    assert capped[sid] == loose[sid][: len(capped[sid])]


def test_stats_facets_values(spark):
    from embed_rerank_spark.operators.facets import stats_facets

    rows = [
        (1, "scan fast", 10, "a"),
        (2, "scan slow", 20, "a"),
        (3, "other text", 30, "b"),
        (4, "scan again", 40, "b"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long, source string"
    )
    got = {
        r["query_id"]: r
        for r in stats_facets(
            spark, docs, [(1, "scan"), (2, "zyzzyva")], "n_chars",
            cardinality_col="source",
        ).collect()
    }
    r = got[1]
    assert (r["n_docs"], r["min_v"], r["max_v"], r["sum_v"]) == (3, 10, 40, 70)
    assert abs(r["avg_v"] - 70 / 3) < 1e-9
    assert r["n_distinct"] == 2
    assert 2 not in got  # no matches -> no row (facet convention)


def test_date_histogram_weekly_buckets(spark, docs):
    """date_histogram == Python recount: distinct matched docs per
    ISO-Monday week of the derived warc_ts doc-value."""
    from datetime import date, timedelta

    from pyspark.sql import functions as F

    from embed_rerank_spark.operators.facets import date_histogram

    docs_ts = docs.withColumn(
        "warc_ts",
        F.to_timestamp(
            F.date_add(F.lit("2024-01-01").cast("date"), (F.col("n_chars") % 365).cast("int"))
        ),
    )
    qs = QUERY_SET[:3]
    qt = query_terms(spark, qs)
    matched = {
        (r["query_id"], r["doc_id"])
        for r in bm25_scores_bruteforce(docs, qt).select("query_id", "doc_id").collect()
    }
    chars = {r["doc_id"]: r["n_chars"] for r in docs.select("doc_id", "n_chars").collect()}
    epoch = date(2024, 1, 1)
    want = Counter()
    for qid, did in matched:
        d = epoch + timedelta(days=int(chars[did]) % 365)
        monday = d - timedelta(days=d.weekday())
        want[(qid, monday.isoformat())] += 1
    got = {
        (r["query_id"], r["bucket_start"]): r["n_docs"]
        for r in date_histogram(spark, docs_ts, qs, "warc_ts", interval="week").collect()
    }
    assert got == dict(want)
    assert all(n >= 1 for n in got.values())  # min_doc_count=1: no empty buckets


def test_top_hits_by_bucket_ranks_and_caps(spark, docs):
    """top_hits == Python re-rank of the brute-force scores: buckets by
    count desc/value asc, hits by rounded-score desc/doc_id asc, both
    caps respected."""
    from embed_rerank_spark.operators.facets import top_hits_by_bucket

    qs = QUERY_SET[:3]
    qt = query_terms(spark, qs)
    scored = bm25_scores_bruteforce(docs, qt).collect()
    langs = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    by_q: dict[int, list] = {}
    for r in scored:
        by_q.setdefault(r["query_id"], []).append((langs[r["doc_id"]], r["doc_id"], r["score"]))
    want = {}
    for qid, rows in by_q.items():
        counts = Counter(lang for lang, _, _ in rows)
        branks = {
            lang: i + 1
            for i, (lang, _) in enumerate(
                sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            )
        }
        for lang in counts:
            if branks[lang] > 2:
                continue
            hits = sorted(
                ((d, s) for lg, d, s in rows if lg == lang),
                key=lambda ds: (-round(ds[1], 6), ds[0]),
            )[:2]
            for hrank, (did, _) in enumerate(hits, 1):
                want[(qid, lang, hrank)] = (branks[lang], did)
    out = top_hits_by_bucket(spark, docs, qs, "lang", k_hits=2, top_buckets=2).collect()
    got = {
        (r["query_id"], r["facet_value"], r["hit_rank"]): (r["bucket_rank"], r["doc_id"])
        for r in out
    }
    assert got == want


def test_percentiles_exact_linear_interpolation(spark, docs):
    """percentiles_facets == numpy.percentile (linear / R-7) over the
    matched docs' n_chars."""
    import numpy as np

    from embed_rerank_spark.operators.facets import percentiles_facets

    qs = QUERY_SET[:2]
    qt = query_terms(spark, qs)
    matched = bm25_scores_bruteforce(docs, qt).select("query_id", "doc_id").collect()
    chars = {r["doc_id"]: r["n_chars"] for r in docs.select("doc_id", "n_chars").collect()}
    vals: dict[int, list[float]] = {}
    for r in matched:
        vals.setdefault(r["query_id"], []).append(float(chars[r["doc_id"]]))
    pcts = [0.1, 0.5, 0.99]
    got = {
        (r["query_id"], r["pct"]): r["value"]
        for r in percentiles_facets(spark, docs, qs, "n_chars", pcts).collect()
    }
    for qid, vs in vals.items():
        for p in pcts:
            want = float(np.percentile(np.array(vs), p * 100, method="linear"))
            assert abs(got[(qid, p)] - want) < 1e-9, (qid, p)


def test_composite_agg_page_walk_reconstructs_all_buckets(spark, docs):
    """Walking composite pages with after = the previous page's last
    key reproduces every (query, key1, key2) bucket exactly once, in
    composite-key order, with counts equal to the one-shot facet
    group-by — the ES after_key pagination contract."""
    from embed_rerank_spark.operators.facets import composite_agg

    queries = QUERY_SET[:3]
    full = composite_agg(
        spark, docs, queries, ("lang", "source"), page_size=10_000
    ).collect()
    want = {}
    for r in full:
        want.setdefault(r["query_id"], []).append((r["key1"], r["key2"], r["n_docs"]))

    page = 5
    got: dict[int, list] = {}
    after = None
    for _ in range(100):
        rows = composite_agg(
            spark, docs, queries, ("lang", "source"), page_size=page, after=after
        ).collect()
        if not rows:
            break
        for r in sorted(rows, key=lambda r: (r["query_id"], r["bucket_rank"])):
            assert 1 <= r["bucket_rank"] <= page
            got.setdefault(r["query_id"], []).append(
                (r["key1"], r["key2"], r["n_docs"])
            )
        # global after-key: the smallest last-key across queries still
        # in flight guarantees no bucket is skipped; dedupe handles the
        # overlap a per-query walker would not produce.
        last = min(
            (rs[-1]["key1"], rs[-1]["key2"])
            for rs in [
                sorted(
                    [r for r in rows if r["query_id"] == q], key=lambda r: r["bucket_rank"]
                )
                for q in {r["query_id"] for r in rows}
            ]
        )
        after = last
    for q, buckets in want.items():
        seen = []
        for b in got.get(q, []):
            if b not in seen:
                seen.append(b)
        assert seen == buckets, f"query {q}: page walk diverged"


def test_composite_agg_after_key_is_strict(spark, docs):
    """Buckets equal to the after key are excluded; only strictly
    greater composite keys appear."""
    from embed_rerank_spark.operators.facets import composite_agg

    queries = QUERY_SET[:2]
    after = ("en", "src12")
    rows = composite_agg(
        spark, docs, queries, ("lang", "source"), page_size=50, after=after
    ).collect()
    assert rows
    for r in rows:
        assert (r["key1"], r["key2"]) > after


def test_approx_stats_error_bounds(spark):
    """The sketch forms track the exact aggregations within their
    published bounds: HLL++ n_distinct within 3*rsd relative error,
    percentile_approx within the rank-error window of the exact
    percentile (here: exact at accuracy >> n, loose band at small
    accuracy)."""
    from embed_rerank_spark.operators.facets import (
        approx_stats_facets,
        percentiles_facets,
        stats_facets,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    queries = [(0, "data"), (1, "scan table")]
    pcts = [0.25, 0.5, 0.9]

    exact = {
        r.query_id: r
        for r in stats_facets(
            spark, docs, queries, value_col="n_chars", cardinality_col="source"
        ).collect()
    }
    exact_p = {
        (r.query_id, r.pct): r.value
        for r in percentiles_facets(
            spark, docs, queries, value_col="n_chars", percentiles=pcts
        ).collect()
    }
    approx = {
        r.query_id: r
        for r in approx_stats_facets(
            spark,
            docs,
            queries,
            value_col="n_chars",
            cardinality_col="source",
            percentiles=pcts,
            rsd=0.05,
            accuracy=10000,
        ).collect()
    }
    assert set(approx) == set(exact)
    for qid, r in approx.items():
        assert r.n_docs == exact[qid].n_docs  # count is exact either way
        nd = exact[qid].n_distinct
        assert abs(r.n_distinct_approx - nd) <= max(1, 3 * 0.05 * nd)
        for p, got in zip(pcts, r.pcts):
            want = exact_p[(qid, p)]
            # accuracy=10000 >> n: rank error < 1 -> an exact order
            # statistic; linear interpolation differs by < one step
            lo, hi = want * 0.9 - 1, want * 1.1 + 1
            assert lo <= got <= hi, (qid, p, got, want)


def test_adjacency_matrix_buckets(spark):
    from embed_rerank_spark.operators.facets import adjacency_matrix

    docs = spark.createDataFrame(
        [
            (1, "gpu python fast"),
            (2, "gpu slow"),
            (3, "python gpu gpu"),
            (4, "rust only"),
            (5, "python rust"),
        ],
        "doc_id long, text string",
    )
    filters = [("gpu", "gpu"), ("py", "python"), ("rs", "rust")]
    got = {r.key: r.n_docs for r in adjacency_matrix(spark, docs, filters).collect()}
    assert got == {
        "gpu": 3,
        "py": 3,
        "rs": 2,
        "gpu&py": 2,   # docs 1, 3 (tf>1 collapses to one membership)
        "py&rs": 1,    # doc 5
        # gpu&rs absent: empty intersection (min_doc_count=1)
    }


def test_histogram_facets_bucket_rule(spark):
    from embed_rerank_spark.operators.facets import histogram_facets

    docs = spark.createDataFrame(
        [
            (1, "scan", 50),
            (2, "scan", 199),
            (3, "scan", 200),
            (4, "scan", 450),
            (5, "other", 450),
        ],
        "doc_id long, text string, n_chars long",
    )
    got = {
        (r.query_id, r.bucket_lo): r.n_docs
        for r in histogram_facets(spark, docs, [(0, "scan")], "n_chars", 200.0).collect()
    }
    assert got == {(0, 0.0): 2, (0, 200.0): 1, (0, 400.0): 1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        histogram_facets(spark, docs, [(0, "scan")], "n_chars", 0)


def test_pinned_topk_order(spark):
    from embed_rerank_spark.operators.facets import pinned_topk

    docs = spark.createDataFrame(
        [
            (1, "scan scan scan"),
            (2, "scan scan"),
            (3, "scan"),
            (4, "nothing here"),
        ],
        "doc_id long, text string",
    )
    q = [(0, "scan")]
    out = sorted(
        (r.rank, r.doc_id, r.pinned) for r in
        pinned_topk(spark, docs, q, [(0, [3, 4])], k=4).collect()
    )
    # pins first in listed order (4 never matches organically but IS
    # returned), then organic by score with pinned docs deduped
    assert out == [(1, 3, True), (2, 4, True), (3, 1, False), (4, 2, False)]


def test_pipeline_aggs_semantics(spark):
    """Hand-built corpus: derivative/cumsum/moving-avg computed over
    non-empty buckets in order, bucket_selector applied AFTER the
    pipeline metrics (a surviving bucket keeps its true derivative)."""
    from pyspark.sql import functions as F

    from embed_rerank_spark.operators.facets import pipeline_aggs

    rows = [
        # week of 2024-01-01: 1 matching doc; week of 01-08: 3 docs;
        # week of 01-15 has only a NON-matching doc (gap: skip);
        # week of 01-22: 2 docs.
        (0, "apple pie", "2024-01-01", 10),
        (1, "apple tart", "2024-01-08", 20),
        (2, "apple cake", "2024-01-09", 30),
        (3, "apple jam", "2024-01-10", 40),
        (4, "banana bread", "2024-01-15", 50),
        (5, "apple cider", "2024-01-22", 60),
        (6, "apple sauce", "2024-01-23", 70),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, day string, n_chars long"
    ).withColumn("warc_ts", F.to_timestamp("day"))
    out = pipeline_aggs(
        spark,
        docs,
        [(1, "apple")],
        "warc_ts",
        interval="week",
        moving_window=2,
        min_doc_count=2,
    ).orderBy("bucket_start").collect()
    # min_doc_count=2 drops the 1-doc first bucket AFTER metrics ran
    assert [r.bucket_start for r in out] == ["2024-01-08", "2024-01-22"]
    b2, b4 = out
    assert (b2.n_docs, b2.cum_docs, b2.deriv_docs) == (3, 4, 2)
    assert b2.moving_avg_docs == 2.0  # trailing-2 window: (1 + 3) / 2
    assert b2.metric_per_doc == 30.0  # (20 + 30 + 40) / 3
    # gap week (no matching docs) is skipped: derivative vs 01-08
    assert (b4.n_docs, b4.cum_docs, b4.deriv_docs) == (2, 6, -1)
    assert b4.moving_avg_docs == 2.5  # (3 + 2) / 2
    with pytest.raises(ValueError):
        pipeline_aggs(spark, docs, [(1, "apple")], "warc_ts", moving_window=0)


def test_rare_terms_semantics(spark):
    """Query terms excluded, threshold respected, rarest-first order."""
    from embed_rerank_spark.operators.facets import rare_terms

    docs = spark.createDataFrame(
        [
            (0, "apple unique0 shared"),
            (1, "apple unique1 shared"),
            (2, "apple shared common"),
            (3, "pear common"),
        ],
        "doc_id long, text string",
    )
    out = [
        (r.term, r.n_docs, r.term_rank)
        for r in rare_terms(spark, docs, [(1, "apple")], max_doc_count=2)
        .orderBy("term_rank")
        .collect()
    ]
    # match set = docs 0,1,2; 'apple' excluded (query term); 'shared'
    # df=3 > 2 excluded; rarest first, ties term asc
    assert out == [
        ("common", 1, 1), ("unique0", 1, 2), ("unique1", 1, 3),
    ]
    # field mode: bucket a keyword column instead of analyzed text
    from pyspark.sql import functions as F

    docs_f = docs.withColumn("grp", (F.col("doc_id") % 2).cast("string"))
    out_f = [
        (r.term, r.n_docs)
        for r in rare_terms(
            spark, docs_f, [(1, "apple")], bucket_col="grp", max_doc_count=1
        ).collect()
    ]
    # matched docs 0,1,2 -> grp 0:2 docs (excluded), grp 1:1 doc
    assert out_f == [("1", 1)]


def test_multi_terms_order(spark):
    from embed_rerank_spark.operators.facets import multi_terms

    docs = spark.createDataFrame(
        [
            (0, "apple", "en", "web"),
            (1, "apple", "en", "web"),
            (2, "apple", "de", "web"),
            (3, "apple", "en", "news"),
            (4, "pear", "fr", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = [
        (r.key1, r.key2, r.n_docs, r.bucket_rank)
        for r in multi_terms(spark, docs, [(1, "apple")], ("lang", "source"))
        .orderBy("bucket_rank")
        .collect()
    ]
    assert out == [
        ("en", "web", 2, 1), ("de", "web", 1, 2), ("en", "news", 1, 3),
    ]


def test_approx_terms_error_bound_semantics(spark):
    """Sharded terms agg: with shard_size large enough the merge is
    exact with zero error (every shard exhausted); with a tight
    shard_size each term's true undercount is within error_ub."""
    from embed_rerank_spark.operators.facets import approx_terms

    rows = []
    did = 0
    # 40 docs, keyword field: 'a' x 18, 'b' x 12, 'c' x 6, d0..d3 x 1
    for val, n in [("a", 18), ("b", 12), ("c", 6)] + [
        (f"d{i}", 1) for i in range(4)
    ]:
        for _ in range(n):
            rows.append((did, val))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, kw string")

    exact = approx_terms(
        docs, bucket_col="kw", size=10, shard_size=100, n_shards=4
    ).collect()
    truth = {"a": 18, "b": 12, "c": 6, "d0": 1, "d1": 1, "d2": 1, "d3": 1}
    got = {r["term"]: r for r in exact}
    assert {t: r["doc_count"] for t, r in got.items()} == truth
    assert all(r["error_ub"] == 0 for r in exact)  # all shards exhausted
    assert all(r["sum_other"] == 0 for r in exact)  # top-10 covers all 7

    # tight: each shard reports only its single top bucket
    approx = approx_terms(
        docs, bucket_col="kw", size=3, shard_size=1, n_shards=4
    ).collect()
    by_term = {r["term"]: r for r in approx}
    for t, r in by_term.items():
        assert r["doc_count"] <= truth[t]
        assert truth[t] - r["doc_count"] <= r["error_ub"]
    # sum_other accounts for every bucket row not in the returned set
    total = sum(truth.values())
    for r in approx:
        assert r["sum_other"] == total - sum(
            x["doc_count"] for x in approx
        )


def test_approx_terms_analyzed_text_path(spark):
    from embed_rerank_spark.operators.facets import approx_terms

    docs = spark.createDataFrame(
        [(i, "alpha beta " + ("gamma" if i % 2 else "delta")) for i in range(10)],
        "doc_id long, text string",
    )
    out = approx_terms(docs, size=4, shard_size=10, n_shards=2).collect()
    got = {r["term"]: r["doc_count"] for r in out}
    assert got["alpha"] == 10 and got["beta"] == 10
    assert got["gamma"] == 5 and got["delta"] == 5


def test_auto_date_histogram_picks_finest_fitting_interval(spark):
    from embed_rerank_spark.operators.facets import auto_date_histogram

    # 30 docs on 30 consecutive days: day -> 30 buckets, week -> 5,
    # month -> 1. target=6 must choose week.
    rows = [
        (i, "apple pie", f"2024-01-{i + 1:02d} 00:00:00") for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, s string").select(
        "doc_id", "text", F.to_timestamp("s").alias("warc_ts")
    )
    out = auto_date_histogram(
        spark, docs, [(1, "apple")], "warc_ts", target_buckets=6
    ).collect()
    assert {r["interval"] for r in out} == {"week"}
    assert len(out) == 5
    assert sum(r["n_docs"] for r in out) == 30
    # a generous target picks day (the finest)
    fine = auto_date_histogram(
        spark, docs, [(1, "apple")], "warc_ts", target_buckets=50
    ).collect()
    assert {r["interval"] for r in fine} == {"day"}
    assert len(fine) == 30


def test_auto_date_histogram_year_fallback(spark):
    from embed_rerank_spark.operators.facets import auto_date_histogram

    # 3 docs in 3 different years; target=1 fits nothing, falls back
    # to year (the coarsest) with 3 buckets
    rows = [(i, "apple pie", f"{2020 + i}-06-01 00:00:00") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, s string").select(
        "doc_id", "text", F.to_timestamp("s").alias("warc_ts")
    )
    out = auto_date_histogram(
        spark, docs, [(1, "apple")], "warc_ts", target_buckets=1
    ).collect()
    assert {r["interval"] for r in out} == {"year"}
    assert len(out) == 3


def test_filters_facets_overlap_other_and_zero_buckets(spark):
    """ES filters-agg semantics: buckets OVERLAP (a doc counts in every
    predicate it satisfies), every named bucket is present even at
    count 0, and _other_ counts docs matching no predicate."""
    from embed_rerank_spark.operators.facets import filters_facets

    rows = [
        # matching docs: 0 (en, 400 chars), 1 (de, 500), 2 (en, 100)
        (0, "apple pie", "en", 400),
        (1, "apple tart", "de", 500),
        (2, "apple cake", "en", 100),
        (3, "banana bread", "fr", 999),  # non-matching: never counted
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )
    out = filters_facets(
        spark,
        docs,
        [(1, "apple")],
        [
            ("english", "lang = 'en'"),
            ("long", "n_chars >= 300"),
            ("never", "n_chars < 0"),
        ],
    ).collect()
    got = {r["bucket"]: r["n_docs"] for r in out}
    # doc 0 is in BOTH english and long (overlap); doc 2 english only;
    # doc 1 long only; nothing matches 'never' but the bucket exists;
    # no matching doc escapes every predicate except none -> _other_ 0
    assert got == {"english": 2, "long": 2, "never": 0, "_other_": 0}
    # drop the 'long' bucket: doc 1 (de, 500) now matches nothing
    out2 = filters_facets(
        spark, docs, [(1, "apple")], [("english", "lang = 'en'")]
    ).collect()
    got2 = {r["bucket"]: r["n_docs"] for r in out2}
    assert got2 == {"english": 2, "_other_": 1}
    with pytest.raises(ValueError):
        filters_facets(spark, docs, [(1, "apple")], [])


def test_missing_and_global_facets(spark):
    from embed_rerank_spark.operators.facets import global_facets, missing_facets

    rows = [
        (0, "apple pie", "en", 100),
        (1, "apple tart", None, 200),
        (2, "apple cake", "de", 300),
        (3, "banana bread", None, 400),  # non-matching
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )
    m = missing_facets(spark, docs, [(1, "apple")], "lang").collect()
    assert [(r["n_missing"], r["n_present"]) for r in m] == [(1, 2)]

    g = global_facets(spark, docs, [(1, "apple")], value_col="n_chars").collect()
    assert len(g) == 1
    r = g[0]
    # scoped = docs 0,1,2; global escapes the query scope = all 4 docs
    assert (r["matched_docs"], r["matched_avg"]) == (3, 200.0)
    assert (r["global_docs"], r["global_avg"]) == (4, 250.0)


def test_serial_diff_and_bucket_sort(spark):
    """serial_diff lags over NON-EMPTY buckets in order (nulls while no
    predecessor); bucket_sort re-ranks by count and truncates AFTER the
    pipeline metric is computed."""
    from pyspark.sql import functions as F

    from embed_rerank_spark.operators.facets import serial_diff_topn

    rows = [
        (0, "apple pie", "2024-01-01"),
        (1, "apple tart", "2024-01-08"),
        (2, "apple cake", "2024-01-09"),
        (3, "apple jam", "2024-01-10"),
        (4, "apple cider", "2024-01-22"),
        (5, "apple sauce", "2024-01-23"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, day string"
    ).withColumn("warc_ts", F.to_timestamp("day"))
    # weekly counts in bucket order: 01-01 -> 1, 01-08 -> 3, 01-22 -> 2
    out = serial_diff_topn(
        spark, docs, [(1, "apple")], "warc_ts", lag=2, size=2, interval="week"
    ).collect()
    by_bucket = {r["bucket_start"]: r for r in out}
    # bucket_sort: top-2 by count desc, date asc -> 01-08 (3), 01-22 (2)
    assert set(by_bucket) == {"2024-01-08", "2024-01-22"}
    assert by_bucket["2024-01-08"]["sort_rank"] == 1
    assert by_bucket["2024-01-22"]["sort_rank"] == 2
    # serial_diff lag=2 computed BEFORE truncation: 01-22 diffs vs the
    # truncated-away 01-01 bucket (2 - 1); 01-08 has no lag-2 neighbor
    assert by_bucket["2024-01-08"]["serial_diff_docs"] is None
    assert by_bucket["2024-01-22"]["serial_diff_docs"] == 1
    with pytest.raises(ValueError):
        serial_diff_topn(spark, docs, [(1, "apple")], "warc_ts", lag=0)


def test_sibling_bucket_stats_semantics(spark):
    """ES sibling pipeline aggs on a hand series [2, 1, 1]: sum/avg,
    population sigma, exact median, and min/max tie-key lists."""
    import datetime

    from embed_rerank_spark.operators.facets import sibling_bucket_stats

    docs = spark.createDataFrame(
        [
            (1, "apple pie", datetime.datetime(2024, 1, 2)),
            (2, "apple sauce", datetime.datetime(2024, 1, 3)),
            (3, "apple tart", datetime.datetime(2024, 1, 9)),
            (4, "apple core", datetime.datetime(2024, 1, 16)),
            (5, "banana split", datetime.datetime(2024, 1, 2)),
        ],
        "doc_id long, text string, ts timestamp",
    )
    rows = sibling_bucket_stats(
        spark, docs, [(1, "apple")], "ts", interval="week"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_buckets == 3 and r.sum_docs == 4
    assert r.max_docs == 2 and r.max_keys == "2024-01-01"
    # two buckets tie at the min: keys date-ascending, comma-joined
    assert r.min_docs == 1 and r.min_keys == "2024-01-08,2024-01-15"
    assert abs(r.avg_docs - 1.333333) < 1e-6
    assert abs(r.std_docs - 0.471405) < 1e-6  # population sigma of [2,1,1]
    assert r.median_docs == 1.0
    # no matches -> no rows (ES: empty parent histogram emits nothing)
    assert sibling_bucket_stats(
        spark, docs, [(2, "zyzzyva")], "ts", interval="week"
    ).count() == 0


def test_rate_histogram_calendar_divisors(spark):
    """ES rate agg: monthly buckets divide by THAT month's day count
    (leap February = 29), weekly buckets by 7; unsupported pairs
    raise."""
    import datetime

    import pytest as _pytest

    from embed_rerank_spark.operators.facets import rate_histogram

    docs = spark.createDataFrame(
        [
            (1, "apple pie", datetime.datetime(2024, 2, 10)),
            (2, "apple tart", datetime.datetime(2024, 2, 20)),
            (3, "apple core", datetime.datetime(2024, 3, 5)),
        ],
        "doc_id long, text string, ts timestamp",
    )
    rows = {
        r.bucket_start: r
        for r in rate_histogram(
            spark, docs, [(1, "apple")], "ts", interval="month", unit="day"
        ).collect()
    }
    feb, mar = rows["2024-02-01"], rows["2024-03-01"]
    assert feb.divisor == 29.0 and feb.n_docs == 2
    assert abs(feb.rate_docs - round(2 / 29, 6)) < 1e-9
    assert mar.divisor == 31.0 and abs(mar.rate_docs - round(1 / 31, 6)) < 1e-9
    wk = rate_histogram(
        spark, docs, [(1, "apple")], "ts", interval="week", unit="day"
    ).collect()
    assert all(r.divisor == 7.0 for r in wk)
    with _pytest.raises(ValueError):
        rate_histogram(spark, docs, [(1, "apple")], "ts", interval="day", unit="hour")
