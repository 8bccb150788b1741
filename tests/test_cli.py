"""spark-submit entrypoint: build-index -> query -> rerank end-to-end.

Runs ``cli.main`` in-process (same code path spark-submit drives); the
WAND results must match the brute-force scorer over the same corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def workspace(spark, tmp_path_factory):
    from embed_rerank_spark.sources.pages import generate_pages

    d = tmp_path_factory.mktemp("cli")
    generate_pages(spark, 1200, seed=7, n_snapshots=2).write.mode("overwrite").parquet(
        str(d / "pages")
    )
    (d / "queries.tsv").write_text("0\tthe w12 w700\n1\tw55 w1000\n")
    return d


def test_cli_end_to_end(spark, workspace):
    # cli.main calls get_spark (returns the active session via
    # getOrCreate) and spark.stop() at the end — run all three
    # subcommands under one guard, then re-verify with a fresh handle
    import embed_rerank_spark.cli as cli

    d = workspace
    real_stop = type(spark).stop
    type(spark).stop = lambda self: None  # keep the shared test session
    try:
        assert cli.main([
            "build-index", "--pages", str(d / "pages"), "--index", str(d / "index"),
            "--shards", "4", "--max-concurrent", "2",
        ]) == 0
        assert cli.main([
            "query", "--index", str(d / "index"),
            "--queries", str(d / "queries.tsv"), "--out", str(d / "topk"), "--k", "5",
        ]) == 0
        assert cli.main([
            "rerank", "--index", str(d / "index"),
            "--corpus", str(d / "index" / "segments" / "*" / "extracted"),
            "--queries", str(d / "queries.tsv"), "--out", str(d / "rr"),
            "--k-candidates", "10", "--k", "5", "--method", "jaccard",
        ]) == 0
    finally:
        type(spark).stop = real_stop

    topk = spark.read.parquet(str(d / "topk"))
    # rare-term queries may match fewer than k docs in a 1200-page corpus
    assert topk.filter(F.col("query_id") == 0).count() == 5
    assert topk.count() >= 6
    assert set(topk.columns) == {"query_id", "rank", "doc_id", "score"}

    # WAND-from-CLI must equal brute force over the merged corpus
    from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce

    seg = str(d / "index" / "segments")
    corpus = spark.read.parquet(f"{seg}/*/extracted").filter(
        F.col("error").isNull()
    ).select("doc_id", "text")
    brute = bm25_topk_bruteforce(
        spark, corpus, [(0, "the w12 w700"), (1, "w55 w1000")], k=5
    )
    got = {(r.query_id, r.rank, r.doc_id) for r in topk.collect()}
    want = {(r.query_id, r.rank, r.doc_id) for r in brute.collect()}
    assert got == want

    rr = spark.read.parquet(str(d / "rr"))
    assert rr.count() == topk.count()  # full corpus: every candidate has text


def test_cli_compact_and_tiered_query(spark, workspace):
    """compact + query --tiered drive the LSM path from the CLI; the
    tiered answer must equal the merged-index answer."""
    import embed_rerank_spark.cli as cli

    d = workspace
    real_stop = type(spark).stop
    type(spark).stop = lambda self: None
    try:
        assert cli.main([
            "compact", "--index", str(d / "index"), "--fanout", "2",
        ]) == 0
        assert cli.main([
            "query", "--index", str(d / "index"), "--tiered",
            "--queries", str(d / "queries.tsv"), "--out", str(d / "topk_tiered"),
            "--k", "5",
        ]) == 0
    finally:
        type(spark).stop = real_stop

    merged = {
        (r.query_id, r.rank, r.doc_id, round(r.score, 6))
        for r in spark.read.parquet(str(d / "topk")).collect()
    }
    tiered = {
        (r.query_id, r.rank, r.doc_id, round(r.score, 6))
        for r in spark.read.parquet(str(d / "topk_tiered")).collect()
    }
    assert merged == tiered and len(tiered) > 0


def test_cli_new_query_modes_and_delete(spark, workspace, tmp_path):
    """and/phrase query modes, positional build, and tombstone deletes
    through the spark-submit surface."""
    import embed_rerank_spark.cli as cli

    d = workspace
    (d / "phrases.tsv").write_text("0\tthe w12\n")
    real_stop = type(spark).stop
    type(spark).stop = lambda self: None
    try:
        assert cli.main([
            "query", "--index", str(d / "index"), "--mode", "and",
            "--queries", str(d / "queries.tsv"), "--out", str(d / "andk"), "--k", "5",
        ]) == 0
        assert cli.main([
            "build-positional-index",
            "--corpus", str(d / "index" / "segments" / "*" / "extracted"),
            "--index", str(d / "posidx"), "--shards", "4",
        ]) == 0
        assert cli.main([
            "query", "--index", str(d / "posidx"), "--mode", "phrase",
            "--queries", str(d / "phrases.tsv"), "--out", str(d / "ph"), "--k", "5",
        ]) == 0
        # delete the top doc and re-query: it must disappear
        top = spark.read.parquet(str(d / "topk")).filter(
            "query_id = 0 and rank = 1"
        ).collect()[0]["doc_id"]
        (d / "dead.txt").write_text(f"{top}\n")
        assert cli.main([
            "delete", "--index", str(d / "index"), "--doc-ids", str(d / "dead.txt"),
        ]) == 0
        assert cli.main([
            "query", "--index", str(d / "index"),
            "--queries", str(d / "queries.tsv"), "--out", str(d / "topk2"), "--k", "5",
        ]) == 0
    finally:
        type(spark).stop = real_stop

    andk = spark.read.parquet(str(d / "andk"))
    assert andk.count() > 0
    ph = spark.read.parquet(str(d / "ph"))
    assert set(ph.columns) == {"query_id", "rank", "doc_id", "score", "first_pos"}
    topk2 = spark.read.parquet(str(d / "topk2"))
    assert top not in {r["doc_id"] for r in topk2.collect()}


def test_cli_msm_facets_mlt(spark, workspace):
    """msm / facets / mlt subcommands end-to-end (runs after the e2e
    test in this module, so d/index already exists)."""
    import embed_rerank_spark.cli as cli

    d = workspace
    real_stop = type(spark).stop
    type(spark).stop = lambda self: None
    try:
        assert cli.main([
            "query", "--index", str(d / "index"),
            "--queries", str(d / "queries.tsv"), "--out", str(d / "msmk"),
            "--k", "5", "--min-should-match", "2",
        ]) == 0
        assert cli.main([
            "facets", "--corpus", "/root/testdata/sf0.001/documents.parquet",
            "--queries", str(d / "queries.tsv"), "--out", str(d / "fc"),
            "--facet-col", "lang", "--top-n", "3",
        ]) == 0
        corpus = str(d / "index" / "segments" / "*" / "extracted")
        seed = spark.read.parquet(corpus).first()["doc_id"]
        (d / "seeds.txt").write_text(f"{seed}\n")
        assert cli.main([
            "mlt", "--index", str(d / "index"), "--corpus", corpus,
            "--seed-ids", str(d / "seeds.txt"), "--out", str(d / "mlt"),
            "--k", "5", "--max-terms", "8",
        ]) == 0
    finally:
        type(spark).stop = real_stop

    msmk = spark.read.parquet(str(d / "msmk"))
    # both queries have >=2 in-vocab terms; msm=2 still returns rows
    assert msmk.count() > 0
    fc = spark.read.parquet(str(d / "fc"))
    assert set(fc.columns) == {"query_id", "facet_value", "n_docs", "facet_rank"}
    assert fc.count() > 0
    mlt = spark.read.parquet(str(d / "mlt"))
    rows = mlt.collect()
    assert rows and all(r["doc_id"] != seed for r in rows)


def test_cli_rewrite_pagination_surface(spark, workspace, tmp_path):
    """suggest / spell / fuzzy / synonyms / --page drive the rewrite
    and pagination operators from the CLI."""
    import embed_rerank_spark.cli as cli

    d = workspace
    (tmp_path / "prefixes.tsv").write_text("0\tw1\n1\tzzz\n")
    (tmp_path / "typos.tsv").write_text("0\tthe w12\n")
    (tmp_path / "syn.txt").write_text("w12, w55\n")
    real_stop = type(spark).stop
    type(spark).stop = lambda self: None
    try:
        assert cli.main([
            "suggest", "--index", str(d / "index"),
            "--prefixes", str(tmp_path / "prefixes.tsv"),
            "--out", str(tmp_path / "sg"), "--top", "5",
        ]) == 0
        assert cli.main([
            "spell", "--index", str(d / "index"),
            "--queries", str(tmp_path / "typos.tsv"),
            "--out", str(tmp_path / "sp"),
        ]) == 0
        assert cli.main([
            "query", "--index", str(d / "index"), "--mode", "fuzzy",
            "--queries", str(tmp_path / "typos.tsv"),
            "--out", str(tmp_path / "fz"), "--k", "5",
        ]) == 0
        assert cli.main([
            "query", "--index", str(d / "index"),
            "--queries", str(d / "queries.tsv"),
            "--synonyms", str(tmp_path / "syn.txt"),
            "--out", str(tmp_path / "syn_out"), "--k", "5",
        ]) == 0
        assert cli.main([
            "query", "--index", str(d / "index"),
            "--queries", str(d / "queries.tsv"),
            "--out", str(tmp_path / "p2"), "--k", "5", "--page", "2",
        ]) == 0
    finally:
        type(spark).stop = real_stop

    sg = spark.read.parquet(str(tmp_path / "sg"))
    assert sg.filter(F.col("query_id") == 0).count() == 5  # w1* is dense
    assert sg.filter(F.col("query_id") == 1).count() == 0
    sp = spark.read.parquet(str(tmp_path / "sp"))
    assert set(sp.columns) == {"query_id", "corrected", "n_corrections"}
    assert spark.read.parquet(str(tmp_path / "fz")).count() > 0
    assert spark.read.parquet(str(tmp_path / "syn_out")).count() > 0
    # page 2 is disjoint from page 1 on doc ids per query
    p1 = spark.read.parquet(str(tmp_path / "p2"))
    top1 = spark.read.parquet(str(d / "topk"))
    overlap = p1.join(top1, ["query_id", "doc_id"]).count()
    assert overlap == 0 and p1.count() > 0


def test_cli_ingest_warc_and_pagerank(spark, workspace, tmp_path):
    import datetime as dt

    import embed_rerank_spark.cli as cli
    from embed_rerank_spark.sources.warc import write_warc

    rows = [
        (f"https://e.org/{i}", dt.datetime(2025, 6, 1 + i % 2), f"<p>doc {i} words</p>".encode())
        for i in range(12)
    ]
    (tmp_path / "a.warc").write_bytes(write_warc(rows[:6]))
    (tmp_path / "b.warc").write_bytes(write_warc(rows[6:]))

    stop = spark.stop
    spark.stop = lambda: None
    try:
        assert cli.main([
            "ingest-warc", "--warc", str(tmp_path / "*.warc"),
            "--out", str(tmp_path / "pages"), "--partition-by-day",
        ]) == 0
        pages = spark.read.parquet(str(tmp_path / "pages"))
        assert pages.count() == 12
        assert {"url", "warc_ts", "html", "text", "lang"} <= set(pages.columns)
        assert pages.filter(F.col("text").contains("doc 3 words")).count() == 1
        # day partitioning materialized for snapshot pruning
        assert pages.select("crawl_day").distinct().count() == 2

        edges = [(i, (i + 1) % 6) for i in range(6)] + [(6, 0), (7, 0)]
        spark.createDataFrame(edges, "src long, dst long").write.mode(
            "overwrite"
        ).parquet(str(tmp_path / "edges"))
        assert cli.main([
            "pagerank", "--edges", str(tmp_path / "edges"),
            "--out", str(tmp_path / "pr"), "--iters", "5",
        ]) == 0
        pr = {r.id: r.pr for r in spark.read.parquet(str(tmp_path / "pr")).collect()}
        assert len(pr) == 8
        assert pr[0] > pr[7]  # 0 has in-links from the ring and both leaves
    finally:
        spark.stop = stop


def test_cli_prf_and_dedup(spark, workspace, tmp_path):
    """prf and dedup subcommands produce well-formed outputs over a
    fresh index (the shared workspace index is mutated by the compact /
    delete tests, so this builds its own)."""
    import embed_rerank_spark.cli as cli

    d = workspace
    idx = tmp_path / "index"
    corpus = str(idx / "segments" / "*" / "extracted")
    # patch the INSTANCE attribute: an earlier test's restore can leave
    # a bound real stop in spark.__dict__, which would shadow a
    # class-level patch when cli.main calls spark.stop()
    prev_stop = spark.__dict__.get("stop")
    spark.stop = lambda: None
    try:
        assert cli.main([
            "build-index", "--pages", str(d / "pages"), "--index", str(idx),
            "--shards", "4", "--max-concurrent", "2",
        ]) == 0
        assert cli.main([
            "prf", "--index", str(idx), "--corpus", corpus,
            "--queries", str(d / "queries.tsv"), "--out", str(tmp_path / "prf"),
            "--k", "5", "--fb-docs", "3", "--fb-terms", "2",
        ]) == 0
        assert cli.main([
            "dedup", "--corpus", corpus, "--out", str(tmp_path / "clusters"),
            "--method", "clusters",
        ]) == 0
        assert cli.main([
            "dedup", "--corpus", corpus, "--out", str(tmp_path / "spans"),
            "--method", "spans", "--window", "8",
        ]) == 0
    finally:
        if prev_stop is None:
            spark.__dict__.pop("stop", None)
        else:
            spark.stop = prev_stop

    prf = spark.read.parquet(str(tmp_path / "prf"))
    assert prf.filter(F.col("query_id") == 0).count() == 5
    clusters = spark.read.parquet(str(tmp_path / "clusters"))
    n_docs = spark.read.parquet(corpus).count()
    assert clusters.count() == n_docs
    assert set(clusters.columns) == {"doc_id", "canonical", "is_canonical"}
    spans = spark.read.parquet(str(tmp_path / "spans"))
    assert spans.count() == n_docs


def test_cli_scrub_sketch_wildcards_collapse(spark, workspace, tmp_path):
    """Round-3 subcommands: scrub / url-dedup / heavy-hitters, plus the
    wildcard query modes and --collapse-by on the query command."""
    import embed_rerank_spark.cli as cli

    d = workspace
    idx = tmp_path / "index"
    corpus = str(idx / "segments" / "*" / "extracted")
    (tmp_path / "wq.tsv").write_text("0\tw1\n")
    prev_stop = spark.__dict__.get("stop")
    spark.stop = lambda: None
    try:
        assert cli.main([
            "build-index", "--pages", str(d / "pages"), "--index", str(idx),
            "--shards", "4", "--max-concurrent", "2",
        ]) == 0
        assert cli.main([
            "scrub", "--corpus", corpus, "--out", str(tmp_path / "scrubbed"),
        ]) == 0
        pages_urls = spark.read.parquet(corpus).select(
            "doc_id", F.concat(F.lit("https://h.example.com/p/"),
                               F.pmod(F.col("doc_id"), F.lit(7)).cast("string")).alias("url")
        )
        pages_urls.write.mode("overwrite").parquet(str(tmp_path / "purl"))
        assert cli.main([
            "url-dedup", "--pages", str(tmp_path / "purl"),
            "--out", str(tmp_path / "udup"),
        ]) == 0
        assert cli.main([
            "heavy-hitters", "--corpus", corpus, "--out", str(tmp_path / "hh"),
            "--capacity", "100000", "--top-n", "5",
        ]) == 0
        for mode in ("prefix", "suffix", "infix"):
            assert cli.main([
                "query", "--index", str(idx), "--queries", str(tmp_path / "wq.tsv"),
                "--out", str(tmp_path / f"q_{mode}"), "--mode", mode, "--k", "3",
            ]) == 0
        (tmp_path / "wild.tsv").write_text("0\tw?\n")
        assert cli.main([
            "query", "--index", str(idx), "--queries", str(tmp_path / "wild.tsv"),
            "--out", str(tmp_path / "q_wildcard"), "--mode", "wildcard", "--k", "3",
        ]) == 0
        (tmp_path / "trange.tsv").write_text("0\ta zzzz\n")
        assert cli.main([
            "query", "--index", str(idx), "--queries", str(tmp_path / "trange.tsv"),
            "--out", str(tmp_path / "q_term_range"), "--mode", "term-range", "--k", "3",
        ]) == 0
        assert cli.main([
            "query", "--index", str(idx), "--queries", str(d / "queries.tsv"),
            "--out", str(tmp_path / "q_collapsed"), "--k", "3",
            "--collapse-by", "url", "--corpus", corpus,
        ]) == 0
    finally:
        if prev_stop is None:
            spark.__dict__.pop("stop", None)
        else:
            spark.stop = prev_stop

    n_docs = spark.read.parquet(corpus).count()
    scrubbed = spark.read.parquet(str(tmp_path / "scrubbed"))
    assert scrubbed.count() == n_docs and "scrubbed" in scrubbed.columns
    udup = spark.read.parquet(str(tmp_path / "udup"))
    assert udup.count() == n_docs
    assert udup.filter("is_canonical").count() == 7  # one survivor per canon
    hh = spark.read.parquet(str(tmp_path / "hh"))
    assert hh.count() == 5 and hh.filter("err_ub = 0").count() == 5
    for mode in ("prefix", "suffix", "infix", "wildcard", "term_range"):
        q = spark.read.parquet(str(tmp_path / f"q_{mode}"))
        assert q.count() > 0, mode
    col = spark.read.parquet(str(tmp_path / "q_collapsed"))
    assert col.count() > 0 and "inner_hits" in col.columns


def test_cli_combined_phrase_index_and_nextword_mode(spark, tmp_path):
    """build-positional-index --combined-phrase + query
    --mode phrase-nextword through the spark-submit surface: results
    identical to the plain phrase mode over the unigram index.
    Self-contained (own corpus + indexes in tmp_path)."""
    import embed_rerank_spark.cli as cli

    d = tmp_path
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    ).write.mode("overwrite").parquet(str(d / "corpus"))
    (d / "phrases.tsv").write_text("0\tsort merge\n1\tthe a\n")
    # instance-level patch: earlier tests in this module may leave a
    # REAL bound `stop` in spark.__dict__, which would shadow a
    # class-level patch and kill the shared session
    prev_stop = spark.__dict__.get("stop")
    spark.stop = lambda: None
    try:
        assert cli.main([
            "build-positional-index",
            "--corpus", str(d / "corpus"),
            "--index", str(d / "posidx"), "--shards", "4",
        ]) == 0
        assert cli.main([
            "build-positional-index", "--combined-phrase",
            "--corpus", str(d / "corpus"),
            "--index", str(d / "combidx"), "--shards", "4",
        ]) == 0
        assert cli.main([
            "query", "--index", str(d / "posidx"), "--mode", "phrase",
            "--queries", str(d / "phrases.tsv"), "--out", str(d / "ph"), "--k", "5",
        ]) == 0
        assert cli.main([
            "query", "--index", str(d / "combidx"), "--mode", "phrase-nextword",
            "--queries", str(d / "phrases.tsv"), "--out", str(d / "phnw"), "--k", "5",
        ]) == 0
    finally:
        if prev_stop is None:
            spark.__dict__.pop("stop", None)
        else:
            spark.stop = prev_stop

    key = lambda r: (r.query_id, r.rank, r.doc_id, round(r.score, 6))  # noqa: E731
    nw = sorted(map(key, spark.read.parquet(str(d / "phnw")).collect()))
    ph = sorted(map(key, spark.read.parquet(str(d / "ph")).collect()))
    assert nw == ph and nw


def test_cli_session5_surfaces(spark, tmp_path):
    """Session-5 subcommands: nested-bool / phrase-suggest /
    composite-agg / decay-rescore, plus the stop analyzer on the
    positional build + query path."""
    import embed_rerank_spark.cli as cli

    d = tmp_path
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.select("doc_id", "text", "lang", "source").write.mode(
        "overwrite"
    ).parquet(str(d / "corpus"))
    (d / "nb.tsv").write_text(
        '0\t{"bool": {"must": ["sort"], "should": ["hash", "merge"]}}\n'
        '1\t{"bool": {"should": [{"bool": {"must": ["scan", "table"]}}, '
        '"join"], "must_not": ["dup"]}}\n'
    )
    (d / "sugg.tsv").write_text("0\tsord merge\n")
    (d / "agg.tsv").write_text("0\tdata\n")
    (d / "anq.tsv").write_text("0\tthe a an\n1\tsort merge\n")
    prev_stop = spark.__dict__.get("stop")
    spark.stop = lambda: None
    try:
        assert cli.main([
            "nested-bool", "--corpus", str(d / "corpus"),
            "--queries", str(d / "nb.tsv"), "--out", str(d / "nb"), "--k", "5",
        ]) == 0
        assert cli.main([
            "phrase-suggest", "--corpus", str(d / "corpus"),
            "--queries", str(d / "sugg.tsv"), "--out", str(d / "sugg"),
        ]) == 0
        assert cli.main([
            "composite-agg", "--corpus", str(d / "corpus"),
            "--queries", str(d / "agg.tsv"), "--out", str(d / "agg"),
            "--sources", "lang,source", "--page-size", "3",
        ]) == 0
        # decay-rescore over a synthetic candidate window + doc values
        spark.createDataFrame(
            [(0, 1, 2.0), (0, 2, 1.5), (0, 3, 1.0)],
            "query_id long, doc_id long, score double",
        ).write.mode("overwrite").parquet(str(d / "cands"))
        spark.createDataFrame(
            [(1, 300.0), (2, 360.0), (3, 900.0)],
            "doc_id long, value double",
        ).write.mode("overwrite").parquet(str(d / "dv"))
        assert cli.main([
            "decay-rescore", "--candidates", str(d / "cands"),
            "--doc-values", str(d / "dv"), "--out", str(d / "dec"),
            "--kind", "gauss", "--origin", "365", "--scale", "90", "--k", "3",
        ]) == 0
        assert cli.main([
            "build-positional-index", "--analyzer", "stop",
            "--corpus", str(d / "corpus"),
            "--index", str(d / "anidx"), "--shards", "4",
        ]) == 0
        assert cli.main([
            "query", "--index", str(d / "anidx"), "--analyzer", "stop",
            "--queries", str(d / "anq.tsv"), "--out", str(d / "anq"), "--k", "5",
        ]) == 0
    finally:
        if prev_stop is None:
            spark.__dict__.pop("stop", None)
        else:
            spark.stop = prev_stop

    nb = spark.read.parquet(str(d / "nb"))
    assert nb.count() > 0
    assert set(nb.columns) == {"query_id", "rank", "doc_id", "score"}
    sugg = spark.read.parquet(str(d / "sugg")).collect()
    assert len(sugg) == 1 and "sort merge" in sugg[0].suggestion
    agg = spark.read.parquet(str(d / "agg"))
    assert agg.count() == 3  # one page of 3 buckets
    assert set(agg.columns) == {"query_id", "key1", "key2", "n_docs", "bucket_rank"}
    dec = spark.read.parquet(str(d / "dec")).collect()
    # doc 2 sits nearest the origin -> largest multiplier wins rank 1
    assert [r.doc_id for r in sorted(dec, key=lambda r: r.rank)][0] == 2
    anq = spark.read.parquet(str(d / "anq"))
    assert anq.filter("query_id = 0").count() == 0  # all-stopword query
    assert anq.filter("query_id = 1").count() > 0


def test_cli_has_child_and_bpe_train(spark, tmp_path):
    import embed_rerank_spark.cli as cli

    d = tmp_path
    spark.createDataFrame(
        [
            (10, 101, "alpha beta"),
            (10, 102, "alpha alpha"),
            (20, 201, "alpha gamma"),
            (30, 301, "delta"),
        ],
        "parent_id long, child_id long, text string",
    ).write.mode("overwrite").parquet(str(d / "children"))
    spark.createDataFrame(
        [(0, "low lower lowest low low new newer newest new")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(d / "corpus"))
    (d / "q.tsv").write_text("0\talpha\n")
    prev_stop = spark.__dict__.get("stop")
    spark.stop = lambda: None
    try:
        assert cli.main([
            "has-child", "--children", str(d / "children"),
            "--queries", str(d / "q.tsv"), "--out", str(d / "hc"),
            "--score-mode", "sum", "--min-children", "1",
        ]) == 0
        assert cli.main([
            "bpe-train", "--corpus", str(d / "corpus"),
            "--merges", "4", "--out", str(d / "bpe"),
        ]) == 0
    finally:
        if prev_stop is None:
            spark.__dict__.pop("stop", None)
        else:
            spark.stop = prev_stop

    hc = spark.read.parquet(str(d / "hc"))
    assert {r.parent_id for r in hc.collect()} == {10, 20}
    assert set(hc.columns) == {"query_id", "rank", "parent_id", "score", "n_matching"}
    merges = spark.read.parquet(str(d / "bpe" / "merges"))
    assert merges.count() == 4
    vocab = spark.read.parquet(str(d / "bpe" / "vocab"))
    assert vocab.count() > 0 and set(vocab.columns) == {"token", "n_words", "total"}


def test_cli_dsir_select(spark, tmp_path):
    import embed_rerank_spark.cli as cli

    d = tmp_path
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.select("doc_id", "text").write.mode("overwrite").parquet(str(d / "raw"))
    docs.filter("source = 'src0'").select("doc_id", "text").write.mode(
        "overwrite"
    ).parquet(str(d / "tgt"))
    prev_stop = spark.__dict__.get("stop")
    spark.stop = lambda: None
    try:
        assert cli.main([
            "dsir-select", "--corpus", str(d / "raw"), "--target", str(d / "tgt"),
            "--out", str(d / "sel"), "--budget", "50", "--buckets", "256",
        ]) == 0
    finally:
        if prev_stop is None:
            spark.__dict__.pop("stop", None)
        else:
            spark.stop = prev_stop

    sel = spark.read.parquet(str(d / "sel"))
    assert sel.count() == 50
    assert set(sel.columns) == {"doc_id", "weight", "sel_rank"}


def test_cli_stem_analyzer_path(spark, tmp_path):
    import embed_rerank_spark.cli as cli

    d = tmp_path
    spark.createDataFrame(
        [(1, "table scan fast"), (2, "tables everywhere"), (3, "other words")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(d / "corpus"))
    (d / "q.tsv").write_text("0\ttables\n")
    prev_stop = spark.__dict__.get("stop")
    spark.stop = lambda: None
    try:
        assert cli.main([
            "build-positional-index", "--analyzer", "stem",
            "--corpus", str(d / "corpus"), "--index", str(d / "idx"),
            "--shards", "2",
        ]) == 0
        assert cli.main([
            "query", "--index", str(d / "idx"), "--analyzer", "stem",
            "--queries", str(d / "q.tsv"), "--out", str(d / "hits"), "--k", "5",
        ]) == 0
    finally:
        if prev_stop is None:
            spark.__dict__.pop("stop", None)
        else:
            spark.stop = prev_stop

    hits = spark.read.parquet(str(d / "hits"))
    assert {r.doc_id for r in hits.collect()} == {1, 2}  # plural collapsed


def test_cli_session6_surfaces(spark, tmp_path):
    """Session-6 subcommands: bpe-encode, quality-train, routed-query,
    impact-query — each runs end-to-end and writes sane parquet."""
    import embed_rerank_spark.cli as cli

    d = tmp_path
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.select("doc_id", "text").write.mode("overwrite").parquet(
        str(d / "corpus")
    )
    spark.createDataFrame(
        [(1, "a", "t"), (2, "t", "h")], "step long, a string, b string"
    ).write.parquet(str(d / "merges"))
    docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    ).write.parquet(str(d / "labels"))

    from embed_rerank_spark.operators.impact import (
        impact_dictionary,
        with_impact_ids,
    )
    from embed_rerank_spark.operators.postings import build_postings, write_index
    from embed_rerank_spark.operators.routing import write_routed

    write_routed(
        docs.select("doc_id", "text", "source"), str(d / "routed"),
        routing_col="source",
    )
    dictionary = impact_dictionary(docs, score_col="n_chars")
    dictionary.write.parquet(str(d / "dict"))
    write_index(
        build_postings(with_impact_ids(docs, dictionary), n_shards=4),
        str(d / "iidx"),
    )
    (d / "rq.tsv").write_text("1\tsrc3\tfast hash join\n2\tsrc5\tslow scan\n")
    (d / "iq.tsv").write_text("1\tfast hash join\n")

    prev_stop = spark.__dict__.get("stop")
    spark.stop = lambda: None
    try:
        assert cli.main([
            "bpe-encode", "--corpus", str(d / "corpus"),
            "--merges", str(d / "merges"), "--out", str(d / "enc"),
        ]) == 0
        assert cli.main([
            "quality-train", "--corpus", str(d / "corpus"),
            "--labels", str(d / "labels"), "--out", str(d / "scores"),
            "--dim", "8", "--iters", "2",
        ]) == 0
        assert cli.main([
            "routed-query", "--docs", str(d / "routed"),
            "--queries", str(d / "rq.tsv"), "--out", str(d / "rout"),
        ]) == 0
        assert cli.main([
            "impact-query", "--index", str(d / "iidx"),
            "--dictionary", str(d / "dict"),
            "--queries", str(d / "iq.tsv"), "--out", str(d / "iout"),
        ]) == 0
    finally:
        if prev_stop is None:
            spark.__dict__.pop("stop", None)
        else:
            spark.stop = prev_stop

    enc = spark.read.parquet(str(d / "enc/docs"))
    assert enc.count() == docs.count()
    assert set(enc.columns) == {"doc_id", "n_tokens", "tokens"}
    scores = spark.read.parquet(str(d / "scores"))
    assert scores.filter((F.col("p") < 0) | (F.col("p") > 1)).count() == 0
    rout = spark.read.parquet(str(d / "rout"))
    assert rout.count() > 0 and rout.filter(F.col("rank") == 1).count() >= 1
    iout = spark.read.parquet(str(d / "iout"))
    assert iout.count() > 0
    # impact results really are static-score-descending per query
    rows = sorted(
        ((r.query_id, r["rank"], r.static) for r in iout.collect())
    )
    for (q1, r1, s1), (q2, r2, s2) in zip(rows, rows[1:]):
        if q1 == q2:
            assert s1 >= s2


def test_cli_knn_modes(spark, tmp_path):
    """knn subcommand: exact / pooled / maxp / maxsim all run and the
    pooled doc space is the chunk space collapsed by doc_id."""
    import embed_rerank_spark.cli as cli

    d = tmp_path
    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    chunks = vecs.select(
        F.expr("vec_id div 4").alias("doc_id"), "vec_id", "embedding"
    )
    chunks.write.parquet(str(d / "vecs"))
    vecs.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    ).write.parquet(str(d / "q"))
    chunks.filter(F.col("doc_id") == 0).select(
        F.col("doc_id").alias("query_id"), F.col("embedding").alias("qvec")
    ).write.parquet(str(d / "mq"))

    prev_stop = spark.__dict__.get("stop")
    spark.stop = lambda: None
    try:
        for mode, qdir, outdir in [
            ("exact", "q", "o_exact"),
            ("pooled-mean", "q", "o_pool"),
            ("maxp", "q", "o_maxp"),
            ("maxsim", "mq", "o_maxsim"),
        ]:
            assert cli.main([
                "knn", "--vectors", str(d / "vecs"),
                "--queries", str(d / qdir), "--out", str(d / outdir),
                "--mode", mode, "--k", "5",
            ]) == 0
    finally:
        if prev_stop is None:
            spark.__dict__.pop("stop", None)
        else:
            spark.stop = prev_stop

    exact = spark.read.parquet(str(d / "o_exact"))
    assert exact.filter(F.col("rank") == 1).count() == 3
    pool = spark.read.parquet(str(d / "o_pool"))
    n_docs = chunks.select("doc_id").distinct().count()
    assert pool.filter(F.col("vec_id") >= n_docs).count() == 0
    maxp = spark.read.parquet(str(d / "o_maxp"))
    # a query vector's own doc contains it -> cosine 1.0 at rank 1
    assert all(
        abs(r.cosine - 1.0) < 1e-9
        for r in maxp.filter(F.col("rank") == 1).collect()
    )
    maxsim = spark.read.parquet(str(d / "o_maxsim"))
    top = maxsim.filter(F.col("rank") == 1).collect()[0]
    assert top.doc_id == 0 and abs(top.score - 4.0) < 1e-9


def test_cli_constant_score_and_change_point(spark, workspace, tmp_path):
    import datetime as dt

    import embed_rerank_spark.cli as cli

    d = workspace
    idx = tmp_path / "cs_index"
    prev_stop = spark.__dict__.get("stop")
    spark.stop = lambda: None
    try:
        assert cli.main([
            "build-index", "--pages", str(d / "pages"), "--index", str(idx),
            "--shards", "4", "--max-concurrent", "2",
        ]) == 0
        (tmp_path / "cq.tsv").write_text("0\tw1 w2\n1\tzzzneverseen\n")
        assert cli.main([
            "query", "--index", str(idx), "--queries", str(tmp_path / "cq.tsv"),
            "--out", str(tmp_path / "q_cs"), "--mode", "constant-score",
            "--k", "5", "--boost", "2.5",
        ]) == 0
        rows = spark.read.parquet(str(tmp_path / "q_cs")).collect()
        assert rows and all(r["score"] == 2.5 for r in rows)
        assert all(r["query_id"] == 0 for r in rows)  # OOV query empty
        ranks = sorted((r["rank"], r["doc_id"]) for r in rows)
        assert [r for r, _ in ranks] == list(range(1, len(ranks) + 1))
        # doc_id asc == rank order (index order, ES constant_score tie rule)
        assert [d_ for _, d_ in ranks] == sorted(d_ for _, d_ in ranks)

        base = dt.datetime(2024, 5, 1)
        ev = spark.createDataFrame(
            [
                (base + dt.timedelta(days=day, hours=h), "k",
                 5.0 if day < 3 else 9.0)
                for day in range(6)
                for h in (1, 2)
            ],
            "ts timestamp, event_type string, value double",
        )
        ev.write.mode("overwrite").parquet(str(tmp_path / "cp_events"))
        assert cli.main([
            "change-point", "--events", str(tmp_path / "cp_events"),
            "--out", str(tmp_path / "cp_out"),
        ]) == 0
        r = spark.read.parquet(str(tmp_path / "cp_out")).collect()[0]
        assert r["n_buckets"] == 6
        assert r["cp_ts"] == int((base + dt.timedelta(days=2)).timestamp())
        assert r["delta"] == 4.0
    finally:
        if prev_stop is not None:
            spark.stop = prev_stop
        else:
            del spark.__dict__["stop"]


def test_cli_session12_surfaces(spark, workspace, tmp_path):
    """Session-12 subcommands: hll-cardinality, geo-rings,
    dedup --method incremental, query --mode phonetic — each runs
    end-to-end and writes sane parquet."""
    import embed_rerank_spark.cli as cli

    d = workspace
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite").parquet(str(tmp_path / "corpus"))
    docs.filter(F.col("doc_id") % 4 == 0).write.mode("overwrite").parquet(
        str(tmp_path / "delta")
    )
    docs.filter(F.col("doc_id") % 4 != 0).write.mode("overwrite").parquet(
        str(tmp_path / "base")
    )
    prev_stop = spark.__dict__.get("stop")
    spark.stop = lambda: None
    try:
        assert cli.main([
            "hll-cardinality", "--corpus", str(tmp_path / "corpus"),
            "--out", str(tmp_path / "hll"), "--p", "7",
        ]) == 0
        rows = spark.read.parquet(str(tmp_path / "hll")).collect()
        assert rows and all(r["m"] == 128 and 0 < r["nonzero"] <= 128 for r in rows)

        assert cli.main([
            "geo-rings", "--corpus", str(tmp_path / "corpus"),
            "--out", str(tmp_path / "rings"),
            "--origin-lat", "20.0", "--origin-lon", "10.0",
            "--edges-km", "2000,8000",
        ]) == 0
        rings = spark.read.parquet(str(tmp_path / "rings")).collect()
        assert sorted(r["ring"] for r in rings) == [0, 1, 2]
        assert sum(r["n_docs"] for r in rings) == docs.count()

        assert cli.main([
            "dedup", "--method", "incremental",
            "--corpus", str(tmp_path / "base"), "--delta", str(tmp_path / "delta"),
            "--out", str(tmp_path / "incdup"), "--threshold", "0.5",
        ]) == 0
        inc = spark.read.parquet(str(tmp_path / "incdup"))
        assert set(inc.columns) == {"doc_a", "doc_b", "jaccard", "pair_kind"}

        idx = tmp_path / "ph_index"
        assert cli.main([
            "build-index", "--pages", str(d / "pages"), "--index", str(idx),
            "--shards", "4", "--max-concurrent", "2",
        ]) == 0
        # w12 is in-vocab; a phonetic variant of it must retrieve docs
        (tmp_path / "pq.tsv").write_text("0\tw12\n1\tzzzqqq\n")
        assert cli.main([
            "query", "--index", str(idx), "--queries", str(tmp_path / "pq.tsv"),
            "--out", str(tmp_path / "ph_out"), "--mode", "phonetic", "--k", "5",
        ]) == 0
        ph = spark.read.parquet(str(tmp_path / "ph_out")).collect()
        assert ph and all(r["query_id"] == 0 for r in ph)

        from embed_rerank_spark.operators.postings import (
            build_postings,
            write_index,
        )

        write_index(build_postings(docs, n_shards=4), str(tmp_path / "tl_idx"))
        (tmp_path / "tl.tsv").write_text("1\t3\n")
        assert cli.main([
            "terms-lookup", "--index", str(tmp_path / "tl_idx"),
            "--corpus", str(tmp_path / "corpus"),
            "--lookups", str(tmp_path / "tl.tsv"),
            "--out", str(tmp_path / "tl_out"), "--k", "8", "--boost", "3.0",
        ]) == 0
        tl = spark.read.parquet(str(tmp_path / "tl_out")).collect()
        assert tl and all(r["score"] == 3.0 and r["query_id"] == 1 for r in tl)
    finally:
        if prev_stop is not None:
            spark.stop = prev_stop
        else:
            del spark.stop


def test_cli_incremental_dedup_requires_delta(capsys):
    """dedup --method incremental without --delta is a usage error
    (argparse exit 2), not an opaque TypeError from parquet(None)."""
    import embed_rerank_spark.cli as cli

    with pytest.raises(SystemExit) as exc:
        cli.main([
            "dedup", "--corpus", "/nonexistent", "--out", "/nonexistent-out",
            "--method", "incremental",
        ])
    assert exc.value.code == 2
    assert "--delta is required" in capsys.readouterr().err


def test_cli_shards_bad_value_is_usage_error(capsys):
    """--shards takes an int or 'auto'; anything else exits 2 from
    argparse before a Spark session ever starts (not a ValueError
    traceback from int() mid-run)."""
    import embed_rerank_spark.cli as cli

    for bad in ("3 2", "fast", "0", "-4"):
        with pytest.raises(SystemExit) as exc:
            cli.main([
                "build-index", "--pages", "/nonexistent",
                "--index", "/nonexistent-out", "--shards", bad,
            ])
        assert exc.value.code == 2, bad
    err = capsys.readouterr().err
    assert "integer or 'auto'" in err or "positive" in err


def test_cli_shards_accepts_auto_and_int():
    """'auto' (any case) parses to None (sized_shards rule); ints pass
    through — parse-level check, no Spark."""
    import embed_rerank_spark.cli as cli

    assert cli._int_or_auto("auto") is None
    assert cli._int_or_auto("AUTO") is None
    assert cli._int_or_auto("Auto ") is None  # case/space tolerant
    assert cli._int_or_auto("128") == 128


def test_cli_unimax_mix(spark, tmp_path):
    import embed_rerank_spark.cli as cli

    docs = spark.createDataFrame(
        [(i, "aa " * ((i % 3 + 1) * 5), ["de", "fr", "en"][i % 3]) for i in range(60)],
        "doc_id long, text string, lang string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "corpus"))
    prev_stop = spark.__dict__.get("stop")
    spark.stop = lambda: None
    try:
        assert cli.main([
            "unimax-mix", "--corpus", str(tmp_path / "corpus"),
            "--out", str(tmp_path / "alloc"), "--budget", "300", "--epochs", "2",
        ]) == 0
    finally:
        if prev_stop is None:
            spark.__dict__.pop("stop", None)
        else:
            spark.stop = prev_stop
    alloc = {r.lang: r for r in spark.read.parquet(str(tmp_path / "alloc")).collect()}
    assert set(alloc) == {"de", "fr", "en"}
    assert all(r.allocated_tokens <= r.cap_tokens for r in alloc.values())
    assert sum(r.allocated_tokens for r in alloc.values()) <= 300
