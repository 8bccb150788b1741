"""Faceted search: per-query value counts over the FULL matching doc
set (Lucene/Solr facet semantics — a facet counts every document that
matches the query, not just the returned page, so the UI can render
"lang: de (1,234)" drill-down chips next to the top-k list).

Reference parity note: the reference (joonsoome/embed-rerank) serves
rerank-only requests and has no facet endpoint; faceting is part of the
fulltext query surface this engine adds around the BM25 index
(SURVEY.md §2.6 query-surface extensions).

Scale shape (100 TB):
- The matching-doc set is computed as broadcast(query terms) ⋈ the
  (doc_id, term) tf table — the same join the brute-force scorer uses;
  no new table is materialized.
- ``groupBy(query_id, doc_id)`` collapses multi-term matches BEFORE
  the facet join, so the facet-value join sees at most one row per
  (query, matching doc) — map-side combinable.
- The facet column rides in from the doc table via a doc_id join that
  Catalyst plans as a shuffle-hash/sort-merge join on doc_id; at
  10^12 docs this is the one big join, identical in shape to the
  scorer's dl join, and prunes to exactly two columns.
- ``top_n`` caps the per-query output with a window over the (tiny)
  aggregated (query, facet_value) counts, never over doc rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .bm25 import query_terms, term_freqs


def facet_counts(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    facet_col: str = "lang",
    top_n: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, facet_value, n_docs [, facet_rank]) — for each query,
    the number of DISTINCT documents matching >= 1 unique query term,
    bucketed by ``facet_col``. With ``top_n`` set, keeps the top-n
    facet values per query with engine tie semantics (count desc,
    value asc) and emits their 1-based ``facet_rank``."""
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    facets = matched.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(facet_col).alias("facet_value")),
        "doc_id",
    )
    counts = facets.groupBy("query_id", "facet_value").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    if top_n is None:
        return counts
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_docs"), F.asc("facet_value")
    )
    return (
        counts.withColumn("facet_rank", F.row_number().over(w))
        .filter(F.col("facet_rank") <= top_n)
    )


def range_facets(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    facet_col: str,
    boundaries: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, bucket, lo, n_docs): numeric range facets
    (Lucene/ES ``range`` aggregation) — per query, the count of
    distinct matching docs whose ``facet_col`` falls in each
    half-open bucket [b_i, b_{i+1}), plus the open tails
    (-inf, b_0) and [b_last, +inf). ``bucket`` is the human label
    ("[200,400)"); ``lo`` its numeric sort key (the bucket's lower
    bound, -inf tail = a value below every boundary).

    Same matching-set shape as ``facet_counts`` (broadcast query terms
    -> distinct matching docs -> doc-keyed metadata join); the
    bucketing itself is one chained ``when`` expression — codegen'd,
    no UDF, and only emitted buckets appear (count 0 rows are absent,
    Lucene semantics with ``min_doc_count=1``)."""
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    v = F.col("val")
    bs = sorted(boundaries)
    bucket = F.when(v < bs[0], F.lit(f"(-inf,{bs[0]:g})"))
    lo = F.when(v < bs[0], F.lit(float(bs[0]) - 1.0))
    for i, b in enumerate(bs):
        hi_label = f"{bs[i + 1]:g}" if i + 1 < len(bs) else "inf"
        hi_cond = v < bs[i + 1] if i + 1 < len(bs) else F.lit(True)
        lab = f"[{b:g},{hi_label})" if i + 1 < len(bs) else f"[{b:g},inf)"
        bucket = bucket.when((v >= b) & hi_cond, F.lit(lab))
        lo = lo.when((v >= b) & hi_cond, F.lit(float(b)))
    vals = docs.select(
        F.col(id_col).alias("doc_id"), F.col(facet_col).cast("double").alias("val")
    )
    return (
        matched.join(vals, "doc_id")
        .select("query_id", bucket.alias("bucket"), lo.alias("lo"))
        .groupBy("query_id", "bucket", "lo")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def stats_facets(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    cardinality_col: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, n_docs, min_v, max_v, sum_v, avg_v [, n_distinct]) —
    the Elasticsearch ``stats`` aggregation (plus an exact
    ``cardinality`` over ``cardinality_col`` when given) computed over
    each query's FULL matching doc set, same match semantics as
    ``facet_counts`` (>= 1 unique query term).

    Scale shape: identical to ``facet_counts`` — the match set
    collapses to one row per (query, doc) before the value join, then
    ONE combinable aggregation produces every stat (min/max/sum/count
    are all partial-aggregatable; avg derives from sum/count so no
    second pass). Exact distinct (cardinality) is the one
    non-combinable piece — Spark plans it as the standard two-level
    expand, still bounded by matches x 2. Output is n_queries rows."""
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    cols = [F.col(id_col).alias("doc_id"), F.col(value_col).alias("_v")]
    if cardinality_col is not None:
        cols.append(F.col(cardinality_col).alias("_c"))
    joined = matched.join(docs.select(*cols), "doc_id")
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.min("_v").alias("min_v"),
        F.max("_v").alias("max_v"),
        F.sum("_v").alias("sum_v"),
        F.avg("_v").alias("avg_v"),
    ]
    if cardinality_col is not None:
        aggs.append(F.countDistinct("_c").alias("n_distinct"))
    return joined.groupBy("query_id").agg(*aggs)


def approx_stats_facets(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    cardinality_col: str,
    percentiles: list[float],
    rsd: float = 0.05,
    accuracy: int = 10000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, n_docs, n_distinct_approx, pcts) — the 100 TB form
    of ``stats_facets`` + ``percentiles_facets``: Elasticsearch's
    ACTUAL defaults are sketches, and so are Spark's —
    ``approx_count_distinct`` is HyperLogLog++ (relative error
    ``rsd``, ES ``cardinality`` ditto) and ``percentile_approx`` is
    the mergeable quantile sketch behind ES ``percentiles``
    (rank error ~ 1/``accuracy``). Both are COMBINABLE map-side
    partial aggregates with constant-size state, so the per-group
    memory that bounds the exact forms (a count-distinct expand, a
    per-group value buffer) disappears: corpus-scale match sets
    aggregate in one pass at fixed memory per partition.

    Not oracle-hashable by construction (sketch internals differ
    across engines); the contract instead pins error bounds against
    the exact operators in ``tests/test_facets_mlt.py``."""
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    vals = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("double").alias("_v"),
        F.col(cardinality_col).alias("_c"),
    )
    pcts = [float(p) for p in percentiles]
    return matched.join(vals, "doc_id").groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.approx_count_distinct("_c", rsd).alias("n_distinct_approx"),
        F.percentile_approx(
            F.col("_v"), F.array(*[F.lit(p) for p in pcts]), accuracy
        ).alias("pcts"),
    )


def histogram_facets(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    interval: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, bucket_lo, n_docs) — the Elasticsearch numeric
    ``histogram`` aggregation: distinct matching docs per fixed-width
    bucket, ``bucket_lo = floor(v / interval) * interval`` (the ES
    bucket-key rule), ``min_doc_count=1`` (empty buckets absent).
    The fixed-interval sibling of ``range_facets``' explicit
    boundaries and ``date_histogram``'s calendar buckets.

    Same matching-set shape as ``facet_counts``; the bucket key is one
    codegen'd floor expression, the count one combinable hash agg."""
    if interval <= 0:
        raise ValueError("interval must be > 0")
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    vals = docs.select(
        F.col(id_col).alias("doc_id"),
        (
            F.floor(F.col(value_col).cast("double") / F.lit(float(interval)))
            * F.lit(float(interval))
        ).alias("bucket_lo"),
    )
    return (
        matched.join(vals, "doc_id")
        .groupBy("query_id", "bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def pinned_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    pins: list[tuple[int, list[int]]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, score, pinned) — the Elasticsearch
    ``pinned`` query: per query, the listed doc ids come FIRST in
    their listed order (score null-equivalent, emitted as the organic
    score when the doc also matches, else 0), then organic BM25
    results (pinned docs removed) fill the remaining ranks. The
    editorial-curation surface ("always show the landing page for
    this query").

    Scale shape: the pin list is planning-sized and broadcasts as a
    (query_id, doc_id, pin_pos) table into the scored stream; ranking
    is the usual per-query window with (is_pinned desc, pin_pos asc)
    prepended to the engine tie rule."""
    from .bm25 import bm25_scores_bruteforce, query_terms

    qterms = query_terms(spark, queries)
    scored = bm25_scores_bruteforce(docs, qterms, k1=k1, b=b,
                                    id_col=id_col, text_col=text_col)
    pin_rows = [
        (qid, did, pos)
        for qid, ids in pins
        for pos, did in enumerate(ids)
    ]
    pdf = spark.createDataFrame(
        pin_rows or [(None, None, None)],
        "query_id long, doc_id long, pin_pos long",
    ).filter(F.col("query_id").isNotNull())
    # full-outer joins can't broadcast (both sides may produce
    # unmatched rows); the pin side is planning-sized, so the shuffle
    # it adds is one tiny exchange on the already-aggregated stream
    joined = scored.join(pdf, ["query_id", "doc_id"], "full_outer")
    both = joined.select(
        "query_id",
        "doc_id",
        F.coalesce("score", F.lit(0.0)).alias("score"),
        F.col("pin_pos").isNotNull().alias("pinned"),
        F.coalesce("pin_pos", F.lit(2**31)).alias("pin_pos"),
    )
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("query_id").orderBy(
        F.desc("pinned"),
        F.asc("pin_pos"),
        F.desc(F.round(F.col("score"), 6)),
        F.asc("doc_id"),
    )
    return (
        both.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score", "pinned")
    )


def adjacency_matrix(
    spark: SparkSession,
    docs: DataFrame,
    filters: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(key, n_docs) — the Elasticsearch ``adjacency_matrix``
    aggregation: for named term filters, one bucket per filter
    (``key = name``) counting its matching docs, and one per
    UNORDERED filter pair (``key = nameA&nameB``, names sorted)
    counting the intersection; empty buckets absent (the ES
    min_doc_count=1 behavior). The co-occurrence / market-basket
    surface ("docs matching both 'gpu' and 'python'").

    Scale shape: one broadcast semi-join marks (doc, name) membership
    (distinct-collapsed), then the pair space comes from a self-join
    ON doc_id whose per-doc fan-out is bounded by len(filters)^2 —
    ES caps filters at 100 for exactly this reason — followed by one
    combinable count agg. No corpus-sized shuffle beyond the tf
    table's."""
    fdf = spark.createDataFrame(filters, "name string, term string")
    tf = term_freqs(docs, id_col, text_col)
    membership = (
        F.broadcast(fdf)
        .join(tf.select("doc_id", "term"), "term")
        .select("doc_id", "name")
        .distinct()
    )
    singles = membership.groupBy(F.col("name").alias("key")).agg(
        F.count("*").alias("n_docs")
    )
    m2 = membership.select("doc_id", F.col("name").alias("name2"))
    pairs = (
        membership.join(m2, "doc_id")
        .filter(F.col("name") < F.col("name2"))
        .select(
            F.concat(F.col("name"), F.lit("&"), F.col("name2")).alias("key")
        )
        .groupBy("key")
        .agg(F.count("*").alias("n_docs"))
    )
    return singles.unionByName(pairs)


def date_histogram(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    ts_col: str,
    interval: str = "week",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, bucket_start, n_docs) — the Elasticsearch
    ``date_histogram`` aggregation under a query: for each query, the
    count of DISTINCT matching documents per calendar bucket of
    ``ts_col`` (``interval`` in date_trunc units: day/week/month/...),
    ``min_doc_count=1`` semantics (empty buckets absent).
    ``bucket_start`` is emitted as the ISO yyyy-MM-dd string of the
    bucket's first day so the value is engine-portable.

    Scale shape: identical to ``facet_counts`` — the (query, doc)
    match set collapses before the metadata join; ``date_trunc`` is a
    codegen'd expression on the joined column, and the final count is
    one combinable hash agg keyed (query, bucket). Output is
    n_queries x n_buckets rows (tiny). On a ``days(warc_ts)``
    partitioned Iceberg table the ts column arrives pre-pruned from
    partition values, no extra scan cost."""
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    buckets = docs.select(
        F.col(id_col).alias("doc_id"),
        F.date_format(F.date_trunc(interval, F.col(ts_col)), "yyyy-MM-dd").alias(
            "bucket_start"
        ),
    )
    return (
        matched.join(buckets, "doc_id")
        .groupBy("query_id", "bucket_start")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def top_hits_by_bucket(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    bucket_col: str,
    k_hits: int = 3,
    top_buckets: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, facet_value, bucket_rank, hit_rank, doc_id, score) —
    the Elasticsearch ``terms`` aggregation with a ``top_hits``
    sub-aggregation: per query, buckets of ``bucket_col`` ranked by
    matching-doc count (count desc, value asc — engine facet tie
    semantics), and within each bucket the top ``k_hits`` documents by
    BM25 (engine tie semantics: rounded score desc, doc_id asc).
    ``top_buckets`` caps the buckets per query (None = all non-empty).

    Scale shape: one BM25 brute pass produces (query, doc, score);
    the bucket column joins in on doc_id (the same single big join the
    scorer's dl join makes); both windows then run over AGGREGATED or
    k-capped data — the bucket-rank window over (query, bucket) counts
    (tiny), and the per-bucket hit window benefits from Spark's
    WindowGroupLimit pushdown (rank filter becomes a per-partition
    group-limit before the shuffle), so a hot bucket's full match set
    is never sorted in one task."""
    from .bm25 import TIE_DECIMALS, bm25_scores_bruteforce

    qt = query_terms(spark, queries)
    scored = bm25_scores_bruteforce(docs, qt, id_col=id_col, text_col=text_col)
    vals = docs.select(
        F.col(id_col).alias("doc_id"), F.col(bucket_col).alias("facet_value")
    )
    cands = scored.join(vals, "doc_id")
    bcounts = cands.groupBy("query_id", "facet_value").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    bw = Window.partitionBy("query_id").orderBy(F.desc("n_docs"), F.asc("facet_value"))
    branked = bcounts.withColumn("bucket_rank", F.row_number().over(bw))
    if top_buckets is not None:
        branked = branked.filter(F.col("bucket_rank") <= top_buckets)
    hw = Window.partitionBy("query_id", "facet_value").orderBy(
        F.desc(F.round(F.col("score"), TIE_DECIMALS)), F.asc("doc_id")
    )
    hits = (
        cands.withColumn("hit_rank", F.row_number().over(hw))
        .filter(F.col("hit_rank") <= k_hits)
    )
    return hits.join(
        F.broadcast(branked.select("query_id", "facet_value", "bucket_rank")),
        ["query_id", "facet_value"],
    ).select("query_id", "facet_value", "bucket_rank", "hit_rank", "doc_id", "score")


def percentiles_facets(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    percentiles: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, pct, value) — the Elasticsearch ``percentiles``
    aggregation over each query's full matching doc set, EXACT with
    linear interpolation (the ES default is approximate t-digest; the
    contract pins the exact variant so the DuckDB ``quantile_cont``
    oracle is bit-comparable — both engines use the same
    R-7/linear-interpolation definition).

    Scale shape: exact percentiles need the per-group value multiset;
    Spark's ``percentile`` aggregate buffers values per (query) group
    — bounded by the match-set size per query, which is the same
    order as the scorer's candidate set. For corpus-scale groups where
    that buffer is too big, swap ``F.percentile`` for
    ``F.percentile_approx`` (t-digest, mergeable sketch, combinable
    map-side) at the cost of oracle exactness — the ES-default
    behavior. The query-bounded contract shape keeps the exact form."""
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    vals = docs.select(
        F.col(id_col).alias("doc_id"), F.col(value_col).cast("double").alias("_v")
    )
    pcts = [float(p) for p in percentiles]
    agg = matched.join(vals, "doc_id").groupBy("query_id").agg(
        F.percentile(F.col("_v"), F.array(*[F.lit(p) for p in pcts])).alias("vs")
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(p) for p in pcts]).alias("pct"), F.col("vs").alias("value")
    )
    return (
        agg.select("query_id", F.explode(pairs).alias("pv"))
        .select("query_id", F.col("pv.pct").alias("pct"), F.col("pv.value").alias("value"))
    )


def composite_agg(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    sources: tuple[str, str] = ("lang", "source"),
    page_size: int = 4,
    after: tuple[str, str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, key1, key2, n_docs, bucket_rank) — the Elasticsearch
    ``composite`` aggregation: buckets over the cartesian key
    ``sources = (key1, key2)`` of each query's matching doc set,
    streamed in deterministic composite-key order (key1 asc, key2
    asc), one page of ``page_size`` buckets per call, resuming
    STRICTLY AFTER the ``after`` composite key (ES ``after_key``
    pagination — the mechanism that lets a client walk a
    billion-bucket aggregation without the coordinator materializing
    it). ``bucket_rank`` is the 1-based position within the page.

    Scale shape: the after-key predicate is a row-value comparison on
    the AGGREGATED (query, key1, key2) bucket table, applied before
    the per-query ordering window — so a resumed page never re-sorts
    buckets it already emitted, and Spark's WindowGroupLimit pushdown
    turns the rank filter into a per-partition group-limit. Buckets,
    not docs, cross the final shuffle. With key sources that are also
    the table's partition columns, the after-key filter prunes
    partitions at the scan (the composite agg's reason to exist at
    10^12 docs)."""
    k1, k2 = sources
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    vals = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(k1).alias("key1"),
        F.col(k2).alias("key2"),
    )
    buckets = matched.join(vals, "doc_id").groupBy("query_id", "key1", "key2").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    if after is not None:
        a1, a2 = after
        buckets = buckets.filter(
            (F.col("key1") > F.lit(a1))
            | ((F.col("key1") == F.lit(a1)) & (F.col("key2") > F.lit(a2)))
        )
    w = Window.partitionBy("query_id").orderBy(F.asc("key1"), F.asc("key2"))
    return (
        buckets.withColumn("bucket_rank", F.row_number().over(w))
        .filter(F.col("bucket_rank") <= page_size)
        .select("query_id", "key1", "key2", "n_docs", "bucket_rank")
    )


def pipeline_aggs(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    ts_col: str,
    interval: str = "week",
    moving_window: int = 3,
    min_doc_count: int = 1,
    metric_col: str = "n_chars",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, bucket_start, n_docs, cum_docs, deriv_docs,
    moving_avg_docs, metric_per_doc) — the Elasticsearch PIPELINE
    aggregation family computed over a ``date_histogram`` of matching
    documents, one row per non-empty bucket:

    - ``cum_docs``      — ``cumulative_sum`` of the bucket doc count;
    - ``deriv_docs``    — ``derivative`` (count minus previous bucket's
      count; null for the first bucket, ES emits no value there);
    - ``moving_avg_docs`` — ``moving_fn`` unweightedAvg over the
      trailing ``moving_window`` buckets (window includes the current
      bucket, shrinks at the series head — MovingFunctions semantics);
    - ``metric_per_doc`` — a ``bucket_script``: sum(``metric_col``)
      over the bucket's docs divided by the bucket doc count.

    Gap policy "skip" (the ES default for derivative/moving_fn with
    ``min_doc_count=1``): pipeline steps run over the sequence of
    NON-EMPTY buckets in bucket order. ``min_doc_count`` acts as a
    ``bucket_selector`` applied AFTER the pipeline metrics are
    computed (ES evaluates sibling pipelines before the selector
    prunes the response), so a surviving bucket's derivative still
    references its true predecessor.

    Scale shape: the (query, doc) match set collapses before the
    metadata join (same as ``date_histogram``); the windows run
    per-query over the AGGREGATED bucket rows — n_queries x n_buckets,
    planning-sized — so the lag/cumsum/moving windows never touch doc
    rows and cannot skew regardless of corpus size."""
    if moving_window < 1:
        raise ValueError("moving_window must be >= 1")
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    meta = docs.select(
        F.col(id_col).alias("doc_id"),
        F.date_format(F.date_trunc(interval, F.col(ts_col)), "yyyy-MM-dd").alias(
            "bucket_start"
        ),
        F.col(metric_col).cast("double").alias("metric"),
    )
    buckets = (
        matched.join(meta, "doc_id")
        .groupBy("query_id", "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("metric").alias("metric_sum"),
        )
    )
    seq = Window.partitionBy("query_id").orderBy(F.asc("bucket_start"))
    cum = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = seq.rowsBetween(-(moving_window - 1), Window.currentRow)
    out = (
        buckets.withColumn("cum_docs", F.sum("n_docs").over(cum))
        .withColumn(
            "deriv_docs", F.col("n_docs") - F.lag("n_docs", 1).over(seq)
        )
        .withColumn(
            "moving_avg_docs", F.round(F.avg("n_docs").over(mov), 6)
        )
        .withColumn(
            "metric_per_doc",
            F.round(F.col("metric_sum") / F.col("n_docs"), 6),
        )
    )
    return out.filter(F.col("n_docs") >= min_doc_count).select(
        "query_id",
        "bucket_start",
        "n_docs",
        "cum_docs",
        "deriv_docs",
        "moving_avg_docs",
        "metric_per_doc",
    )


def rare_terms(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    bucket_col: str | None = None,
    max_doc_count: int = 1,
    top_n: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, term, n_docs, term_rank): the Elasticsearch
    ``rare_terms`` aggregation — the LONG-TAIL counterpart of
    ``terms``: only values appearing in <= ``max_doc_count`` of the
    query's matching documents, ordered count ASC then value asc
    (rarest first), capped at ``top_n``. ``bucket_col`` names the
    keyword field to bucket (the ES shape; cast to string for a
    portable key); ``None`` buckets the ANALYZED TEXT terms of the
    match set instead, with the query's own terms excluded (they match
    every foreground doc by construction) — the significant-text-style
    variant. ES implements rare_terms with a CuckooFilter because a
    coordinator can't hold the tail; here the tail lives in the
    distributed agg and only the <= top_n survivors ship.

    Scale shape: same two joins as ``facet_counts`` — the match set
    collapses to one row per (query, doc) before the value join; the
    (query, value) count is map-side combinable; the <= max_doc_count
    filter runs post-agg (a pre-agg global-df prefilter would be
    wrong: rarity is WITHIN the match set)."""
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
        .select("query_id", "doc_id")
    )
    if bucket_col is None:
        vals = tf.select("doc_id", "term")
    else:
        vals = docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(bucket_col).cast("string").alias("term"),
        )
    counts = (
        matched.join(vals, "doc_id")
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") <= max_doc_count)
    )
    if bucket_col is None:
        counts = counts.join(qt, ["query_id", "term"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(F.asc("n_docs"), F.asc("term"))
    return (
        counts.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= top_n)
        .select("query_id", "term", "n_docs", "term_rank")
    )


def multi_terms(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    key_cols: tuple[str, str],
    top_n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, key1, key2, n_docs, bucket_rank): the Elasticsearch
    ``multi_terms`` aggregation — buckets keyed by a COMPOSITE of two
    fields, ordered by matching-doc count desc (the default terms
    order; ``composite_agg`` is the key-ordered/pageable sibling),
    ties key1 asc then key2 asc, top ``top_n`` per query.

    Scale shape: identical to ``facet_counts`` with a two-column key —
    match set collapses first, one combinable agg, the rank window
    runs over aggregated bucket rows only."""
    k1, k2 = key_cols
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
        .select("query_id", "doc_id")
    )
    vals = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(k1).alias("key1"),
        F.col(k2).alias("key2"),
    )
    buckets = (
        matched.join(vals, "doc_id")
        .groupBy("query_id", "key1", "key2")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_docs"), F.asc("key1"), F.asc("key2")
    )
    return (
        buckets.withColumn("bucket_rank", F.row_number().over(w))
        .filter(F.col("bucket_rank") <= top_n)
        .select("query_id", "key1", "key2", "n_docs", "bucket_rank")
    )


def approx_terms(
    docs: DataFrame,
    bucket_col: str | None = None,
    size: int = 10,
    shard_size: int = 10,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term, doc_count, error_ub, sum_other, term_rank): the
    Elasticsearch ``terms`` aggregation AS IT ACTUALLY RUNS
    DISTRIBUTED — each shard reports only its local top
    ``shard_size`` buckets, the coordinator merges those candidate
    lists, and the approximation error is SURFACED, not silent:

    - ``doc_count`` may undercount (a shard where the term fell below
      its local cutoff contributed nothing);
    - ``error_ub`` is ES's ``doc_count_error_upper_bound``: the sum,
      over shards that did NOT report the term, of that shard's
      smallest reported count (0 for exhausted shards that reported
      every bucket they had — they hide nothing);
    - ``sum_other`` is ``sum_other_doc_count``: total bucket mass not
      in the returned top ``size``.

    Shards are the deterministic md5 bucket of doc_id
    (sampling.sample_bucket) so results are engine-portable and
    oracle-checkable. ``bucket_col`` buckets a keyword field;
    ``None`` buckets the analyzed text's distinct (doc, term) pairs.

    Scale shape (the whole point): the exact global terms agg
    shuffles every (term, count) partial to a term-keyed reducer —
    fine, Spark does it in one combinable agg — but the ES protocol
    caps coordinator traffic at n_shards x shard_size rows no matter
    the vocabulary size. This operator reproduces that contract:
    after the per-shard agg (map-side combinable), everything
    downstream is planning-sized (n_shards x shard_size rows), and
    the window runs over candidates only. Raise shard_size to trade
    error for traffic — exactly ES's knob."""
    from .sampling import sample_bucket

    if bucket_col is None:
        vals = term_freqs(docs, id_col, text_col).select("doc_id", "term")
    else:
        vals = docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(bucket_col).cast("string").alias("term"),
        ).filter(F.col("term").isNotNull())
    counts = (
        vals.withColumn("shard", sample_bucket("doc_id", n_shards))
        .groupBy("shard", "term")
        .agg(F.count(F.lit(1)).alias("dc"))
    )
    w = Window.partitionBy("shard").orderBy(F.desc("dc"), F.asc("term"))
    ranked = counts.withColumn("r", F.row_number().over(w))
    reported = ranked.filter(F.col("r") <= shard_size)
    shard_terms = counts.groupBy("shard").agg(F.count(F.lit(1)).alias("n_terms"))
    cuts = (
        reported.groupBy("shard")
        .agg(F.min("dc").alias("min_dc"))
        .join(shard_terms, "shard")
        .select(
            "shard",
            F.when(F.col("n_terms") > shard_size, F.col("min_dc"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("cut"),
        )
    )
    totals = cuts.agg(F.sum("cut").alias("total_cut")).crossJoin(
        counts.agg(F.sum("dc").alias("grand_total"))
    )
    merged = (
        reported.join(F.broadcast(cuts), "shard")
        .groupBy("term")
        .agg(F.sum("dc").alias("doc_count"), F.sum("cut").alias("rep_cut"))
        .crossJoin(F.broadcast(totals))
        .select(
            "term",
            "doc_count",
            (F.col("total_cut") - F.col("rep_cut")).alias("error_ub"),
            "grand_total",
        )
    )
    wr = Window.orderBy(F.desc("doc_count"), F.asc("term"))
    top = merged.withColumn("term_rank", F.row_number().over(wr)).filter(
        F.col("term_rank") <= size
    )
    wall = Window.partitionBy(F.lit(1))
    return top.select(
        "term",
        "doc_count",
        "error_ub",
        (F.col("grand_total") - F.sum("doc_count").over(wall)).alias("sum_other"),
        "term_rank",
    )


def _matched_values(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    cols: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, doc_id, *cols) for each query's matching doc set
    (>= 1 unique query term) — the shared front half of every metric
    aggregation here. One collapse agg, one pruned value join."""
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    return matched.join(docs.select(F.col(id_col).alias("doc_id"), *cols), "doc_id")


def extended_stats_facets(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    sigma: float = 2.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, n_docs, min_v, max_v, sum_v, avg_v, sum_of_squares,
    variance, std_deviation, std_upper, std_lower) — the Elasticsearch
    ``extended_stats`` aggregation over each query's matching doc set.
    Variance is the POPULATION variance E[x^2] - E[x]^2 (the ES
    definition) and the bounds are avg +/- sigma * std (ES
    ``std_deviation_bounds`` with its default sigma=2).

    Scale shape: everything derives from FOUR combinable sums
    (count, sum, sum of squares, plus min/max) in ONE map-side-partial
    hash agg — no second pass, no window. The raw-moment route (vs
    F.variance) is deliberate: it keeps the aggregation combinable AND
    makes the oracle an exact formula mirror rather than a
    sample-vs-population coin flip."""
    joined = _matched_values(
        spark, docs, queries, [F.col(value_col).cast("double").alias("_v")],
        id_col, text_col,
    )
    base = joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("_v").alias("min_v"),
        F.max("_v").alias("max_v"),
        F.sum("_v").alias("sum_v"),
        F.sum(F.col("_v") * F.col("_v")).alias("sum_of_squares"),
    )
    avg = F.col("sum_v") / F.col("n_docs")
    var = F.col("sum_of_squares") / F.col("n_docs") - avg * avg
    # fp cancellation can leave a tiny negative for constant columns
    var = F.greatest(var, F.lit(0.0))
    std = F.sqrt(var)
    s = F.lit(float(sigma))
    return base.select(
        "query_id", "n_docs", "min_v", "max_v", "sum_v",
        avg.alias("avg_v"),
        "sum_of_squares",
        var.alias("variance"),
        std.alias("std_deviation"),
        (avg + s * std).alias("std_upper"),
        (avg - s * std).alias("std_lower"),
    )


def weighted_avg_facets(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    value_col,
    weight_col,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, n_docs, weighted_avg) — the Elasticsearch
    ``weighted_avg`` aggregation: sum(value * weight) / sum(weight)
    over each query's matching doc set. ``value_col``/``weight_col``
    accept column names or Column expressions (e.g. a token count
    computed from the text). One combinable agg; rows with NULL value
    or weight drop first (the ES contract)."""
    vc = F.col(value_col) if isinstance(value_col, str) else value_col
    wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    joined = _matched_values(
        spark, docs, queries,
        [vc.cast("double").alias("_v"), wc.cast("double").alias("_w")],
        id_col, text_col,
    ).filter(F.col("_v").isNotNull() & F.col("_w").isNotNull())
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.col("_v") * F.col("_w")) / F.sum("_w")).alias("weighted_avg"),
    )


def matrix_stats_facets(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    x_col,
    y_col,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, n_docs, mean_x, mean_y, var_x, var_y, skew_x,
    skew_y, kurt_x, kurt_y, covariance, correlation) — the
    Elasticsearch ``matrix_stats`` aggregation for a two-field matrix
    over each query's matching doc set. Population moments throughout:
    var = m2, skewness = m3 / m2^1.5, kurtosis = m4 / m2^2 (plain,
    not excess), covariance = E[xy] - E[x]E[y], correlation =
    cov / (std_x * std_y).

    Scale shape: ONE combinable hash agg of raw power sums (x..x^4,
    y..y^4, xy) — the same map-side-partial shape ES's streaming
    moment sketch has, and an exact formula mirror for the oracle
    (built-in skewness/kurtosis differ between engines on
    sample-bias correction, so they're deliberately avoided)."""
    xc = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("double")
    yc = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("double")
    joined = _matched_values(
        spark, docs, queries, [xc.alias("_x"), yc.alias("_y")], id_col, text_col
    )
    x, y = F.col("_x"), F.col("_y")
    base = joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"), F.sum(x * x).alias("sx2"),
        F.sum(x * x * x).alias("sx3"), F.sum(x * x * x * x).alias("sx4"),
        F.sum(y).alias("sy"), F.sum(y * y).alias("sy2"),
        F.sum(y * y * y).alias("sy3"), F.sum(y * y * y * y).alias("sy4"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")

    def moments(s1, s2, s3, s4):
        m = F.col(s1) / n
        m2 = F.greatest(F.col(s2) / n - m * m, F.lit(0.0))
        m3 = F.col(s3) / n - 3 * m * F.col(s2) / n + 2 * m * m * m
        m4 = (
            F.col(s4) / n
            - 4 * m * F.col(s3) / n
            + 6 * m * m * F.col(s2) / n
            - 3 * m * m * m * m
        )
        return m, m2, m3, m4

    mx, m2x, m3x, m4x = moments("sx", "sx2", "sx3", "sx4")
    my, m2y, m3y, m4y = moments("sy", "sy2", "sy3", "sy4")
    cov = F.col("sxy") / n - mx * my
    return base.select(
        "query_id",
        F.col("n").alias("n_docs"),
        mx.alias("mean_x"), my.alias("mean_y"),
        m2x.alias("var_x"), m2y.alias("var_y"),
        (m3x / F.pow(m2x, 1.5)).alias("skew_x"),
        (m3y / F.pow(m2y, 1.5)).alias("skew_y"),
        (m4x / (m2x * m2x)).alias("kurt_x"),
        (m4y / (m2y * m2y)).alias("kurt_y"),
        cov.alias("covariance"),
        (cov / F.sqrt(m2x * m2y)).alias("correlation"),
    )


def t_test_facets(
    spark: SparkSession,
    docs: DataFrame,
    populations: list[tuple[int, str, str]],
    value_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, n_a, n_b, mean_a, mean_b, t_stat) — the
    Elasticsearch ``t_test`` aggregation, ``type: independent``
    (Welch): for each (query_id, term_a, term_b) row, population A =
    docs containing term_a, B = docs containing term_b, and
    t = (mean_a - mean_b) / sqrt(s2_a/n_a + s2_b/n_b) with SAMPLE
    variances s2 = (sum_sq - n*mean^2) / (n - 1).

    Scale shape: both populations come out of ONE combinable agg over
    the term-filtered token stream (term IN the union of filters),
    grouped (query, side); the Welch arithmetic is a driver-free
    two-row join. Populations of size < 2 yield NULL t (undefined
    variance), matching ES returning null."""
    spec = [
        (int(qid), ta.strip().lower(), tb.strip().lower())
        for qid, ta, tb in populations
        if ta.strip() and tb.strip()
    ]
    sides = [(qid, t, side) for qid, ta, tb in spec for side, t in (("a", ta), ("b", tb))]
    qt = spark.createDataFrame(sides, "query_id long, term string, side string")
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .select("query_id", "side", "doc_id")
        .distinct()
    )
    vals = matched.join(
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(value_col).cast("double").alias("_v")
        ),
        "doc_id",
    )
    agg = vals.groupBy("query_id", "side").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_v").alias("s1"),
        F.sum(F.col("_v") * F.col("_v")).alias("s2"),
    )
    a = agg.filter(F.col("side") == "a").select(
        "query_id", F.col("n").alias("n_a"), F.col("s1").alias("s1a"), F.col("s2").alias("s2a")
    )
    b = agg.filter(F.col("side") == "b").select(
        "query_id", F.col("n").alias("n_b"), F.col("s1").alias("s1b"), F.col("s2").alias("s2b")
    )
    j = a.join(b, "query_id")
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ma, mb = F.col("s1a") / na, F.col("s1b") / nb
    va = (F.col("s2a") - na * ma * ma) / (na - 1)
    vb = (F.col("s2b") - nb * mb * mb) / (nb - 1)
    t = (ma - mb) / F.sqrt(va / na + vb / nb)
    return j.select(
        "query_id", "n_a", "n_b",
        ma.alias("mean_a"), mb.alias("mean_b"),
        F.when((F.col("n_a") > 1) & (F.col("n_b") > 1), t).alias("t_stat"),
    )


def percentile_ranks_facets(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    values: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, value, pct_rank) — the Elasticsearch
    ``percentile_ranks`` aggregation, exact form: for each probe value
    v, the percentage of the query's matching docs whose ``value_col``
    is <= v (ES's t-digest interpolates; the exact definition here is
    the one DuckDB can mirror, and is what ES converges to).

    Scale shape: ONE combinable agg — each probe value becomes a
    codegen'd conditional-count column, so the pass over the match
    set is single and map-side partial regardless of len(values)."""
    if not values:
        raise ValueError("need at least one probe value")
    joined = _matched_values(
        spark, docs, queries, [F.col(value_col).cast("double").alias("_v")],
        id_col, text_col,
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, v in enumerate(values):
        aggs.append(
            F.sum(F.when(F.col("_v") <= float(v), 1).otherwise(0)).alias(f"c{i}")
        )
    base = joined.groupBy("query_id").agg(*aggs)
    parts = []
    for i, v in enumerate(values):
        parts.append(
            base.select(
                "query_id",
                F.lit(float(v)).alias("value"),
                (100.0 * F.col(f"c{i}") / F.col("n")).alias("pct_rank"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mad_facets(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, n_docs, median_v, mad) — the Elasticsearch
    ``median_absolute_deviation`` aggregation, exact form:
    median(|v - median(v)|) with linear-interpolation medians (ES
    itself is t-digest-approximate; the exact form is
    oracle-portable).

    Scale shape: two exact-percentile passes (each a per-query sort)
    with a broadcast of the per-query medians between them. At the
    10^12-doc target swap ``F.percentile`` for ``percentile_approx``
    — same plan minus the sorts, as the docstring of
    ccnet_perplexity_buckets discusses."""
    joined = _matched_values(
        spark, docs, queries, [F.col(value_col).cast("double").alias("_v")],
        id_col, text_col,
    )
    med = joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.percentile("_v", 0.5).alias("median_v"),
    )
    dev = joined.join(F.broadcast(med.select("query_id", "median_v")), "query_id")
    mad = dev.groupBy("query_id").agg(
        F.percentile(F.abs(F.col("_v") - F.col("median_v")), 0.5).alias("mad")
    )
    return med.join(mad, "query_id").select("query_id", "n_docs", "median_v", "mad")


def top_metrics_facets(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    sort_col: str,
    metric_cols: list[str],
    size: int = 1,
    ascending: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, mrank, doc_id, sort value, *metrics) — the
    Elasticsearch ``top_metrics`` aggregation: the metric values of
    the ``size`` docs at the top of a doc-value sort over each query's
    match set (ties: doc_id asc, the engine convention).

    Scale shape: the shared match-collapse + value join, then ONE
    window rank per query over the match set — identical cost to
    sort_by_docvalue; metrics ride the same pruned projection."""
    cols = [F.col(sort_col).cast("double").alias("_sort")] + [
        F.col(c).alias(c) for c in metric_cols
    ]
    joined = _matched_values(spark, docs, queries, cols, id_col, text_col)
    order = F.asc("_sort") if ascending else F.desc("_sort")
    w = Window.partitionBy("query_id").orderBy(order, F.asc("doc_id"))
    return (
        joined.withColumn("mrank", F.row_number().over(w))
        .filter(F.col("mrank") <= size)
        .select("query_id", "mrank", "doc_id", F.col("_sort").alias(sort_col + "_sort"), *metric_cols)
    )


AUTO_HIST_LADDER = ("day", "week", "month", "quarter", "year")


def auto_date_histogram(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    ts_col: str,
    target_buckets: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, interval, bucket_start, n_docs) — the Elasticsearch
    ``auto_date_histogram`` aggregation: per query, the FINEST
    calendar interval from the day/week/month/quarter/year ladder
    whose non-empty bucket count is <= ``target_buckets``, then the
    distinct-matching-doc histogram at that interval (falling back to
    ``year`` when even that overflows — ES caps at its coarsest unit
    the same way). Deterministic by construction: the choice is made
    on ACTUAL non-empty bucket counts (min_doc_count=1 semantics, like
    ``date_histogram``), not on span arithmetic, so the DuckDB oracle
    reproduces interval choice and counts exactly.

    Scale shape: the (query, doc) match set collapses once (same plan
    as date_histogram); each match row then fans out to the 5 ladder
    truncations — a x5 row multiplier on the MATCH SET (queries x
    matched docs, never the corpus) — and both the per-interval bucket
    counts and the final histogram come from the same combinable hash
    agg keyed (query, interval, bucket). One extra tiny broadcast
    joins the per-query chosen interval back."""
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    buckets = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(u).alias("interval"),
                        F.date_format(
                            F.date_trunc(u, F.col(ts_col)), "yyyy-MM-dd"
                        ).alias("bucket_start"),
                    )
                    for u in AUTO_HIST_LADDER
                ]
            )
        ).alias("ub"),
    ).select("doc_id", F.col("ub.interval").alias("interval"), F.col("ub.bucket_start").alias("bucket_start"))
    hist = (
        matched.join(buckets, "doc_id")
        .groupBy("query_id", "interval", "bucket_start")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    n_buckets = hist.groupBy("query_id", "interval").agg(
        F.count(F.lit(1)).alias("nb")
    )
    # finest fitting interval; ladder position = specificity
    pos = F.array_position(F.array(*[F.lit(u) for u in AUTO_HIST_LADDER]), F.col("interval"))
    fitting = n_buckets.filter(
        (F.col("nb") <= target_buckets) | (F.col("interval") == AUTO_HIST_LADDER[-1])
    )
    w = Window.partitionBy("query_id").orderBy(pos.asc())
    chosen = (
        fitting.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("query_id", "interval")
    )
    return hist.join(F.broadcast(chosen), ["query_id", "interval"]).select(
        "query_id", "interval", "bucket_start", "n_docs"
    )


def boxplot_facets(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, n_docs, min_v, q1, q2, q3, max_v, iqr, lower_fence,
    upper_fence) — the Elasticsearch ``boxplot`` aggregation over each
    query's full matching doc set, EXACT with linear interpolation
    (ES computes quartiles with TDigest; the contract pins the exact
    R-7 variant so the DuckDB ``quantile_cont`` oracle is
    bit-comparable). Fences are the Tukey 1.5*IQR whisker limits ES
    exposes around the box.

    Scale shape: identical to ``percentiles_facets`` — one collapse
    agg over the match set, one pruned value join, one per-query
    ``percentile`` aggregate whose buffer is bounded by the match-set
    size (swap to ``percentile_approx`` for corpus-scale groups, the
    ES-default behavior, at the cost of oracle exactness)."""
    joined = _matched_values(
        spark, docs, queries, [F.col(value_col).cast("double").alias("_v")],
        id_col, text_col,
    )
    base = joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("_v").alias("min_v"),
        F.max("_v").alias("max_v"),
        F.percentile(F.col("_v"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias("qs"),
    )
    q1 = F.col("qs")[0]
    q2 = F.col("qs")[1]
    q3 = F.col("qs")[2]
    iqr = q3 - q1
    return base.select(
        "query_id", "n_docs", "min_v",
        q1.alias("q1"), q2.alias("q2"), q3.alias("q3"),
        "max_v",
        iqr.alias("iqr"),
        (q1 - F.lit(1.5) * iqr).alias("lower_fence"),
        (q3 + F.lit(1.5) * iqr).alias("upper_fence"),
    )


def string_stats_facets(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    field_col: str = "text",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, n_docs, min_length, max_length, avg_length, entropy)
    — the Elasticsearch ``string_stats`` aggregation (with
    ``show_distribution``'s underlying character model) over each
    query's matching doc set: length stats of the field plus the
    Shannon entropy (log2) of the CHARACTER distribution across all
    matched values, exactly as ES computes it from per-character
    counts.

    Scale shape: two combinable hash aggs. The length stats are one
    (count/min/max/avg) agg over the match set. The entropy pass
    explodes the field into characters — a row per char, but the
    (query_id, char) count agg is map-side combinable, so the SHUFFLE
    volume is bounded by partitions x alphabet x queries, never by
    corpus characters; the final per-query entropy folds the tiny
    (query, char, count) table."""
    joined = _matched_values(
        spark, docs, queries, [F.col(field_col).alias("_t")], id_col, text_col
    )
    lens = joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(F.length("_t")).alias("min_length"),
        F.max(F.length("_t")).alias("max_length"),
        F.avg(F.length("_t")).alias("avg_length"),
    )
    chars = (
        joined.select("query_id", F.explode(F.split(F.col("_t"), "")).alias("ch"))
        .groupBy("query_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ent = (
        chars.withColumn(
            "n", F.sum("c").over(Window.partitionBy("query_id"))
        )
        .groupBy("query_id")
        .agg(
            (-F.sum(
                (F.col("c") / F.col("n")) * F.log2(F.col("c") / F.col("n"))
            )).alias("entropy")
        )
    )
    return lens.join(ent, "query_id").select(
        "query_id", "n_docs", "min_length", "max_length", "avg_length", "entropy"
    )


def diversified_sampler_stats(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    dedup_col: str = "lang",
    max_docs_per_value: int = 3,
    shard_size: int = 100,
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, n_docs, avg_v) — the Elasticsearch
    ``diversified_sampler`` aggregation: per query, rank the matching
    docs by BM25 relevance, keep at most ``max_docs_per_value`` docs
    per distinct ``dedup_col`` value (best-first — ES's
    de-biasing of samples dominated by one host/language), cap the
    surviving sample at ``shard_size``, then run the metric sub-agg
    (count + avg of ``value_col``) over that sample. Deterministic by
    the engine tie rule (score round-6 desc, doc_id asc), so the
    DuckDB oracle reproduces the sample exactly.

    Scale shape: relevance ranking is the scorer's existing plan; the
    diversity pass is two windows over the per-query candidate set
    (bounded by the match set, further cut by shard_size), never the
    corpus; the sub-agg is one combinable hash agg."""
    from .bm25 import TIE_DECIMALS, bm25_scores_bruteforce, query_terms

    qt = query_terms(spark, queries)
    scored = bm25_scores_bruteforce(docs, qt, 1.2, 0.75)
    vals = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(dedup_col).alias("_dv"),
        F.col(value_col).cast("double").alias("_v"),
    )
    ranked = scored.join(vals, "doc_id")
    per_value = Window.partitionBy("query_id", "_dv").orderBy(
        F.desc(F.round("score", TIE_DECIMALS)), F.asc("doc_id")
    )
    overall = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", TIE_DECIMALS)), F.asc("doc_id")
    )
    sample = (
        ranked.withColumn("vrk", F.row_number().over(per_value))
        .filter(F.col("vrk") <= max_docs_per_value)
        .withColumn("srk", F.row_number().over(overall))
        .filter(F.col("srk") <= shard_size)
    )
    return sample.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("_v").alias("avg_v")
    )


def filters_facets(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    filters: list[tuple[str, str]],
    other_bucket: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, bucket, n_docs) — the Elasticsearch ``filters``
    aggregation: per query, one NAMED bucket per predicate counting the
    matching documents that satisfy it. Buckets may OVERLAP (a doc can
    satisfy several predicates — each counts it; unlike ``range``/
    ``terms``, ``filters`` is not a partition), every named bucket is
    always present (count 0 included, the ES response contract), and
    with ``other_bucket`` the ``_other_`` bucket counts matching docs
    that satisfy NO predicate.

    ``filters`` are ``(name, predicate)`` pairs where the predicate is
    an ANSI-SQL boolean expression over the document columns (the
    portable Spark∩DuckDB subset, same discipline as the regex/scrub
    operators), so the DuckDB oracle evaluates the identical text.

    Reference parity: none — the reference has no aggregations; this is
    the fulltext query surface (SURVEY.md §2.6 extensions).

    Scale shape (100 TB): the (query, doc) match set collapses to one
    row per pair before the metadata join (the ``facet_counts`` shape);
    ALL buckets then come out of ONE combinable hash agg per query —
    one conditional-sum column per predicate, codegen'd when-chains, no
    per-bucket scan (ES runs one query per filter; columnar lets us run
    them all in a single pass) — and the unpivot to (bucket, n_docs)
    rows runs over query-count-sized aggregate rows."""
    if not filters:
        raise ValueError("filters must be non-empty")
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    per_doc = matched.join(
        docs.withColumnRenamed(id_col, "doc_id"), "doc_id"
    )
    aggs = [
        F.sum(F.when(F.expr(pred), F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias(f"_b{i}")
        for i, (_, pred) in enumerate(filters)
    ]
    names = [name for name, _ in filters]
    if other_bucket:
        none_pred = " AND ".join(f"NOT ({pred})" for _, pred in filters)
        aggs.append(
            F.sum(F.when(F.expr(none_pred), F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias("_bother")
        )
        names = names + ["_other_"]
    row = per_doc.groupBy("query_id").agg(*aggs)
    cols = [f"_b{i}" for i in range(len(filters))] + (
        ["_bother"] if other_bucket else []
    )
    pairs = ", ".join(f"'{n}', {c}" for n, c in zip(names, cols))
    return row.selectExpr(
        "query_id", f"stack({len(names)}, {pairs}) AS (bucket, n_docs)"
    )


def missing_facets(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    field_expr: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, n_missing, n_present) — the Elasticsearch ``missing``
    aggregation: per query, how many matching documents have NO value
    for a field (NULL), alongside the populated count. ``field_expr``
    is an ANSI-SQL expression over the document columns (portable
    Spark∩DuckDB subset) so sparsely-populated fields can be derived
    on corpora whose parquet schema is fully dense.

    Scale shape: identical to ``facet_counts`` — match-set collapse,
    one doc-keyed metadata join, one combinable agg; the NULL test is a
    codegen'd expression, never a UDF."""
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    per_doc = matched.join(
        docs.withColumnRenamed(id_col, "doc_id"), "doc_id"
    ).withColumn("_f", F.expr(field_expr))
    return per_doc.groupBy("query_id").agg(
        F.sum(F.when(F.col("_f").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_missing"),
        F.sum(F.when(F.col("_f").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_present"),
    )


def global_facets(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, matched_docs, matched_avg, global_docs, global_avg) —
    the Elasticsearch ``global`` aggregation: a bucket that ESCAPES the
    query scope, so corpus-wide metrics can be reported next to the
    query-scoped ones (the classic use: "avg price in results vs avg
    price in the whole catalog"). Averages round 6dp for fp-stable
    cross-engine comparison.

    Scale shape: the query-scoped side is the ``facet_counts`` plan;
    the global side is ONE corpus aggregation producing a single row,
    broadcast-joined (literally a cross join of a 1-row table) onto the
    per-query rows — computed once, not per query."""
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    vals = docs.select(
        F.col(id_col).alias("doc_id"), F.col(value_col).cast("double").alias("_v")
    )
    scoped = (
        matched.join(vals, "doc_id")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("matched_docs"),
            F.round(F.avg("_v"), 6).alias("matched_avg"),
        )
    )
    glob = vals.agg(
        F.count(F.lit(1)).alias("global_docs"),
        F.round(F.avg("_v"), 6).alias("global_avg"),
    )
    return scoped.crossJoin(F.broadcast(glob))


def serial_diff_topn(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    ts_col: str,
    lag: int = 2,
    size: int = 5,
    interval: str = "week",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, bucket_start, n_docs, serial_diff_docs, sort_rank) —
    two more ES pipeline aggregations over the weekly date_histogram of
    matching documents:

    - ``serial_diff`` with period ``lag``: bucket count minus the count
      ``lag`` non-empty buckets earlier in bucket order (null while no
      predecessor exists — ES emits no value there); the seasonality
      detrending primitive (lag=7 on daily buckets removes the weekly
      cycle).
    - ``bucket_sort``: buckets re-ranked by doc count (desc, date asc
      tiebreak) and truncated to the top ``size`` per query. Evaluated
      LAST, after sibling pipeline metrics (the ES pipeline order used
      by ``pipeline_aggs``'s bucket_selector too), so a surviving
      bucket's serial_diff still references its true predecessor even
      when that predecessor is truncated away.

    Scale shape: identical to ``pipeline_aggs`` — match-set collapse,
    one (query, bucket) combinable hash agg, then every window runs
    over the n_queries x n_buckets aggregate rows, never doc rows."""
    if lag < 1:
        raise ValueError("lag must be >= 1")
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    meta = docs.select(
        F.col(id_col).alias("doc_id"),
        F.date_format(F.date_trunc(interval, F.col(ts_col)), "yyyy-MM-dd").alias(
            "bucket_start"
        ),
    )
    buckets = (
        matched.join(meta, "doc_id")
        .groupBy("query_id", "bucket_start")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    seq = Window.partitionBy("query_id").orderBy(F.asc("bucket_start"))
    rank_w = Window.partitionBy("query_id").orderBy(
        F.desc("n_docs"), F.asc("bucket_start")
    )
    return (
        buckets.withColumn(
            "serial_diff_docs", F.col("n_docs") - F.lag("n_docs", lag).over(seq)
        )
        .withColumn("sort_rank", F.row_number().over(rank_w))
        .filter(F.col("sort_rank") <= size)
        .select(
            "query_id", "bucket_start", "n_docs", "serial_diff_docs", "sort_rank"
        )
    )


def sibling_bucket_stats(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    ts_col: str,
    interval: str = "week",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, n_buckets, sum_docs, avg_docs, min_docs, min_keys,
    max_docs, max_keys, std_docs, median_docs) — the Elasticsearch
    SIBLING pipeline aggregation family (``sum_bucket`` /
    ``avg_bucket`` / ``min_bucket`` / ``max_bucket`` /
    ``extended_stats_bucket`` / ``percentiles_bucket``) computed over
    the doc counts of a ``date_histogram`` of matching documents: one
    row PER QUERY summarizing its whole bucket series.

    ES response contracts kept:

    - ``min_bucket``/``max_bucket`` return the extreme value AND the
      list of bucket keys attaining it (several buckets can tie);
      ``min_keys``/``max_keys`` are those keys, date-ascending,
      comma-joined (arrays hash unstably across engines).
    - ``extended_stats_bucket`` std deviation is POPULATION (the ES
      default, sigma over the bucket values, not a sample estimate).
    - ``percentiles_bucket`` interpolates exactly over the sorted
      bucket values (Spark ``percentile`` == linear interpolation ==
      DuckDB ``quantile_cont``); the 50th percentile ships as
      ``median_docs``.

    Reference parity: none — the reference has no aggregations
    (SURVEY.md §2.6 extensions).

    Scale shape (100 TB): the (query, doc) match set collapses before
    the metadata join and the bucket rows are one combinable hash agg;
    the sibling statistics then aggregate n_queries x n_buckets rows —
    planning-sized, no window over doc rows anywhere. The tie-key
    arrays stay bounded by the bucket count (365 weekly buckets/year),
    never the corpus."""
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    meta = docs.select(
        F.col(id_col).alias("doc_id"),
        F.date_format(F.date_trunc(interval, F.col(ts_col)), "yyyy-MM-dd").alias(
            "bucket_start"
        ),
    )
    buckets = (
        matched.join(meta, "doc_id")
        .groupBy("query_id", "bucket_start")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    per = buckets.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("n_docs").alias("sum_docs"),
        F.round(F.avg("n_docs"), 6).alias("avg_docs"),
        F.min("n_docs").alias("min_docs"),
        F.max("n_docs").alias("max_docs"),
        F.round(F.stddev_pop("n_docs"), 6).alias("std_docs"),
        F.round(F.expr("percentile(n_docs, 0.5)"), 6).alias("median_docs"),
        F.sort_array(F.collect_list(F.struct("n_docs", "bucket_start"))).alias(
            "_kv"
        ),
    )
    per = per.withColumn(
        "min_keys",
        F.array_join(
            F.expr("transform(filter(_kv, x -> x.n_docs = min_docs), x -> x.bucket_start)"),
            ",",
        ),
    ).withColumn(
        "max_keys",
        F.array_join(
            F.expr("transform(filter(_kv, x -> x.n_docs = max_docs), x -> x.bucket_start)"),
            ",",
        ),
    )
    return per.select(
        "query_id",
        "n_buckets",
        "sum_docs",
        "avg_docs",
        "min_docs",
        "min_keys",
        "max_docs",
        "max_keys",
        "std_docs",
        "median_docs",
    )


def rate_histogram(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    ts_col: str,
    interval: str = "month",
    unit: str = "day",
    metric_col: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, bucket_start, n_docs, divisor, rate_docs
    [, rate_metric]) — the Elasticsearch ``rate`` aggregation inside a
    ``date_histogram``: each bucket's doc count (and optionally the sum
    of ``metric_col``) normalized to a per-``unit`` rate. The division
    is CALENDAR-AWARE like ES: a monthly bucket divides by THAT month's
    day count (28-31, ``day(last_day(bucket))``), a weekly bucket by a
    constant 7 — so February's rate is comparable to March's.

    Supported (interval, unit): (month, day), (week, day) — the pairs
    the corpus timestamps exercise; others raise (ES likewise rejects
    a unit coarser than the interval).

    Scale shape: identical to ``date_histogram`` — match-set collapse,
    one combinable (query, bucket) hash agg; the divisor is pure date
    arithmetic on the planning-sized bucket rows."""
    if (interval, unit) not in (("month", "day"), ("week", "day")):
        raise ValueError(f"unsupported rate pair ({interval}, {unit})")
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.lit(1).alias("one"))
    )
    cols = [
        F.col(id_col).alias("doc_id"),
        F.date_trunc(interval, F.col(ts_col)).cast("date").alias("_bucket"),
    ]
    if metric_col is not None:
        cols.append(F.col(metric_col).cast("double").alias("metric"))
    meta = docs.select(*cols)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if metric_col is not None:
        aggs.append(F.sum("metric").alias("metric_sum"))
    buckets = matched.join(meta, "doc_id").groupBy("query_id", "_bucket").agg(*aggs)
    divisor = (
        F.dayofmonth(F.last_day(F.col("_bucket"))).cast("double")
        if interval == "month"
        else F.lit(7.0)
    )
    out = (
        buckets.withColumn("divisor", divisor)
        .withColumn("rate_docs", F.round(F.col("n_docs") / F.col("divisor"), 6))
        .withColumn("bucket_start", F.date_format("_bucket", "yyyy-MM-dd"))
    )
    sel = ["query_id", "bucket_start", "n_docs", "divisor", "rate_docs"]
    if metric_col is not None:
        out = out.withColumn(
            "rate_metric", F.round(F.col("metric_sum") / F.col("divisor"), 6)
        )
        sel.append("rate_metric")
    return out.select(*sel)


def normalize_histogram(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    ts_col: str,
    interval: str = "week",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, bucket_start, n_docs, pct_of_sum, rescaled, zscore)
    — the Elasticsearch ``normalize`` pipeline aggregation over a
    ``date_histogram`` of matching docs, all three standard methods at
    once per non-empty bucket:

    - ``pct_of_sum``  — bucket count / sum of the query's counts;
    - ``rescaled``    — (v - min) / (max - min), the ``rescale_0_1``
      method (0.0 when every bucket has the same count — the
      degenerate range, emitted rather than NaN);
    - ``zscore``      — (v - mean) / stddev_pop (0.0 on zero
      variance, same guard).

    Scale shape: inherits ``date_histogram`` (one combinable hash agg
    keyed (query, bucket)); the normalize windows run per query over
    the AGGREGATED bucket rows — n_queries x n_buckets, planning-sized
    — exactly like ``pipeline_aggs``."""
    buckets = date_histogram(
        spark, docs, queries, ts_col, interval, id_col, text_col
    )
    w = Window.partitionBy("query_id")
    v = F.col("n_docs").cast("double")
    total = F.sum(v).over(w)
    vmin, vmax = F.min(v).over(w), F.max(v).over(w)
    mean, sd = F.avg(v).over(w), F.stddev_pop(v).over(w)
    rng = vmax - vmin
    return buckets.select(
        "query_id",
        "bucket_start",
        "n_docs",
        F.round(v / total, 6).alias("pct_of_sum"),
        F.round(
            F.when(rng == 0, F.lit(0.0)).otherwise((v - vmin) / rng), 6
        ).alias("rescaled"),
        F.round(
            F.when(sd == 0, F.lit(0.0)).otherwise((v - mean) / sd), 6
        ).alias("zscore"),
    )
