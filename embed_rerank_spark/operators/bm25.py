"""BM25 (Okapi) scoring as declarative DataFrame plans.

This is the engine's *oracle-grade* scorer: a pure ``pyspark.sql``
plan (joins + hash aggregations, zero Python in the hot path) that
Catalyst compiles to whole-stage-codegen'd JVM code. The compressed
block-max WAND path (``operators/wand.py``) must reproduce these
scores exactly; both share the constants and formula here.

Formula (k1/b Okapi, the engine's pinned semantics):

    idf(t)     = ln((N - df + 0.5) / (df + 0.5) + 1)
    tfpart     = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    score(q,d) = sum over unique query terms t of idf(t)*tfpart(t,d)

The reference repo has no BM25 (its first stage is the serving loop we
replace); constants k1=1.2, b=0.75 are the standard Robertson/Lucene
defaults, fixed as engine semantics (SURVEY.md §2.6).

Scale notes (100 TB / 10^12 docs):
- ``term_freqs`` is one map-side-combinable hash agg keyed
  (doc_id, term); no row explosion survives the first agg.
- ``doc_freqs`` aggregates the tf table (already 1 row per
  (doc,term)), so the "the"-style hot terms cost one long partial-agg
  chain, not a shuffle of raw token rows. AQE handles residual skew.
- query->postings joins broadcast the (tiny) query-term side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1
from ..functions.udfs import tokenize_for_scoring


def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """doc -> one row per token occurrence (lowercased whitespace)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_for_scoring(F.col(text_col))).alias("term"),
    )


def term_freqs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf) — map-side combinable hash aggregation."""
    return tokens(docs, id_col, text_col).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def term_freqs_dl(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf, dl) in ONE aggregation: dl (= size of the
    token array) rides along on every exploded token row and survives
    the map-side combine as ``first(dl)`` — this removes the
    tf-join-doc_lengths shuffle that a separate dl table would cost
    (one full extra shuffle of the tf table at 100 TB)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize_for_scoring(F.col(text_col)).alias("toks")
    )
    return (
        toks.select(
            "doc_id", F.explode("toks").alias("term"), F.size("toks").alias("dl")
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )


def doc_lengths(tf: DataFrame) -> DataFrame:
    """(doc_id, dl) from the tf table (dl = total token occurrences)."""
    return tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))


def doc_lengths_direct(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, dl) straight from the text — a shuffle-free projection
    (docs with zero tokens are excluded, matching ``doc_lengths``)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenize_for_scoring(F.col(text_col))).alias("dl"),
    ).filter(F.col("dl") > 0)


def corpus_stats(dl: DataFrame) -> DataFrame:
    """Single row (n_docs, avgdl) over docs with >=1 token."""
    return dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )


def doc_freqs(tf: DataFrame) -> DataFrame:
    """(term, df) — document frequency."""
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def query_terms(spark: SparkSession, queries: list[tuple[int, str]]) -> DataFrame:
    """(query_id, term) with UNIQUE terms per query (engine semantics:
    query term multiplicity is ignored, Lucene-style)."""
    qdf = spark.createDataFrame(queries, "query_id long, query string")
    return qdf.select(
        "query_id",
        F.explode(F.array_distinct(tokenize_for_scoring(F.col("query")))).alias("term"),
    )


def bm25_scores_bruteforce(
    docs: DataFrame,
    qterms: DataFrame,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, doc_id, score) for every doc sharing >=1 term with the
    query. Declarative plan: Catalyst broadcasts the query-term side
    (tiny) into the tf scan, so the only big shuffles are the two hash
    aggs building tf and df."""
    tfdl = term_freqs_dl(docs, id_col, text_col)
    dl = doc_lengths_direct(docs, id_col, text_col)
    stats = corpus_stats(dl)
    df = doc_freqs(tfdl)

    idf = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .select("term", "idf", "avgdl")
    )

    matched = (
        F.broadcast(qterms)
        .join(tfdl, "term")
        .join(idf, "term")
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return matched.groupBy("query_id", "doc_id").agg(F.sum("term_score").alias("score"))


TIE_DECIMALS = 6


def topk(scored: DataFrame, k: int, score_col: str = "score") -> DataFrame:
    """Exact per-query top-k with the engine's pinned tie semantics:
    score (rounded to TIE_DECIMALS) desc, then doc_id asc.

    Rounding in the ORDER BY makes ranking invariant to ulp-level
    float-summation-order noise, so ranks are reproducible across
    executions, engines (DuckDB oracle), and the WAND path. The
    doc_id-asc tiebreak reproduces the reference's stable descending
    sort (``reranking_service.py:183-186``: Python Timsort keeps input
    order for ties, and input order is ascending index)."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col(score_col), TIE_DECIMALS)), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def bm25_topk_bruteforce(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """End-to-end brute-force BM25 retrieval: (query_id, doc_id, score,
    rank), rank 1..k per query."""
    qt = query_terms(spark, queries)
    scored = bm25_scores_bruteforce(docs, qt, k1, b)
    return topk(scored, k).select("query_id", "rank", "doc_id", "score")


def diversify_topk(
    scored: DataFrame,
    doc_meta: DataFrame,
    n_per_group: int,
    k: int,
    group_col: str = "source",
    score_col: str = "score",
) -> DataFrame:
    """Search-result diversification: re-rank per query keeping at
    most ``n_per_group`` results from any one group (domain/source),
    then take the top-k of the survivors — the standard SERP
    host-crowding rule, as two windows over the (tiny) scored result
    set. ``scored``: (query_id, doc_id, score) candidates (typically a
    deep-k retrieval); ``doc_meta``: (doc_id, group_col). Engine tie
    semantics throughout. Scale shape: windows partition by query over
    candidate rows only (n_queries x deep_k), never the corpus; the
    meta join broadcasts the candidate side into the meta scan."""
    w_group = Window.partitionBy("query_id", group_col).orderBy(
        F.desc(F.round(F.col(score_col), TIE_DECIMALS)), F.asc("doc_id")
    )
    cands = F.broadcast(scored).join(
        doc_meta.select("doc_id", group_col), "doc_id"
    )
    surviving = cands.withColumn("grp_rank", F.row_number().over(w_group)).filter(
        F.col("grp_rank") <= n_per_group
    )
    return topk(surviving.drop("rank"), k).select(
        "query_id", "rank", "doc_id", score_col, group_col
    )


def docvalue_range_topk(
    spark: SparkSession,
    docs: DataFrame,
    doc_values: DataFrame,
    queries: list[tuple[int, str]],
    lo,
    hi,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    value_col: str = "value",
) -> DataFrame:
    """Doc-value RANGE-filtered BM25 retrieval (the date-range /
    numeric-filter drill-down every search UI has): top-k over docs
    whose ``doc_values.value`` satisfies ``lo <= value < hi``, scored
    with FULL-corpus statistics — idf/avgdl/N unchanged by the filter,
    the same filtered-retrieval convention as
    ``wand_topk(allowed_docs=...)`` (Lucene filter-context semantics:
    a filter narrows the candidate set, never re-weights terms).

    Unlike the ACL path (a small driver-side allowed list), the range
    predicate stays DISTRIBUTED: ``doc_values`` is filtered
    declaratively and semi-joined against the match stream, so an
    arbitrarily large in-range set never touches the driver. Scale
    shape: on a time-partitioned corpus (e.g. Iceberg ``days(warc_ts)``
    partitioning — `sources/web_tables.py`), Catalyst pushes the same
    range predicate into the doc-values scan and prunes whole
    partitions; the semi-join broadcasts whichever side AQE measures
    as small."""
    qterms = query_terms(spark, queries)
    scored = bm25_scores_bruteforce(docs, qterms, k1, b)
    in_range = doc_values.filter(
        (F.col(value_col) >= lo) & (F.col(value_col) < hi)
    ).select("doc_id")
    return topk(scored.join(in_range, "doc_id", "left_semi"), k).select(
        "query_id", "rank", "doc_id", "score"
    )


def rescore_by_recency(
    candidates: DataFrame,
    doc_values: DataFrame,
    k: int = 10,
    now: float = 365.0,
    half_life: float = 90.0,
    value_col: str = "value",
    score_col: str = "score",
) -> DataFrame:
    """Function-score RESCORE window (Elasticsearch ``rescore`` /
    ``function_score`` with an exponential recency decay): re-rank a
    first-stage candidate window by

        combined = score * 0.5 ^ ((now - value) / half_life)

    where ``value`` is the doc's timestamp doc-value (same unit as
    ``now``; days, typically). ``candidates``: (query_id, doc_id,
    score) rows — a DEEP top-k from the first stage (``wand_topk(k=
    window)``), so the multiplicative boost only ever reorders within
    the window it was given, the standard two-stage rescore contract.
    Scale shape: candidate rows are n_queries x window (tiny);
    they broadcast into the doc-values join — corpus-sized work
    happened in the first stage only."""
    decay = F.pow(
        F.lit(0.5), (F.lit(float(now)) - F.col(value_col)) / F.lit(float(half_life))
    )
    joined = F.broadcast(candidates.select("query_id", "doc_id", score_col)).join(
        doc_values.select("doc_id", value_col), "doc_id"
    )
    combined = joined.select(
        "query_id",
        "doc_id",
        (F.col(score_col) * decay).alias("score"),
    )
    return topk(combined, k).select("query_id", "rank", "doc_id", "score")


def rescore_by_decay(
    candidates: DataFrame,
    doc_values: DataFrame,
    kind: str = "gauss",
    origin: float = 365.0,
    scale: float = 90.0,
    decay: float = 0.5,
    k: int = 10,
    value_col: str = "value",
    score_col: str = "score",
) -> DataFrame:
    """The full Elasticsearch ``function_score`` decay family over a
    rescore window: multiplier m(d), d = |value - origin|, with
    m(scale) = decay by construction —

        gauss:  m = decay ^ (d / scale)^2        (bell; flat near origin)
        exp:    m = decay ^ (d / scale)          (memoryless)
        linear: m = max(0, 1 - d*(1-decay)/scale) (hard zero cutoff)

    combined = score * m, re-ranked within the candidate window
    (same two-stage contract as ``rescore_by_recency``, which is the
    one-sided exp special case). Scale shape identical: the window is
    n_queries x window rows, broadcast into one doc-values join."""
    d = F.abs(F.lit(float(origin)) - F.col(value_col))
    if kind == "gauss":
        mult = F.pow(F.lit(float(decay)), F.pow(d / F.lit(float(scale)), F.lit(2.0)))
    elif kind == "exp":
        mult = F.pow(F.lit(float(decay)), d / F.lit(float(scale)))
    elif kind == "linear":
        mult = F.greatest(
            F.lit(0.0),
            F.lit(1.0) - d * F.lit((1.0 - float(decay)) / float(scale)),
        )
    else:
        raise ValueError(f"unknown decay kind: {kind!r}")
    joined = F.broadcast(candidates.select("query_id", "doc_id", score_col)).join(
        doc_values.select("doc_id", value_col), "doc_id"
    )
    combined = joined.select(
        "query_id", "doc_id", (F.col(score_col) * mult).alias("score")
    )
    return topk(combined, k).select("query_id", "rank", "doc_id", "score")


def blend_static_prior(
    scored: DataFrame,
    prior: DataFrame,
    k: int = 10,
    weight: float = 0.3,
    id_col: str = "id",
    prior_col: str = "pr",
    score_col: str = "score",
) -> DataFrame:
    """Authority blending — the classic web-ranking composition of a
    query-dependent score with a static document prior (PageRank):

        blended = score + weight * ln(1 + n * prior)

    where n = number of docs carrying a prior, so ``n * prior`` is ~1
    for an average-authority page and the boost is scale-free in
    corpus size. Docs without a prior get ln(1) = 0 boost (LEFT join).

    This is a CANDIDATE re-ranker, not a retriever: feed it a deep-k
    candidate set (e.g. 5x the final k) and cut to k on the blended
    score — the standard two-stage shape, so the prior join touches
    n_queries x deep_k rows, never the corpus. Engine tie semantics
    on the blended score."""
    n = prior.count()
    pr = prior.select(F.col(id_col).alias("doc_id"), F.col(prior_col).alias("prior"))
    # scale shape: the prior table is corpus-sized, candidates are
    # n_queries x deep_k. Spark cannot broadcast the LEFT side of a
    # left-outer join, so (1) broadcast the candidate doc_ids INTO the
    # prior scan (inner join -> map-side filter, no prior shuffle),
    # then (2) left-join that now-tiny slice back, broadcasting it.
    cands = scored.drop("rank")
    pr_slice = F.broadcast(cands.select("doc_id").distinct()).join(pr, "doc_id")
    joined = cands.join(F.broadcast(pr_slice), "doc_id", "left").withColumn(
        "prior", F.coalesce(F.col("prior"), F.lit(0.0))
    )
    blended = joined.withColumn(
        "blended",
        F.col(score_col) + F.lit(weight) * F.log(F.lit(1.0) + F.lit(float(n)) * F.col("prior")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("blended"), TIE_DECIMALS)), F.asc("doc_id")
    )
    return (
        blended.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", score_col, "prior", "blended")
    )


def bm25_topk_msm_bruteforce(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    msm: int = 2,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Minimum-should-match BM25 top-k, oracle-grade declarative plan:
    only documents matching >= ``msm`` DISTINCT unique query terms
    qualify (Lucene ``minimum_should_match`` semantics — OOV terms can
    never count toward the minimum, so a query with fewer in-vocab
    terms than msm yields zero rows); qualifying docs score with the
    full disjunctive Okapi sum. Same plan shape as the conjunctive
    scorer: the matched-term count rides the score groupBy, one
    HAVING-style filter, no extra shuffle. msm=1 is plain disjunctive
    BM25; msm = n unique query terms is the conjunctive scorer."""
    qt = query_terms(spark, queries)
    tfdl = term_freqs_dl(docs)
    dl = doc_lengths_direct(docs)
    stats = corpus_stats(dl)
    df = doc_freqs(tfdl)
    idf = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .select("term", "idf", "avgdl")
    )
    matched = (
        F.broadcast(qt)
        .join(tfdl, "term")
        .join(idf, "term")
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    scored = matched.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").alias("score"),
        F.count(F.lit(1)).alias("matched_terms"),
    )
    qual = scored.filter(F.col("matched_terms") >= msm)
    return topk(qual, k).select("query_id", "rank", "doc_id", "score")


def terms_set_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    msm_field: str,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, score): the Elasticsearch ``terms_set``
    query — like minimum_should_match, but the minimum is PER
    DOCUMENT, read from ``msm_field`` (the
    ``minimum_should_match_field`` contract: e.g. a doc that stores
    required_matches=3 needs 3 distinct query terms, its neighbor
    with 1 needs only 1). Scoring is the plain disjunctive Okapi sum
    over qualifying docs.

    Scale shape: identical to the static-msm scorer — the per-doc
    minimum joins in with the doc-length projection (same doc-keyed
    join, no new shuffle) and the HAVING filter compares the rideshare
    matched-term count against it."""
    qt = query_terms(spark, queries)
    tfdl = term_freqs_dl(docs, id_col, text_col)
    dl = doc_lengths_direct(docs, id_col, text_col)
    stats = corpus_stats(dl)
    df = doc_freqs(tfdl)
    idf = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .select("term", "idf", "avgdl")
    )
    matched = (
        F.broadcast(qt)
        .join(tfdl, "term")
        .join(idf, "term")
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    scored = matched.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").alias("score"),
        F.count(F.lit(1)).alias("matched_terms"),
    )
    minima = docs.select(
        F.col(id_col).alias("doc_id"), F.col(msm_field).alias("_msm")
    )
    qual = scored.join(minima, "doc_id").filter(
        F.col("matched_terms") >= F.col("_msm")
    )
    return topk(qual, k).select("query_id", "rank", "doc_id", "score")


def bm25_topk_conjunctive_bruteforce(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Conjunctive (AND) BM25 top-k, oracle-grade declarative plan:
    only documents containing EVERY unique query term qualify (a query
    holding an out-of-vocabulary term returns zero rows — Lucene
    MUST-clause semantics); qualifying docs score with the same Okapi
    sum as the disjunctive scorer. The AND constraint is one extra
    aggregate condition on the existing plan: matched-term count per
    (query, doc) must equal the query's unique-term count — no new
    shuffle (the count rides the same groupBy as the score sum)."""
    qt = query_terms(spark, queries)
    qcounts = qt.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))
    tfdl = term_freqs_dl(docs)
    dl = doc_lengths_direct(docs)
    stats = corpus_stats(dl)
    df = doc_freqs(tfdl)
    idf = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .select("term", "idf", "avgdl")
    )
    matched = (
        F.broadcast(qt)
        .join(tfdl, "term")
        .join(idf, "term")
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    scored = matched.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").alias("score"),
        F.count(F.lit(1)).alias("matched_terms"),
    )
    conj = scored.join(F.broadcast(qcounts), "query_id").filter(
        F.col("matched_terms") == F.col("n_terms")
    )
    return topk(conj, k).select("query_id", "rank", "doc_id", "score")


# ---- BM25F: field-weighted retrieval (title boosted over body) ----

TITLE_LEN = 8
TITLE_WEIGHT = 3


def fielded_weighted_docs(
    docs: DataFrame,
    title_len: int = TITLE_LEN,
    title_weight: int = TITLE_WEIGHT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, text): the weighted-token-stream form of BM25F with
    integer field weights — title tokens (the document's first
    ``title_len``; web pages carry their title up front) repeated
    ``title_weight`` times, body tokens once.

    Running the STANDARD BM25 pipeline over this stream IS the
    simplified BM25F (shared length normalization, per-field weight
    multiplying tf before saturation): tf' = w_t*tf_title + tf_body
    and dl' = w_t*len_title + len_body fall out of the token
    repetition, so the inverted-index build, WAND, and every query
    mode work unchanged over fielded scoring — index-time boosting,
    the way Lucene bakes field weights into norms. One narrow
    projection, no shuffle of its own (the downstream build's agg is
    the first shuffle)."""
    toks = tokenize_for_scoring(F.col(text_col))
    title = F.slice(toks, 1, title_len)
    body = F.slice(
        toks,
        title_len + 1,
        F.greatest(F.size(toks) - F.lit(title_len), F.lit(0)),
    )
    weighted = F.concat(F.flatten(F.array_repeat(title, title_weight)), body)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_join(weighted, " ").alias("text"),
    )


def bm25f_topk_bruteforce(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    title_len: int = TITLE_LEN,
    title_weight: int = TITLE_WEIGHT,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Declarative BM25F oracle: standard brute-force BM25 over the
    weighted token stream."""
    return bm25_topk_bruteforce(
        spark, fielded_weighted_docs(docs, title_len, title_weight), queries, k, k1, b
    )


DISMAX_TIE_BREAKER = 0.3


def split_fields(
    docs: DataFrame,
    title_len: int = TITLE_LEN,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """{'title': ..., 'body': ...}: the corpus as two per-field doc
    tables (title = the first ``title_len`` tokens — web pages carry
    their title up front; body = the rest). Pure projections; each
    field then gets its OWN BM25 statistics (df, dl, avgdl), which is
    what separates dis_max from the shared-normalization BM25F in
    ``fielded_weighted_docs``."""
    toks = tokenize_for_scoring(F.col(text_col))
    title = F.slice(toks, 1, title_len)
    body = F.slice(
        toks, title_len + 1, F.greatest(F.size(toks) - F.lit(title_len), F.lit(0))
    )
    base = docs.select(F.col(id_col).alias("doc_id"), title.alias("t"), body.alias("b"))
    return {
        "title": base.select("doc_id", F.array_join("t", " ").alias("text")),
        "body": base.select("doc_id", F.array_join("b", " ").alias("text")),
    }


def dismax_topk_bruteforce(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    tie_breaker: float = DISMAX_TIE_BREAKER,
    title_len: int = TITLE_LEN,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, doc_id, score): Lucene ``dis_max``/best-fields
    multi-field retrieval — each field (title, body) is scored as its
    own BM25 corpus, and a doc's query score is

        max(field scores) + tie_breaker * (sum - max)

    so a doc matching strongly in ONE field beats a doc matching
    weakly in both (the behavior ``most_fields``/BM25F inverts).

    Scale shape: one standard brute-force scorer plan per field over
    per-field projections of the same scan, then a full-outer join of
    the two (query, doc)-keyed score tables — both sides already
    aggregated, keys co-partitioned. The index-backed equivalent runs
    WAND per field over per-field indexes and merges candidates the
    same way.
    """
    fields = split_fields(docs, title_len)
    qt = query_terms(spark, queries)
    st = bm25_scores_bruteforce(fields["title"], qt, k1, b).withColumnRenamed(
        "score", "s_title"
    )
    sb = bm25_scores_bruteforce(fields["body"], qt, k1, b).withColumnRenamed(
        "score", "s_body"
    )
    both = st.join(sb, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        F.coalesce("s_title", F.lit(0.0)).alias("s_title"),
        F.coalesce("s_body", F.lit(0.0)).alias("s_body"),
    )
    mx = F.greatest("s_title", "s_body")
    scored = both.select(
        "query_id",
        "doc_id",
        (mx + tie_breaker * (F.col("s_title") + F.col("s_body") - mx)).alias("score"),
    )
    return topk(scored, k).select("query_id", "rank", "doc_id", "score")


def most_fields_topk_bruteforce(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    field_boosts: tuple[float, float] = (1.0, 1.0),
    title_len: int = TITLE_LEN,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, doc_id, score): ``multi_match`` type
    ``most_fields`` — the third member of the ES multi-field family
    (best_fields = ``dismax_topk_bruteforce``, cross_fields =
    ``cross_fields_topk_bruteforce``): each field scores as its own
    BM25 corpus and a doc's score is the BOOST-WEIGHTED SUM of its
    per-field scores, rewarding docs that say the same thing in many
    fields (the inverse preference of best_fields).

    Scale shape identical to dis_max: one brute plan per per-field
    projection of the same scan, one full-outer join of two already-
    aggregated (query, doc)-keyed tables."""
    fields = split_fields(docs, title_len)
    qt = query_terms(spark, queries)
    w_title, w_body = field_boosts
    st = bm25_scores_bruteforce(fields["title"], qt, k1, b).withColumnRenamed(
        "score", "s_title"
    )
    sb = bm25_scores_bruteforce(fields["body"], qt, k1, b).withColumnRenamed(
        "score", "s_body"
    )
    scored = st.join(sb, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            w_title * F.coalesce("s_title", F.lit(0.0))
            + w_body * F.coalesce("s_body", F.lit(0.0))
        ).alias("score"),
    )
    return topk(scored, k).select("query_id", "rank", "doc_id", "score")


def random_score_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    seed: str = "0",
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, score): ES ``function_score`` with
    ``random_score`` — the match set (docs sharing >= 1 query term)
    ranked by a DETERMINISTIC per-(seed, doc) uniform in [0, 1):
    ``conv(md5(seed || ':' || doc_id)[:15], 16, 10) / 16^15``. Same
    seed -> same order across runs, engines (the md5 is the DuckDB
    oracle's too), and partitionings; a new seed reshuffles. The
    standard "show me a random sample of matching docs" surface.

    Scale shape: one broadcast semi-join builds the match set, the
    uniform is a pure JVM projection, top-k per query as usual —
    no corpus-wide sort."""
    qterms = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matches = (
        F.broadcast(qterms)
        .join(tf, "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed), F.lit(":"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**15))
    )
    scored = matches.withColumn("score", u)
    return topk(scored, k).select("query_id", "rank", "doc_id", "score")


def boosting_topk_bruteforce(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str, str]],
    k: int = 10,
    negative_boost: float = 0.3,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, doc_id, score): the Elasticsearch ``boosting``
    query — retrieve and score by the positive query, then DEMOTE
    (multiply by ``negative_boost`` in [0, 1]) any result that also
    matches >= 1 negative-query term, never excluding it (the
    difference from a boolean ``-term`` clause). ``queries`` rows are
    (query_id, positive_query, negative_query).

    Scale shape: the positive side is the standard brute-force scorer
    plan; the negative side is broadcast(negative terms) ⋈ the SAME tf
    table collapsed to a distinct (query, doc) flag — both sides
    aggregate before the final left join on co-partitioned
    (query_id, doc_id) keys, so the only corpus-sized work is the one
    tf scan both reuse. Demotion is rank-safe for WAND composition:
    negative_boost <= 1 means a positive-score block-max bound still
    upper-bounds the adjusted score, so the index-backed variant could
    prune exactly with the same bounds. ES bounds negative_boost to
    [0, 1] for the same reason — values above 1 would PROMOTE negative
    matches and invert every pruning bound, so they are rejected."""
    if not 0.0 <= negative_boost <= 1.0:
        raise ValueError(f"negative_boost must be in [0, 1], got {negative_boost}")
    pos = [(qid, q) for qid, q, _ in queries]
    neg = [(qid, nq) for qid, _, nq in queries]
    scored = bm25_scores_bruteforce(docs, query_terms(spark, pos), k1, b)
    tf = term_freqs(docs)
    neg_docs = (
        F.broadcast(query_terms(spark, neg))
        .join(tf.select("doc_id", "term"), "term")
        .select("query_id", "doc_id")
        .distinct()
        .withColumn("is_neg", F.lit(True))
    )
    adj = scored.join(neg_docs, ["query_id", "doc_id"], "left").select(
        "query_id",
        "doc_id",
        F.when(F.col("is_neg"), F.col("score") * negative_boost)
        .otherwise(F.col("score"))
        .alias("score"),
    )
    return topk(adj, k).select("query_id", "rank", "doc_id", "score")


def collapse_topk(
    scored: DataFrame,
    doc_meta: DataFrame,
    k: int,
    group_col: str = "source",
    score_col: str = "score",
) -> DataFrame:
    """(query_id, rank, doc_id, score, <group_col>, inner_hits):
    field collapsing (Elasticsearch ``collapse`` / Lucene grouping) —
    per query keep only the BEST doc of each group (host/domain), rank
    the survivors, and report ``inner_hits`` = how many candidates the
    group had, so the UI can render "+ 12 more from this site".

    The degenerate ``n_per_group=1`` diversification plus the group
    count; kept separate because the contract differs (inner_hits
    column, one row per group). Scale shape: two windows + one count
    over the (tiny) per-query candidate set — n_queries x deep_k rows,
    never the corpus; the meta join broadcasts the candidate side.
    """
    cands = F.broadcast(scored).join(doc_meta.select("doc_id", group_col), "doc_id")
    w_group = Window.partitionBy("query_id", group_col).orderBy(
        F.desc(F.round(F.col(score_col), TIE_DECIMALS)), F.asc("doc_id")
    )
    flagged = cands.select(
        "query_id",
        "doc_id",
        score_col,
        group_col,
        F.row_number().over(w_group).alias("grp_rank"),
        F.count(F.lit(1))
        .over(Window.partitionBy("query_id", group_col))
        .alias("inner_hits"),
    )
    best = flagged.filter(F.col("grp_rank") == 1).drop("grp_rank")
    return topk(best, k).select(
        "query_id", "rank", "doc_id", score_col, group_col, "inner_hits"
    )


def hit_counts(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, total_hits): the total number of documents matching
    >= 1 unique query term — the "about 1,240,000 results" figure and
    the ES ``track_total_hits`` contract, which top-k kernels
    deliberately avoid computing (WAND prunes exactly the docs a count
    would have to visit).

    One broadcast of the query terms into the tf table and one
    count_distinct per query — both map-side combinable; queries with
    zero matches are emitted with 0 (contract: one row per query).
    """
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    counts = (
        F.broadcast(qt)
        .join(tf.select("doc_id", "term"), "term")
        .groupBy("query_id")
        .agg(F.count_distinct("doc_id").alias("total_hits"))
    )
    all_q = spark.createDataFrame(
        [(qid,) for qid, _ in queries], "query_id long"
    ).distinct()
    return all_q.join(counts, "query_id", "left").select(
        "query_id", F.coalesce("total_hits", F.lit(0)).alias("total_hits")
    )


def sort_by_docvalue_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    field: str,
    k: int = 10,
    ascending: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, sort_value): Elasticsearch ``sort``
    over a doc value — the match set (docs containing >= 1 unique
    query term) ordered by ``field`` instead of relevance, ties broken
    doc_id asc (ES same-shard tie behavior), top-k per query. Scores
    are deliberately not computed (ES leaves ``_score`` null when a
    sort replaces relevance).

    Scale shape: broadcast query terms into the tf table (one
    combinable distinct per (query, doc)), join the doc-value column
    (pruned scan — only ``id_col`` and ``field`` are read), and the
    rank filter becomes a per-partition group-limit before the
    query_id shuffle (Spark's WindowGroupLimit / limit-through-window
    rewrite), so a hot query's full match set is never sorted in one
    task."""
    qt = query_terms(spark, queries)
    tf = term_freqs(docs, id_col, text_col)
    matched = (
        F.broadcast(qt)
        .join(tf.select(F.col(id_col).alias("doc_id"), "term"), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    vals = docs.select(
        F.col(id_col).alias("doc_id"), F.col(field).cast("double").alias("sort_value")
    )
    cands = matched.join(vals, "doc_id")
    order = (
        F.asc("sort_value") if ascending else F.desc("sort_value"),
        F.asc("doc_id"),
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "sort_value")
    )


def rank_feature_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    field: str,
    k: int = 10,
    function: str = "saturation",
    pivot: float = 1.0,
    boost: float = 1.0,
    scaling_factor: float = 1.0,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, score): the Elasticsearch
    ``rank_feature`` query as a bool ``should`` clause next to the
    text query — matching docs score BM25 + boost * S(feature), where
    S is ``saturation`` S(f) = f / (f + pivot) (ES default; pivot
    pinned explicitly here rather than ES's auto geometric mean, so
    results are deterministic) or ``log`` S(f) = ln(scaling_factor +
    f). Static per-doc signals (pagerank, freshness, length priors)
    enter ranking this way without touching the inverted index.

    Scale shape: the standard brute-force scorer plan plus one pruned
    (doc_id, field) scan joined on the aggregated (query, doc) score
    table — the same single big join the scorer's dl join makes; the
    saturation/log arithmetic is codegen'd. Rank-safe for WAND
    composition: S is bounded (saturation < 1), so term upper bounds
    plus boost * S_max still upper-bound the blended score."""
    if function not in ("saturation", "log"):
        raise ValueError(f"unsupported rank_feature function: {function!r}")
    # ES validates the same bounds: pivot/boost <= 0 would flip the
    # saturation sign or demote matches the docstring promises to boost
    if pivot <= 0 or boost < 0 or scaling_factor <= 0:
        raise ValueError("need pivot > 0, boost >= 0, scaling_factor > 0")
    qt = query_terms(spark, queries)
    scored = bm25_scores_bruteforce(docs, qt, k1, b, id_col, text_col)
    feat = docs.select(
        F.col(id_col).alias("doc_id"), F.col(field).cast("double").alias("_f")
    )
    if function == "saturation":
        s = F.col("_f") / (F.col("_f") + F.lit(float(pivot)))
    else:
        s = F.log(F.lit(float(scaling_factor)) + F.col("_f"))
    blended = scored.join(feat, "doc_id").select(
        "query_id",
        "doc_id",
        (F.col("score") + F.lit(float(boost)) * s).alias("score"),
    )
    return topk(blended, k).select("query_id", "rank", "doc_id", "score")


def cross_fields_topk_bruteforce(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    title_len: int = TITLE_LEN,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, doc_id, score): ES ``multi_match`` type
    ``cross_fields`` — TERM-centric multi-field scoring. Each query
    term is scored in each field (title/body, each with its own BM25
    statistics), the term takes its BEST field, and the doc sums the
    per-term bests. Unlike ``dis_max`` (field-centric: best whole
    field wins), cross_fields rewards a doc whose terms are spread
    ACROSS fields — the "first name in title, last name in body"
    query shape dis_max under-scores.

    Scale shape: the same two per-field projections and per-field
    stats tables ``dismax_topk_bruteforce`` builds, but the merge is a
    union + two combinable hash aggs keyed (query, doc, term) then
    (query, doc) — no full-outer join, both aggs map-side partial."""
    fields = split_fields(docs, title_len)
    qt = query_terms(spark, queries)
    parts = []
    for fdocs in fields.values():
        tfdl = term_freqs_dl(fdocs)
        stats = corpus_stats(doc_lengths_direct(fdocs))
        df = doc_freqs(tfdl)
        idf = (
            df.crossJoin(F.broadcast(stats))
            .withColumn(
                "idf",
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
                ),
            )
            .select("term", "idf", "avgdl")
        )
        scored = (
            F.broadcast(qt)
            .join(tfdl, "term")
            .join(idf, "term")
            .withColumn(
                "term_score",
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
            )
        )
        parts.append(scored.select("query_id", "doc_id", "term", "term_score"))
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    best = unioned.groupBy("query_id", "doc_id", "term").agg(
        F.max("term_score").alias("ts")
    )
    scored = best.groupBy("query_id", "doc_id").agg(F.sum("ts").alias("score"))
    return topk(scored, k).select("query_id", "rank", "doc_id", "score")


def function_score_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    field: str,
    k: int = 10,
    factor: float = 1.0,
    modifier: str = "log1p",
    boost_mode: str = "multiply",
    max_boost: float = float("inf"),
    min_score: float | None = None,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, score): ES ``function_score`` with a
    ``field_value_factor`` function — fvf = factor * modifier(field),
    clamped to ``max_boost``, combined with the BM25 query score per
    ``boost_mode`` (multiply or sum); docs below ``min_score`` drop
    AFTER combining (the ES contract: min_score prunes final scores).
    Modifiers follow ES: none, log1p, sqrt, reciprocal.

    Distinct from ``rank_feature_topk``: that is a bounded *should*
    clause (always additive, saturation-shaped); function_score
    rescales the query score itself, so multiply mode can demote as
    well as promote — the classic popularity/length-prior reweight.

    Scale shape: the brute-force scorer plan plus one pruned
    (doc_id, field) projection joined on the aggregated (query, doc)
    scores — identical join count to rank_feature; all arithmetic is
    codegen'd. WAND composition caveat: multiply mode is rank-safe
    only with fvf <= max_boost, which is why the clamp is applied
    index-side before the ceiling enters term upper bounds."""
    if modifier not in ("none", "log1p", "sqrt", "reciprocal"):
        raise ValueError(f"unsupported field_value_factor modifier: {modifier!r}")
    if boost_mode not in ("multiply", "sum"):
        raise ValueError(f"unsupported boost_mode: {boost_mode!r}")
    if factor < 0 or max_boost <= 0:
        raise ValueError("need factor >= 0 and max_boost > 0")
    qt = query_terms(spark, queries)
    scored = bm25_scores_bruteforce(docs, qt, k1, b, id_col, text_col)
    feat = docs.select(
        F.col(id_col).alias("doc_id"), F.col(field).cast("double").alias("_f")
    )
    raw = F.lit(float(factor)) * {
        "none": F.col("_f"),
        "log1p": F.log(F.lit(1.0) + F.col("_f")),
        "sqrt": F.sqrt(F.col("_f")),
        "reciprocal": F.lit(1.0) / F.col("_f"),
    }[modifier]
    fvf = F.least(raw, F.lit(float(max_boost)))
    combined = (
        F.col("score") * fvf if boost_mode == "multiply" else F.col("score") + fvf
    )
    blended = scored.join(feat, "doc_id").select(
        "query_id", "doc_id", combined.alias("score")
    )
    if min_score is not None:
        blended = blended.filter(F.col("score") >= float(min_score))
    return topk(blended, k).select("query_id", "rank", "doc_id", "score")


def bm25f_full_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    title_len: int = TITLE_LEN,
    field_weights: dict[str, float] | None = None,
    field_b: dict[str, float] | None = None,
    k1: float = BM25_K1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, score): FULL BM25F (Robertson &
    Zaragoza 2004/2009, the "simple BM25F" of the TREC-13 Microsoft
    Cambridge runs) with PER-FIELD length normalization — the piece
    the engine's index-time ``fielded_weighted_docs`` form cannot
    express. Per term t, doc d:

        tf~ = sum_f  w_f * tf_{t,f} / B_f,
        B_f = (1 - b_f) + b_f * dl_f / avgdl_f
        score = sum_t idf(t) * tf~ * (k1 + 1) / (tf~ + k1)

    idf is the engine's BM25+ idf over WHOLE-document df. With every
    b_f equal and avgdl shared this degenerates to the weighted-token
    shared-norm form (``bm25f_topk_bruteforce``); with per-field b it
    does not — a short title is no longer punished by body length,
    which is the whole point of BM25F (title b is conventionally LOW:
    titles are uniformly short, length carries no signal).

    Scale shape: two pure projections (title/body token slices), one
    combinable tf agg per field, per-field dl/avgdl the same way, a
    broadcast query-terms join, one (query, doc) agg — the plain
    brute scorer's plan run twice plus a union, no new shuffle shape.
    WAND composition: tf~ is bounded by sum_f w_f * tfmax_f / (1-b_f),
    so per-term block upper bounds carry over.
    """
    field_weights = field_weights or {"title": 2.0, "body": 1.0}
    field_b = field_b or {"title": 0.3, "body": 0.75}
    fields = split_fields(docs, title_len, id_col, text_col)
    if set(field_weights) != set(fields) or set(field_b) != set(fields):
        raise ValueError("field_weights/field_b must cover exactly title, body")
    qt = query_terms(spark, queries)

    # whole-document df + n_docs for idf
    tf_doc = term_freqs(docs, id_col, text_col)
    dft = doc_freqs(tf_doc)
    n_docs = docs.select(id_col).distinct().count()

    parts = []
    for fname, fdocs in fields.items():
        ftf = term_freqs(fdocs, "doc_id", "text")
        fdl = doc_lengths(ftf)
        favg = float(
            fdl.agg(F.avg("dl").alias("a")).collect()[0]["a"] or 0.0
        )
        b_f, w_f = float(field_b[fname]), float(field_weights[fname])
        if favg <= 0:
            continue
        norm = F.lit(1.0 - b_f) + F.lit(b_f) * F.col("dl") / F.lit(favg)
        parts.append(
            ftf.join(fdl, "doc_id").select(
                "doc_id",
                "term",
                (F.lit(w_f) * F.col("tf") / norm).alias("wtf"),
            )
        )
    if not parts:
        raise ValueError("empty corpus: no field has tokens")
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    pooled = union.groupBy("doc_id", "term").agg(F.sum("wtf").alias("tfw"))

    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    matched = (
        qt.join(pooled, "term")
        .join(F.broadcast(dft), "term")
        .select(
            "query_id",
            "doc_id",
            (
                idf
                * F.col("tfw")
                * F.lit(k1 + 1.0)
                / (F.col("tfw") + F.lit(k1))
            ).alias("term_score"),
        )
    )
    scored = matched.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").alias("score")
    )
    return topk(scored, k).select("query_id", "rank", "doc_id", "score")


def distance_feature_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    field: str,
    origin: float,
    pivot: float,
    k: int = 10,
    boost: float = 1.0,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, score): the Elasticsearch
    ``distance_feature`` query as a bool ``should`` clause — matching
    docs score BM25 + boost * pivot / (pivot + |field - origin|), the
    ES date/geo proximity boost over a numeric doc value ("closer to
    origin ranks higher, with half the boost at distance = pivot").

    Distinct from the rescore family (``rescore_by_recency`` /
    ``rescore_by_decay``): a rescore reorders only a fixed-depth
    candidate window; distance_feature contributes to the PRIMARY
    score of every matching doc, so a far-down match can be promoted
    from outside any window. Distinct from ``rank_feature_topk``: the
    shape is distance-to-origin (non-monotonic in the field value),
    not a monotone saturation of the value itself.

    Scale shape: brute-force scorer plan + one pruned (doc_id, field)
    projection joined on the aggregated (query, doc) scores; the
    proximity arithmetic is codegen'd. WAND composition: the clause
    contribution is bounded by ``boost`` (distance 0), so block upper
    bounds extend by a constant and pruning stays exact."""
    if pivot <= 0 or boost < 0:
        # ES validates the same: pivot is a positive distance; a
        # negative boost would invert "closer ranks higher"
        raise ValueError("need pivot > 0 and boost >= 0")
    qt = query_terms(spark, queries)
    scored = bm25_scores_bruteforce(docs, qt, k1, b, id_col, text_col)
    feat = docs.select(
        F.col(id_col).alias("doc_id"), F.col(field).cast("double").alias("_f")
    )
    prox = F.lit(float(boost)) * F.lit(float(pivot)) / (
        F.lit(float(pivot)) + F.abs(F.col("_f") - F.lit(float(origin)))
    )
    blended = scored.join(feat, "doc_id").select(
        "query_id",
        "doc_id",
        (F.col("score") + prox).alias("score"),
    )
    return topk(blended, k).select("query_id", "rank", "doc_id", "score")


def common_terms_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    cutoff: float = 0.01,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, doc_id, score): Lucene ``CommonTermsQuery``
    (ES ``cutoff_frequency``): query terms whose df exceeds
    ``cutoff * n_docs`` are HIGH-frequency — they contribute to the
    score but cannot match a document on their own. Matching is gated
    by the low-frequency terms (OR over them); only when a query has
    NO low-frequency terms does it fall back to a plain OR over the
    common terms. Out-of-vocabulary terms are low-frequency (df 0),
    so a query whose only low terms are OOV matches nothing — the
    Lucene behavior (its low-freq subquery exists but hits 0 docs).

    Why it exists at 100 TB: stopword-ish terms have postings the
    size of the corpus. Gating the match set by rare terms first
    means the common terms' huge postings are only consulted FOR
    DOCS ALREADY CANDIDATES (here: the score agg is semi-joined to
    the candidate set; on the index path the same shape is
    wand_topk(allowed_docs=low_matches)) — the classic
    "common terms never drive iteration" optimization, without
    losing their scoring contribution the way a stopword filter
    would."""
    qt = query_terms(spark, queries)
    tfdl = term_freqs_dl(docs)
    dl = doc_lengths_direct(docs)
    stats = corpus_stats(dl)
    df = doc_freqs(tfdl)
    qclass = (
        F.broadcast(qt)
        .join(df, "term", "left")
        .crossJoin(F.broadcast(stats).select("n_docs"))
        .select(
            "query_id",
            "term",
            (F.coalesce(F.col("df"), F.lit(0)) > cutoff * F.col("n_docs")).alias(
                "is_common"
            ),
        )
    )
    qflag = qclass.groupBy("query_id").agg(
        (F.max(F.when(~F.col("is_common"), 1).otherwise(0)) == 1).alias("any_low")
    )
    idf = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .select("term", "idf", "avgdl")
    )
    matched = (
        F.broadcast(qclass)
        .join(tfdl, "term")
        .join(idf, "term")
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    cands = (
        matched.join(F.broadcast(qflag), "query_id")
        .filter((~F.col("any_low")) | (~F.col("is_common")))
        .select("query_id", "doc_id")
        .distinct()
    )
    scored = (
        matched.join(cands, ["query_id", "doc_id"], "left_semi")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term_score").alias("score"))
    )
    return topk(scored, k).select("query_id", "rank", "doc_id", "score")


def match_bool_prefix_bruteforce(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansion: int = 64,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, doc_id, score): ES ``match_bool_prefix`` —
    every term but the last is a BM25 ``should`` term clause; the LAST
    term is a PREFIX clause under Lucene's default multi-term rewrite
    (CONSTANT_SCORE: +1.0 when any expansion matches, regardless of
    which or how many). Pure shoulds: a doc matching only the prefix
    clause still matches. Expansion = vocabulary terms with the
    prefix, df desc / term asc, capped at ``max_expansion`` — the same
    rule as the index-side wildcard operators, so "search-as-you-type
    before the last keystroke finishes" behaves identically across
    paths. Distinct from ``match_phrase_prefix``: no adjacency — the
    terms may sit anywhere in the doc.

    Scale shape: one tf/dl pass shared by both clauses; the expansion
    is a dictionary scan (df table) capped per query; the constant
    clause is a semi-join-shaped distinct, and the final score is one
    combinable agg + a left join — no positional data touched."""
    plan: list[tuple[int, list[str], str]] = []
    for qid, q in queries:
        toks = [t for t in q.strip().lower().split() if t]
        if toks:
            plan.append((qid, list(dict.fromkeys(toks[:-1])), toks[-1]))
    if not plan:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    tfdl = term_freqs_dl(docs)
    dl = doc_lengths_direct(docs)
    stats = corpus_stats(dl)
    df = doc_freqs(tfdl)
    # per-query capped prefix expansion straight off the dictionary
    pfx = spark.createDataFrame(
        [(qid, p) for qid, _f, p in plan], "query_id long, pfx string"
    )
    wexp = Window.partitionBy("query_id").orderBy(F.desc("df"), F.asc("term"))
    exp = (
        F.broadcast(pfx)
        .join(df, F.col("term").startswith(F.col("pfx")))
        .withColumn("xrank", F.row_number().over(wexp))
        .filter(F.col("xrank") <= max_expansion)
        .select("query_id", "term")
    )
    fixed_rows = [(qid, t) for qid, fixed, _p in plan for t in fixed]
    scored_fixed = None
    if fixed_rows:
        qt = spark.createDataFrame(fixed_rows, "query_id long, term string")
        idf = df.crossJoin(F.broadcast(stats)).withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        scored_fixed = (
            F.broadcast(qt)
            .join(tfdl, "term")
            .join(idf.select("term", "idf", "avgdl"), "term")
            .withColumn(
                "term_score",
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
            )
            .groupBy("query_id", "doc_id")
            .agg(F.sum("term_score").alias("bm25"))
        )
    pmatch = (
        F.broadcast(exp)
        .join(tfdl.select("term", "doc_id"), "term")
        .select("query_id", "doc_id")
        .distinct()
        .withColumn("pconst", F.lit(1.0))
    )
    if scored_fixed is None:
        blended = pmatch.select("query_id", "doc_id", F.col("pconst").alias("score"))
    else:
        blended = (
            scored_fixed.join(pmatch, ["query_id", "doc_id"], "full_outer")
            .select(
                "query_id",
                "doc_id",
                (
                    F.coalesce("bm25", F.lit(0.0)) + F.coalesce("pconst", F.lit(0.0))
                ).alias("score"),
            )
        )
    return topk(blended, k).select("query_id", "rank", "doc_id", "score")


def combined_fields_topk_bruteforce(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    title_len: int = TITLE_LEN,
    title_weight: float = 2.0,
    body_weight: float = 1.0,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, doc_id, score): the ES ``combined_fields``
    query (Lucene CombinedFieldQuery — the "simple BM25F" of
    Robertson/Zaragoza/Taylor 2004): all fields merge into ONE
    pseudo-field with per-field weights applied to term frequencies
    AND lengths, then plain BM25 runs over the combined statistics:

        tf~(t,d) = sum_f w_f * tf_f(t,d)
        dl~(d)   = sum_f w_f * dl_f(d)
        idf from the combined df (docs where ANY field has t)

    This differs from ``cross_fields`` (per-field stats, term takes
    its best field) and from full per-field-b BM25F
    (``bm25f_full_topk``): combined_fields shares ONE k1/b saturation
    across fields, which is why Lucene can run it as a single scorer.

    Scale shape: per-field tf tables union then ONE combinable
    (doc, term) hash agg; combined dl is a shuffle-free projection;
    everything downstream is the plain BM25 plan."""
    fields = split_fields(docs, title_len)
    weights = {"title": float(title_weight), "body": float(body_weight)}
    qt = query_terms(spark, queries)
    parts = [
        term_freqs(fdocs).select(
            "doc_id", "term", (F.col("tf") * F.lit(weights[name])).alias("wtf")
        )
        for name, fdocs in fields.items()
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    tfc = u.groupBy("doc_id", "term").agg(F.sum("wtf").alias("tfc"))
    dlc = (
        fields["title"]
        .select("doc_id", (F.size(tokenize_for_scoring(F.col("text"))) * F.lit(weights["title"])).alias("wdl"))
        .unionByName(
            fields["body"].select(
                "doc_id", (F.size(tokenize_for_scoring(F.col("text"))) * F.lit(weights["body"])).alias("wdl")
            )
        )
        .groupBy("doc_id")
        .agg(F.sum("wdl").alias("dlc"))
        .filter(F.col("dlc") > 0)
    )
    stats = dlc.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dlc").alias("avgdlc"))
    df = tfc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        F.broadcast(qt)
        .join(tfc, "term")
        .join(df, "term")
        .join(dlc, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "term_score",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
            * (F.col("tfc") * (k1 + 1.0))
            / (F.col("tfc") + k1 * (1.0 - b + b * F.col("dlc") / F.col("avgdlc"))),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term_score").alias("score"))
    )
    return topk(scored, k).select("query_id", "rank", "doc_id", "score")


def sparse_vector_topk(
    spark: SparkSession,
    docs: DataFrame,
    query_vectors: list[tuple[int, list[tuple[str, float]]]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, score): the ES ``sparse_vector`` query
    — learned-sparse (ELSER/SPLADE-family) retrieval as a weighted
    term dot product:

        score(q, d) = sum_t  q_w(t) * w_d(t, d)

    where the query side is an explicit (term, weight) vector (the ES
    ``query_vector`` form) and the doc-side expansion weight uses the
    standard sparse-impact stand-in w_d = ln(1 + tf) * idf(t) — a
    deterministic corpus-derived surrogate for the learned expansion
    (the no-real-ML rule; a SPLADE checkpoint would replace exactly
    this column, nothing else in the plan changes). Negative or zero
    query weights are rejected (ES requires positive token weights;
    a negative weight would also break WAND-style pruning on the
    index-backed path).

    Scale shape: identical to the BM25 brute plan — the query-vector
    side broadcasts into the tf scan, the only corpus-sized shuffles
    are the tf/df hash aggs; on the compressed index this is one more
    per-(query, term) weight in the query plan, scored by the
    unchanged TAAT kernel shape (the LMD "second ranking model"
    pattern)."""
    rows = []
    for qid, vec in query_vectors:
        seen: dict[str, float] = {}
        for t, w in vec:
            if w is None or float(w) <= 0:
                raise ValueError(f"sparse_vector weight must be > 0: {t}^{w}")
            seen[t] = max(float(w), seen.get(t, 0.0))  # dup term: max weight
        rows += [(qid, t, w) for t, w in seen.items()]
    if not rows:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    qdf = spark.createDataFrame(rows, "query_id long, term string, qw double")

    tfdl = term_freqs_dl(docs, id_col, text_col)
    dl = doc_lengths_direct(docs, id_col, text_col)
    stats = corpus_stats(dl)
    df = doc_freqs(tfdl)
    idf = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .select("term", "idf")
    )
    matched = (
        F.broadcast(qdf)
        .join(tfdl, "term")
        .join(idf, "term")
        .withColumn(
            "term_score",
            F.col("qw") * F.log(F.lit(1.0) + F.col("tf")) * F.col("idf"),
        )
    )
    scored = matched.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").alias("score")
    )
    return topk(scored, k).select("query_id", "rank", "doc_id", "score")
