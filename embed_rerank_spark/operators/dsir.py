"""DSIR-style data selection: importance weighting of a raw corpus
toward a target distribution over hashed n-gram features (Xie et
al. 2023, "Data Selection for Language Models via Importance
Resampling", https://arxiv.org/abs/2302.03169) — the
quality-targeting selection step of an LLM data pipeline ("make my
crawl look like Wikipedia") that goes beyond per-doc heuristics.

Pipeline, each stage a combinable aggregation or a broadcast join:

1. ``hashed_ngram_features``: unigrams + bigrams of each doc hashed
   into ``n_buckets`` via the engine's portable md5 bucket (same
   bytes in the DuckDB oracle) -> (doc_id, bucket, cnt);
2. ``fit_hashed_lm``: a bag-of-hashed-ngrams categorical model per
   corpus — ONE hash agg to bucket totals (``n_buckets`` rows,
   always broadcastable) with add-``smoothing`` mass so unseen
   buckets stay finite;
3. ``importance_weights``: per doc, sum over its features of
   cnt * (ln p_target[b] - ln p_raw[b]) — a broadcast join of the
   two tiny models into the feature table + one per-doc agg;
4. ``dsir_select``: keep the ``budget`` highest-weight docs
   (weight desc, doc_id asc — the paper adds Gumbel noise for a
   soft sample; the deterministic rank is the reproducible
   contract, and seeded-Gumbel is one extra md5-uniform column via
   ``bm25.random_score_topk``'s construction if sampling is wanted).

Scale shape (100 TB): the raw corpus is touched twice (features,
then the scoring join); both model tables are ``n_buckets`` rows
regardless of corpus size; nothing driver-sized. The feature
explosion multiplies rows by tokens-per-doc before the first agg —
partial (map-side) aggregation collapses it per partition, the same
shape as the posting build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import tokenize_for_scoring

N_BUCKETS = 8192
SMOOTHING = 1.0  # add-lambda mass per bucket


def _md5_bucket(col, n_buckets: int):
    """Deterministic bucket in [0, n_buckets): first 15 md5 hex chars
    as an int, mod buckets — portable to the DuckDB oracle as
    ``CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % n``."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
        % n_buckets
    )


def hashed_ngram_features(
    docs: DataFrame,
    n_buckets: int = N_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bucket, cnt): unigram + bigram counts hashed into
    ``n_buckets`` (bigrams joined with a space, so the feature string
    is unambiguous against unigrams)."""
    toks = tokenize_for_scoring(F.col(text_col))
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda g: ~g.endswith(F.lit(" ")),
    )
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.concat(toks, bigrams)).alias("gram"),
    )
    return (
        grams.withColumn("bucket", _md5_bucket(F.col("gram"), n_buckets))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def fit_hashed_lm(
    features: DataFrame, n_buckets: int = N_BUCKETS, smoothing: float = SMOOTHING
) -> DataFrame:
    """(bucket, logp): smoothed categorical log-probabilities over the
    OCCUPIED buckets of a corpus's hashed-n-gram bag. Buckets absent
    from the table carry ln(smoothing / denom) — the caller coalesces
    with that floor instead of materializing n_buckets rows."""
    totals = features.groupBy("bucket").agg(F.sum("cnt").alias("total"))
    denom = totals.agg(
        (F.sum("total") + F.lit(float(smoothing) * n_buckets)).alias("denom")
    )
    return totals.crossJoin(F.broadcast(denom)).select(
        "bucket",
        F.log((F.col("total") + F.lit(float(smoothing))) / F.col("denom")).alias(
            "logp"
        ),
        F.log(F.lit(float(smoothing)) / F.col("denom")).alias("logp_floor"),
    )


def importance_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    n_buckets: int = N_BUCKETS,
    smoothing: float = SMOOTHING,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, weight): per-doc DSIR importance log-weight
    sum_f cnt_f * (ln p_target[f] - ln p_raw[f]). Docs with zero
    features (empty text) are absent — they carry no evidence."""
    feats = hashed_ngram_features(raw_docs, n_buckets, id_col, text_col)
    p_raw = fit_hashed_lm(feats, n_buckets, smoothing)
    p_tgt = fit_hashed_lm(
        hashed_ngram_features(target_docs, n_buckets, id_col, text_col),
        n_buckets,
        smoothing,
    )
    # every model's floor is a constant — grab it once for coalescing
    # buckets the target never saw (raw-side buckets always exist here
    # because feats IS the raw feature table)
    tgt = p_tgt.select("bucket", F.col("logp").alias("lt"))
    tgt_floor = F.broadcast(
        p_tgt.select(F.first("logp_floor").alias("lt_floor")).limit(1)
    )
    joined = (
        feats.join(F.broadcast(tgt), "bucket", "left")
        .join(F.broadcast(p_raw.select("bucket", F.col("logp").alias("lr"))), "bucket")
        .crossJoin(tgt_floor)
    )
    return (
        joined.withColumn("lt", F.coalesce("lt", "lt_floor"))
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * (F.col("lt") - F.col("lr"))).alias("weight"))
    )


def dsir_select(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    budget: int,
    n_buckets: int = N_BUCKETS,
    smoothing: float = SMOOTHING,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, weight, sel_rank): the ``budget`` raw docs whose
    hashed-n-gram distribution is most target-like (weight rounded to
    the engine tie tolerance desc, doc_id asc — deterministic).

    The global rank is the two-phase distributed prefix count (same
    construction as ``sampling.select_token_budget``, which documents
    why the partitioning must be persisted): range-partition by the
    preference key, per-partition counts -> broadcast offsets, then an
    in-partition row_number — never one global window partition."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    from pyspark.sql import Window  # noqa: PLC0415

    w = importance_weights(
        raw_docs, target_docs, n_buckets, smoothing, id_col, text_col
    ).withColumn("_key", F.round("weight", 6))
    key_cols = [F.desc("_key"), F.asc("doc_id")]
    parts = (
        w.repartitionByRange(*key_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    try:
        totals = parts.groupBy("_pid").agg(F.count("*").alias("n")).collect()
        offsets, run = {}, 0
        for r in sorted(totals, key=lambda r: r["_pid"]):
            offsets[r["_pid"]] = run
            run += r["n"]
        off_expr = F.create_map(
            [F.lit(x) for kv in sorted(offsets.items()) for x in kv]
        )[F.col("_pid")]
        win = Window.partitionBy("_pid").orderBy(*key_cols)
        out = (
            parts.withColumn(
                "sel_rank", F.row_number().over(win) + off_expr
            )
            .filter(F.col("sel_rank") <= budget)
            .select("doc_id", "weight", "sel_rank")
        )
        return out.localCheckpoint(eager=True)
    finally:
        parts.unpersist()
