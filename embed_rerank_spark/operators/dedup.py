"""Deduplication operators for large-scale training-data pipelines.

No reference analogue (the reference is a serving loop); these are the
table-scale companions a 100 TB corpus needs before indexing/training:

- ``exact_dedup``          hash-groupBy on normalized text
- ``ngram_jaccard_pairs``  n-gram shingle Jaccard between candidate pairs
- ``minhash_lsh_dedup``    MinHash signatures + LSH banding -> near-dup
                           candidate pairs with exact-Jaccard verify
- ``simhash_dedup``        64-bit SimHash + Hamming-band buckets
- ``embedding_near_dup``   cosine near-duplicates over a vector column

Portability note: every hash below is built from md5 (``F.md5`` /
DuckDB ``md5``) so the DuckDB oracles compute IDENTICAL buckets —
xxhash64 exists in both engines but with different parameterizations.
MinHash uses the lexicographic MIN of md5 hex digests per seed: a
valid min-wise permutation family that needs no integer conversion.

Scale notes:
- exact dedup is one hash agg (map-side combinable).
- LSH: shingling explodes ~|doc| rows but collapses immediately into
  per-(seed) min aggregations (combinable); the band self-join joins
  on (band_id, band_hash) — bounded bucket sizes, AQE-skew tolerant;
  candidate verification only touches pairs sharing a bucket.
- simhash: one pass to signatures, self-join on rotated band keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.udfs import tokenize_for_scoring


# Hot-key caps (engine semantics, mirrored verbatim in the DuckDB
# oracles). A shingle present in more docs than MAX_SHINGLE_DF is
# boilerplate ("the the the", nav chrome): it cannot distinguish
# near-dups — true near-dups share MANY shingles, so dropping the hot
# ones from CANDIDATE GENERATION (never from the Jaccard verify, which
# always uses full shingle sets) keeps recall while bounding the
# self-join at |pairs| <= df_cap * n_shingles instead of quadratic in
# the hottest key. Same logic for LSH band buckets: a bucket larger
# than MAX_BUCKET_SIZE is a degenerate boilerplate cluster whose
# pair-set is quadratic; standard LSH practice drops it.
MAX_SHINGLE_DF = 128
MAX_BUCKET_SIZE = 64


def normalized_text(col):
    """Dedup normalization: lowercase, collapse whitespace runs."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One survivor (min id) per normalized-text group:
    (doc_id, n_dups) for survivors only."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), normalized_text(F.col(text_col)).alias("norm"))
        .groupBy("norm")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_dups"))
        .select("doc_id", "n_dups")
    )


def shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, shingle): distinct word n-grams of the tokenized text."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize_for_scoring(F.col(text_col)).alias("toks")
    )
    # n-gram i -> join of toks[i..i+n); built-ins only
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("toks") - n, F.lit(0))),
                lambda i: F.array_join(F.slice("toks", i + 1, n), " "),
            )
        ).alias("shingle"),
    ).filter(F.size(F.split(F.col("shingle"), " ")) == n)
    return grams.distinct()


def shingle_candidate_pairs(
    sh: DataFrame, max_df: int = MAX_SHINGLE_DF
) -> DataFrame:
    """(doc_a < doc_b) pairs sharing >= 1 NON-HOT shingle.

    The document-frequency cap bounds the self-join: without it one
    boilerplate shingle with df ~ N yields N^2/2 pairs. Capped, a
    shingle contributes <= max_df^2/2 pairs, so the pair set is linear
    in corpus size for fixed max_df."""
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    kept = sh.join(
        df_counts.filter(F.col("df") <= max_df).select("shingle"), "shingle"
    )
    return (
        kept.withColumnRenamed("doc_id", "doc_a")
        .join(kept.select(F.col("doc_id").alias("doc_b"), "shingle"), "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact shingle-set Jaccard for given (doc_a, doc_b) pairs."""
    sh = shingles(docs, n, id_col, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = pairs.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a").select(
        "doc_a", "doc_b", "shingle"
    )
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle").alias("shingle_b"))
    inter = (
        a.join(b, (a.doc_b == b.doc_b) & (a.shingle == b.shingle_b))
        .groupBy("doc_a", a.doc_b)
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "sh_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "sh_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter")
                / (F.col("sh_a") + F.col("sh_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 16,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, sig: array<string>): per-seed lexicographic-min md5 of
    shingles — a min-wise family portable to the DuckDB oracle."""
    sh = shingles(docs, shingle_n, id_col, text_col)
    seeded = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed"),
        "shingle",
    ).select(
        "doc_id",
        "seed",
        F.md5(F.concat(F.col("seed").cast("string"), F.lit("#"), F.col("shingle"))).alias("h"),
    )
    per_seed = seeded.groupBy("doc_id", "seed").agg(F.min("h").alias("minh"))
    return per_seed.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("seed", "minh"))).alias("s")
    ).select("doc_id", F.transform("s", lambda x: x["minh"]).alias("sig"))


def minhash_lsh_candidates(
    signatures: DataFrame,
    n_bands: int = 4,
    rows_per_band: int = 4,
    max_bucket_size: int = MAX_BUCKET_SIZE,
) -> DataFrame:
    """(doc_a < doc_b) candidate pairs sharing >=1 LSH band bucket.

    Buckets larger than ``max_bucket_size`` are dropped before the
    self-join (boilerplate clusters: their pair set is quadratic in
    bucket size); every surviving bucket contributes a bounded
    <= max_bucket_size^2/2 pairs."""
    banded = signatures.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
        "sig",
    ).select(
        "doc_id",
        "band",
        F.md5(
            F.array_join(
                F.slice("sig", F.col("band") * rows_per_band + 1, rows_per_band), "|"
            )
        ).alias("bucket"),
    )
    bucket_sizes = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n"))
    banded = banded.join(
        bucket_sizes.filter(F.col("n") <= max_bucket_size).select("band", "bucket"),
        ["band", "bucket"],
    )
    left = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    right = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    threshold: float = 0.7,
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int = MAX_BUCKET_SIZE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs: LSH candidates (bucket-size-capped) verified by
    exact FULL-set shingle Jaccard >= threshold.
    Returns (doc_a, doc_b, jaccard)."""
    sig = minhash_signatures(docs, n_hashes, shingle_n, id_col, text_col)
    cands = minhash_lsh_candidates(sig, n_bands, n_hashes // n_bands, max_bucket_size)
    verified = ngram_jaccard_pairs(docs, cands, shingle_n, id_col, text_col)
    return verified.filter(F.col("jaccard") >= threshold)


def simhash_signatures(
    docs: DataFrame, bits: int = 64, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, simhash: bigint): sign-aggregated token hashes.

    Token hash = first 16 hex chars of md5 (portable); bit b of the
    signature is 1 when the tf-weighted sum of (bit set ? +1 : -1)
    over tokens is positive."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_for_scoring(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    h = tf.withColumn(
        "h", F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("decimal(20,0)").cast("long")
    )
    # one groupBy(doc_id) with `bits` sum-aggregate columns replaces the
    # old bits× row explosion: same shuffle key, 1/bits the shuffle rows,
    # all expressions whole-stage-codegen'd JVM (at 10^12×avg-terms rows
    # the ×64 intermediate was the build's dominant shuffle)
    bit_sums = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"shiftright(h, {bb}) & 1") == 1, F.col("tf")).otherwise(
                    -F.col("tf")
                )
            ).alias(f"s{bb}")
            for bb in range(bits)
        ]
    )
    # two's-complement fold: bit 63's weight wraps negative, exactly
    # like the previous shiftleft(1L, 63)
    sig = F.lit(0).cast("long")
    for bb in range(bits):
        weight = (1 << bb) if bb < 63 else -(2**63)
        sig = sig + F.when(F.col(f"s{bb}") > 0, F.lit(weight).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bit_sums.select("doc_id", sig.alias("simhash"))


def simhash_near_dup_pairs(signatures: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming): pairs within Hamming distance, found by
    4-band bucketing (any pair with distance <= 3 shares at least one
    16-bit band exactly — pigeonhole)."""
    bands = signatures.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).select(
        "doc_id",
        "simhash",
        "band",
        F.expr("shiftright(simhash, cast(band * 16 as int)) & 65535").alias("band_key"),
    )
    left = bands.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "band", "band_key")
    right = bands.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "band", "band_key")
    pairs = (
        left.join(right, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def embedding_near_dup(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_tables: int = 16,
    bits: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold — the
    LSH-bucketed scale path (no all-pairs join anywhere).

    Candidates come from ``n_tables`` independent random-hyperplane
    sign-pattern tables (``similarity.add_lsh_bucket``): a pair is a
    candidate iff it lands in the same bucket of ANY table; exact
    cosine verifies the candidates. Miss probability per true pair is
    (1 - p^bits)^n_tables with p = 1 - theta/pi — at the defaults
    (16 tables x 2 bits) ~7e-5 even for a marginal cosine-0.5 pair,
    vanishing for real near-dups. More tables = more recall; more bits
    = smaller buckets (bucket join cost ~ n^2 / 2^bits per table), so
    ``bits`` should grow ~log2(n/bucket_target) at scale; default
    adapts from a cheap count.

    Scale shape: bucket ids are plain groupable columns — the
    candidate join partitions by (table, bucket) and AQE splits any
    residual skew; the verify join touches only candidate pairs."""
    import math  # noqa: PLC0415

    from .similarity import add_lsh_bucket, hyperplanes  # noqa: PLC0415

    if bits is None:
        n = vectors.count()
        bits = max(2, int(math.log2(max(n, 128) / 64)))
    dim = len(vectors.select(vec_col).first()[0])

    v = vectors.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn(
        "norm", F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    )
    banded = v
    for t in range(n_tables):
        planes = hyperplanes(dim, bits, seed=seed * 1000 + t)
        banded = add_lsh_bucket(banded, planes, "v", out_col=f"b{t}")
    banded = banded.select(
        "id",
        F.posexplode(F.array(*[F.col(f"b{t}") for t in range(n_tables)])).alias(
            "table", "bucket"
        ),
    )
    cand = (
        banded.withColumnRenamed("id", "id_a")
        .join(banded.select(F.col("id").alias("id_b"), "table", "bucket"), ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    pairs = cand.join(
        v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("norm").alias("na")),
        "id_a",
    ).join(
        v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("norm").alias("nb")),
        "id_b",
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return pairs.select(
        "id_a",
        "id_b",
        (dot / (F.col("na") * F.col("nb"))).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def dedup_survivors(docs: DataFrame, dup_pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id of each near-dup cluster (union-find-lite:
    a doc survives unless it appears as the larger side of any pair)."""
    losers = dup_pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")


def decontaminate(
    docs: DataFrame,
    benchmark_texts: list[str],
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word
    ``n``-gram with an evaluation set — the standard train/test-leak
    guard (GPT-3-style 13-gram check, scaled to the corpus's token
    granularity by ``n``).

    -> (doc_id, contaminated, n_hits): ``n_hits`` = number of DISTINCT
    benchmark n-grams the doc contains.

    Scale shape: the benchmark side is tiny by construction (an eval
    set, not a corpus), so its distinct shingles BROADCAST into the
    corpus shingle stream — one scan of the corpus, a broadcast hash
    join, one map-side-combinable count; no corpus self-join anywhere.
    """
    spark = docs.sparkSession
    bench = spark.createDataFrame(
        [(i, t) for i, t in enumerate(benchmark_texts)], "bid long, text string"
    )
    bench_sh = shingles(bench, n=n, id_col="bid").select("shingle").distinct()
    corpus_sh = shingles(docs, n=n, id_col=id_col, text_col=text_col)
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits") > 0, F.lit(False)).alias("contaminated"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        )
    )


def duplicate_span_coverage(
    docs: DataFrame,
    window: int = 16,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring contained-duplicate detection (the span-level
    dedup of Lee et al., "Deduplicating Training Data Makes Language
    Models Better"): a token span is DUPLICATED iff the identical
    ``window``-token sequence appears in >= ``min_docs`` distinct docs.

    -> (doc_id, dl, dup_windows, covered_tokens, dup_frac):
    ``dup_windows`` = this doc's stride-1 windows whose exact text
    recurs elsewhere; ``covered_tokens`` = |union of token positions
    under any duplicated window| (overlapping windows merged by
    position, not double-counted); ``dup_frac`` = covered/dl — the
    cut-or-keep signal span-dedup pipelines threshold on. Docs shorter
    than ``window`` have no windows (0 / 0.0), matching the paper's
    minimum-match length.

    Scale shape: stride-1 windows are ONE ROW PER TOKEN — the same
    cardinality as the tokenize explode the index build already pays —
    and each carries a fixed-width md5, so the window->df agg is
    map-side combinable on exactly that stream. Only windows that
    prove duplicated re-explode (x ``window``) for position-union;
    on a mostly-unique corpus that's a sliver of the input. The join
    of dup fingerprints back to windows is a hash join on fp (both
    sides partitioned by fp, no skew: a single fp's row count is its
    true duplication count, which is the quantity being measured).
    At 10^12 docs the standard refinement is a stride-s candidate
    pass (s ~ window/2 still catches every span >= window + s) before
    the stride-1 verify — the plan shape is unchanged, so this
    operator IS the verify stage of that pipeline.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_for_scoring(F.col(text_col)).alias("toks"),
    ).select("doc_id", "toks", F.size("toks").alias("dl"))
    wins = (
        toks.select(
            "doc_id",
            "toks",
            F.explode(
                F.when(
                    F.col("dl") >= window,
                    F.sequence(F.lit(1), F.col("dl") - window + 1),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("pos"),
        )
        .select(
            "doc_id",
            "pos",
            F.md5(F.concat_ws(" ", F.slice("toks", F.col("pos"), window))).alias("fp"),
        )
    )
    dup_fps = (
        wins.groupBy("fp")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("fp")
    )
    dup_wins = wins.join(dup_fps, "fp").select("doc_id", "pos")
    counts = dup_wins.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dup_windows"))
    coverage = (
        dup_wins.select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + window - 1)).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.count_distinct("p").alias("covered_tokens"))
    )
    return (
        toks.select("doc_id", F.col("dl").cast("long").alias("dl"))
        .join(counts, "doc_id", "left")
        .join(coverage, "doc_id", "left")
        .select(
            "doc_id",
            "dl",
            F.coalesce("dup_windows", F.lit(0)).cast("long").alias("dup_windows"),
            F.coalesce("covered_tokens", F.lit(0)).cast("long").alias("covered_tokens"),
            F.when(
                F.col("dl") > 0,
                F.round(F.coalesce("covered_tokens", F.lit(0)) / F.col("dl"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )


def contamination_span_coverage(
    docs: DataFrame,
    benchmark_texts: list[str],
    window: int = 8,
    threshold: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Span-level benchmark decontamination (the Llama-3 refinement of
    the GPT-3 doc-drop rule): instead of dropping any doc sharing ONE
    eval n-gram (``decontaminate`` — brutal on short boilerplate
    n-grams), measure WHAT FRACTION of the doc's tokens sit under an
    eval-set ``window``-gram match and drop only docs above
    ``threshold``.

    -> (doc_id, dl, hit_windows, covered_tokens, coverage,
    contaminated): ``hit_windows`` = this doc's stride-1 token windows
    whose exact text occurs in the eval set; ``covered_tokens`` =
    |union of token positions under any hit window| (overlaps merged,
    never double-counted — the same position-union semantics as
    ``duplicate_span_coverage``); ``coverage`` = covered/dl;
    ``contaminated`` = coverage > threshold. Docs shorter than
    ``window`` can't match (0 / 0.0 / false).

    Scale shape: identical to ``decontaminate`` — the eval side is
    tiny by construction, so its distinct window fingerprints
    BROADCAST into the corpus window stream (one row per corpus token,
    the cardinality the index build already pays); only matched
    windows re-explode (x ``window``) for the position union. No
    corpus self-join, no shuffle keyed on anything hotter than doc_id.
    """
    spark = docs.sparkSession
    bench = spark.createDataFrame(
        [(i, t) for i, t in enumerate(benchmark_texts)], "bid long, text string"
    )
    bench_fps = (
        bench.select(tokenize_for_scoring(F.col("text")).alias("toks"))
        .select("toks", F.size("toks").alias("dl"))
        .select(
            "toks",
            F.explode(
                F.when(
                    F.col("dl") >= window,
                    F.sequence(F.lit(1), F.col("dl") - window + 1),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("pos"),
        )
        .select(
            F.md5(F.concat_ws(" ", F.slice("toks", F.col("pos"), window))).alias("fp")
        )
        .distinct()
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_for_scoring(F.col(text_col)).alias("toks"),
    ).select("doc_id", "toks", F.size("toks").alias("dl"))
    wins = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.when(
                F.col("dl") >= window,
                F.sequence(F.lit(1), F.col("dl") - window + 1),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("pos"),
    ).select(
        "doc_id",
        "pos",
        F.md5(F.concat_ws(" ", F.slice("toks", F.col("pos"), window))).alias("fp"),
    )
    hit_wins = wins.join(F.broadcast(bench_fps), "fp").select("doc_id", "pos")
    counts = hit_wins.groupBy("doc_id").agg(F.count(F.lit(1)).alias("hit_windows"))
    coverage = (
        hit_wins.select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + window - 1)).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.count_distinct("p").alias("covered_tokens"))
    )
    cov = F.when(
        F.col("dl") > 0,
        F.round(F.coalesce("covered_tokens", F.lit(0)) / F.col("dl"), 6),
    ).otherwise(F.lit(0.0))
    return (
        toks.select("doc_id", F.col("dl").cast("long").alias("dl"))
        .join(counts, "doc_id", "left")
        .join(coverage, "doc_id", "left")
        .select(
            "doc_id",
            "dl",
            F.coalesce("hit_windows", F.lit(0)).cast("long").alias("hit_windows"),
            F.coalesce("covered_tokens", F.lit(0)).cast("long").alias("covered_tokens"),
            cov.alias("coverage"),
            (cov > threshold).alias("contaminated"),
        )
    )


def dedup_clusters(docs: DataFrame, dup_pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, canonical, is_canonical): TRANSITIVE near-dup clusters —
    connected components over the dup-pair graph, canonical = min doc_id
    per cluster.

    Near-duplication is not transitive (a~b and b~c can hold with a!~c:
    crawl chains, template drift), but removal policy must be — the
    pairwise rule in ``dedup_survivors`` ("drop the larger side of each
    pair") can keep BOTH ends of an a~b~c chain's outer pair or drop a
    doc whose only near-dup was itself dropped. Clustering first, then
    keeping exactly one canonical per cluster, is the policy production
    dedup pipelines (and the MinHash literature) actually use.

    Docs in no pair are their own singleton cluster (canonical = self).

    Scale shape: the pair graph is tiny relative to the corpus (only
    near-dups appear), and ``graph.connected_components`` is min-label
    propagation — O(diameter of a dup cluster) rounds, and dup-cluster
    diameters are small (chains longer than a few hops mean the cluster
    is one template family anyway). One left join puts labels back on
    the corpus."""
    from .graph import connected_components  # noqa: PLC0415

    edges = dup_pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = connected_components(edges).select(
        F.col("id").alias("doc_id"), F.col("comp").alias("canonical")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("canonical", F.col("doc_id")).alias("canonical"),
            (F.coalesce("canonical", F.col("doc_id")) == F.col("doc_id")).alias(
                "is_canonical"
            ),
        )
    )


def _md5_hash64(col) -> F.Column:
    """Engine-portable 60-bit hash: first 15 md5 hex chars as a long
    (DuckDB mirror: CAST(concat('0x', substr(md5(x), 1, 15)) AS
    BIGINT) — bit-identical, the same trick the sampler uses)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10)
        .cast("decimal(20,0)")
        .cast("long")
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, fp): winnowing fingerprints (Schleimer, Wilkerson
    & Aiken, SIGMOD 2003 — the MOSS algorithm): hash every k-token
    gram, slide a w-hash window, keep each window's MINIMUM hash
    (ties: leftmost — the paper's robust variant keeps the rightmost;
    leftmost is pinned here because both engines' array_position /
    list_position are first-occurrence, making the oracle exact).
    Guarantee: any shared token run of length >= w + k - 1 yields at
    least one shared fingerprint, while only ~2/(w+1) of grams are
    kept. Docs shorter than a full window keep the minimum of what
    they have; docs with < k tokens emit nothing.

    Scale shape: entirely per-doc array arithmetic in one JVM
    projection (no shuffle, no self-join — the suffix-array
    alternative shuffles the corpus); the only agg is the final
    DISTINCT on (doc, pos, fp), combinable."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_for_scoring(F.col(text_col)).alias("arr"),
    ).filter(F.size("arr") >= k)
    grams = toks.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("arr") - (k - 1)),
            lambda i: _md5_hash64(F.concat_ws(" ", F.slice("arr", i, k))),
        ).alias("g"),
    )
    sel = grams.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size("g") - (w - 1), F.lit(1))),
                lambda j: F.struct(
                    (j + F.array_position(F.slice("g", j, w), F.array_min(F.slice("g", j, w))) - 1).alias("pos"),
                    F.array_min(F.slice("g", j, w)).alias("fp"),
                ),
            )
        ).alias("s"),
    )
    return sel.select("doc_id", F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp")).distinct()


def winnow_dup_pairs(
    docs: DataFrame,
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_bucket: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, n_shared): near-duplicate candidate pairs — docs
    sharing >= ``min_shared`` winnowing fingerprint VALUES, doc_a <
    doc_b. Fingerprints seen in more than ``max_bucket`` docs are
    dropped before the self-join (the boilerplate guard every
    bucket-join dedup here uses), so the pair fan-out is bounded by
    max_bucket^2 per fingerprint instead of df^2.

    Scale shape: one fingerprint pass (see winnow_fingerprints), one
    hot-bucket filter (combinable count), one equi-join on fp, one
    pair-count agg — the MinHash-LSH plan with winnowing's positional
    guarantee instead of probabilistic recall."""
    fps = winnow_fingerprints(docs, k, w, id_col, text_col).select(
        "doc_id", "fp"
    ).distinct()
    hot = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n")).filter(
        F.col("n") <= max_bucket
    )
    kept = fps.join(hot.select("fp"), "fp")
    a = kept.select(F.col("doc_id").alias("doc_a"), "fp")
    b = kept.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ---- corpus-level line dedup (RefinedWeb / CCNet boilerplate removal) ----


def doc_lines(
    docs: DataFrame,
    window: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, line_idx, line): the token stream cut into
    NON-overlapping ``window``-token chunks ("lines" — web text in
    this corpus carries no newlines, so the deterministic chunking
    stands in for physical lines; a real crawl would split on '\\n'
    first and fall back to this for wall-of-text pages). The trailing
    partial chunk is kept. One output row per ``window`` input tokens
    — corpus/W rows, no quadratic blowup."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_for_scoring(F.col(text_col)).alias("toks"),
    ).filter(F.size("toks") > 0)
    n_lines = F.ceil(F.size("toks") / F.lit(float(window))).cast("int")
    return toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_lines - 1),
                lambda i: F.array_join(F.slice("toks", i * window + 1, window), " "),
            )
        ).alias("line_idx", "line"),
    )


def line_dedup(
    docs: DataFrame,
    window: int = 5,
    max_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RefinedWeb/CCNet-style corpus-level line deduplication: a line
    (``window``-token chunk, see ``doc_lines``) occurring in MORE than
    ``max_df`` distinct documents is boilerplate (site chrome, cookie
    banners, navigation) and is removed from every document that
    carries it. Returns one row per input doc:
    ``(doc_id, n_lines, n_removed, kept_md5)`` where ``kept_md5`` is
    the md5 of the surviving lines re-joined in order (md5('') for a
    fully-boilerplate doc).

    Reference parity: none (serving loop); pipeline extension — the
    line-dedup stage of RefinedWeb (Penedo et al. 2023 §3.3) and CCNet.

    Scale shape (100 TB):
    - lines = corpus/W rows; the line-df agg groups on the 60-bit md5
      hash of the line (narrow shuffle key, not the string) after a
      per-doc dropDuplicates — both combinable hash aggs.
    - the boilerplate set (df > max_df) is a tiny fraction of the
      line vocabulary; removal is a LEFT ANTI equijoin on the hash —
      broadcastable when small, AQE picks at runtime.
    - reassembly is one groupBy(doc_id) with an array_sort over
      (line_idx, line) structs — single shuffle, JVM-side throughout.
    """
    lines = doc_lines(docs, window, id_col, text_col).withColumn(
        "h", _md5_hash64(F.col("line"))
    )
    boiler = (
        lines.dropDuplicates(["doc_id", "h"])
        .groupBy("h")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("h")
    )
    kept = lines.join(boiler, "h", "left_anti")
    kept_agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                    lambda s: s["line"],
                ),
                " ",
            )
        ).alias("kept_md5"),
    )
    totals = lines.groupBy("doc_id").agg(F.count("*").alias("n_lines"))
    return (
        totals.join(kept_agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_removed"
            ),
            F.coalesce(F.col("kept_md5"), F.md5(F.lit(""))).alias("kept_md5"),
        )
        .orderBy("doc_id")
    )


def _lsh_bands(
    signatures: DataFrame, n_bands: int, rows_per_band: int
) -> DataFrame:
    """(doc_id, band, bucket) — the banded-bucket form of a signature
    table (same banding as minhash_lsh_candidates)."""
    return signatures.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
        "sig",
    ).select(
        "doc_id",
        "band",
        F.md5(
            F.array_join(
                F.slice("sig", F.col("band") * rows_per_band + 1, rows_per_band), "|"
            )
        ).alias("bucket"),
    )


def incremental_minhash_dedup(
    new_docs: DataFrame,
    base_docs: DataFrame,
    threshold: float = 0.7,
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int = MAX_BUCKET_SIZE,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_signatures: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup detection for a crawl DELTA against an
    already-deduped base corpus — the production re-crawl shape: at
    100 TB you never re-pair the base against itself; you persist the
    base's MinHash signatures once and, per ingest, band only the
    delta and bucket-join it against the stored base bands.

    Returns (doc_a, doc_b, jaccard, pair_kind) for every verified
    pair with exact shingle Jaccard >= threshold, where pair_kind is
    'delta_base' (doc_a = delta doc, doc_b = base doc) or
    'delta_delta' (both in the delta, doc_a < doc_b). Base-base pairs
    are by-construction absent — that corpus was already deduped.

    Scale shape: signature/banding cost is O(delta) (base signatures
    are the persisted artifact — pass ``base_signatures`` to skip
    recomputing them); the candidate join is bucket-equality
    delta->base, so its cost scales with the delta and the bucket cap,
    never base^2. Bucket sizes are counted over the UNION of base and
    delta bands, so a boilerplate bucket that only becomes degenerate
    WITH the delta's arrivals is still dropped (same
    ``max_bucket_size`` law as the batch operator). Verification
    (exact Jaccard) touches only candidate docs.
    """
    rows_per_band = n_hashes // n_bands
    base_sel = base_docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    new_sel = new_docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    # A re-crawled url can appear in BOTH base and delta under the same
    # doc_id; the delta row is the current version. Drop the shadowed
    # base rows (broadcast anti-join on the delta's ids — the delta is
    # the small side by construction) before banding/verification:
    # otherwise union_docs would carry duplicate doc_id rows that
    # inflate shingle counts in the exact-Jaccard verify, and a delta
    # doc would emit a self-pair against its own stale base row.
    delta_ids = new_sel.select("doc_id")
    base_sel = base_sel.join(F.broadcast(delta_ids), "doc_id", "left_anti")
    sig_base = (
        base_signatures
        if base_signatures is not None
        else minhash_signatures(base_sel, n_hashes, shingle_n)
    )
    # base_signatures is the persisted artifact and may predate the
    # delta — shadowed ids must be dropped from it too.
    sig_base = sig_base.join(F.broadcast(delta_ids), "doc_id", "left_anti")
    sig_new = minhash_signatures(new_sel, n_hashes, shingle_n)
    bb = _lsh_bands(sig_base, n_bands, rows_per_band)
    bn = _lsh_bands(sig_new, n_bands, rows_per_band)
    sizes = (
        bb.unionByName(bn)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    keep = sizes.filter(F.col("n") <= max_bucket_size).select("band", "bucket")
    bb = bb.join(keep, ["band", "bucket"])
    bn = bn.join(keep, ["band", "bucket"])
    delta_base = (
        bn.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
        .join(bb.select(F.col("doc_id").alias("doc_b"), "band", "bucket"),
              ["band", "bucket"])
        .select("doc_a", "doc_b")
        .distinct()
        .withColumn("pair_kind", F.lit("delta_base"))
    )
    delta_delta = (
        bn.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
        .join(bn.select(F.col("doc_id").alias("doc_b"), "band", "bucket"),
              ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .withColumn("pair_kind", F.lit("delta_delta"))
    )
    cands = delta_base.unionByName(delta_delta)
    union_docs = base_sel.unionByName(new_sel)
    verified = ngram_jaccard_pairs(
        union_docs, cands.select("doc_a", "doc_b").distinct(), shingle_n
    )
    return (
        cands.join(verified, ["doc_a", "doc_b"])
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard", "pair_kind")
    )


def streaming_exact_dedup(
    stream_docs: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
    key: str = "content",
    url_col: str = "url",
) -> DataFrame:
    """First-arrival-wins exact dedup ON THE INGEST STREAM: drop a
    page whose content digest (``key="content"``, sha256 over the text
    column, computed JVM-side) or url (``key="url"``) was already seen
    within the watermark horizon — the dedup-at-the-door stage of a
    continuous crawl, upstream of ``plans/streaming_ingest``.

    Built on ``dropDuplicatesWithinWatermark``: dedup state is BOUNDED
    by the watermark horizon, which is the only shape that survives at
    100 TB/day (an unbounded seen-set would grow forever); re-crawls
    that recur beyond the horizon are deliberately let through and
    handled by the batch machinery downstream (``exact_dedup`` /
    ``incremental_minhash_dedup`` on the sealed segments, newest-wins
    versioning at query time) — the streaming stage exists to stop the
    short-horizon duplicate storm (mirrors, re-queued fetches) before
    it inflates segment builds."""
    if key == "content":
        keyed = stream_docs.withColumn("_dd", F.sha2(F.col(text_col), 256))
    elif key == "url":
        keyed = stream_docs.withColumn("_dd", F.col(url_col))
    else:
        raise ValueError(f"key must be 'content' or 'url', got {key!r}")
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_dd"])
        .drop("_dd")
    )
