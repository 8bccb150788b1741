"""Streaming-sketch operators: Misra-Gries heavy hitters and KMV
distinct-value sketches over the corpus token stream.

The exact per-term count table (``term_freqs`` -> groupBy) is the
precise answer but shuffles the full vocabulary; a crawl-curation loop
that only wants "the few thousand terms dominating the token budget"
(stopword mining, boilerplate-token discovery, tokenizer-vocab seeding)
can take a bounded-memory sketch instead. Misra-Gries is the classic
deterministic one: capacity k, guaranteed to contain every term with
frequency > N/k, each reported count an UNDER-estimate by at most the
total decrement weight.

Reference parity note: the reference (joonsoome/embed-rerank) has no
corpus analytics; this extends the engine's pipeline surface
(SURVEY.md §2 pipeline extensions).

Scale shape (100 TB):
- One pass over the token stream, per-partition sketches of <= k
  counters built inside ``mapInPandas`` — per-BATCH vectorized
  (pandas ``value_counts`` + merge of unique-term Series, never a
  per-token Python loop), memory bounded by k per task.
- Sketches are mergeable (Agarwal et al. 2012, "Mergeable summaries"):
  summing counters then subtracting the (k+1)-th largest keeps the MG
  guarantee. The merge here is one tiny groupBy over <= k rows per
  partition — combinable, no hot key.
- Exactness escape hatch: with capacity >= the partition's distinct
  term count no decrement ever fires, every count is exact and
  ``err_ub`` is 0 — which is what the DuckDB oracle pins.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.udfs import tokenize_for_scoring

# sentinel term for per-partition decrement-total rows ('' can never be
# a token: the tokenizer drops empties)
_DECR_KEY = ""


def _mg_partition(batches: Iterator[pd.DataFrame], capacity: int) -> Iterator[pd.DataFrame]:
    """One Misra-Gries sketch over this partition's token stream.

    Per batch: ``value_counts`` (vectorized) then a Series add on the
    unique terms only. When the sketch exceeds ``capacity``, subtract
    the (capacity+1)-th largest counter from everything and drop the
    non-positive rows — the mergeable-summaries reduction, equivalent
    to a run of classic MG decrements and carrying the same guarantee:
    true_count - counter <= total subtracted."""
    sketch = pd.Series(dtype="int64")
    decr = 0
    for pdf in batches:
        counts = pdf["term"].value_counts()
        sketch = sketch.add(counts, fill_value=0).astype("int64")
        if len(sketch) > capacity:
            kth = int(sketch.nlargest(capacity + 1).iloc[-1])
            decr += kth
            sketch = sketch - kth
            sketch = sketch[sketch > 0]
    out = sketch.rename_axis("term").reset_index(name="cnt")
    out["term"] = out["term"].astype(str)
    if decr:
        out = pd.concat(
            [out, pd.DataFrame({"term": [_DECR_KEY], "cnt": [decr]})],
            ignore_index=True,
        )
    yield out


def heavy_hitters(
    docs: DataFrame,
    capacity: int = 4096,
    top_n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(rank, term, count_lb, err_ub): the ``top_n`` heaviest corpus
    terms by Misra-Gries sketch count, engine tie semantics (count
    desc, term asc).

    ``count_lb`` is the summed sketch count — a lower bound on the true
    frequency; ``err_ub`` (same for every row) is the summed decrement
    weight across partitions — the maximum under-count, and the bound
    below which terms may be missing entirely. With ``capacity`` >=
    the distinct-term count the sketch is exact: counts equal the true
    frequencies and ``err_ub`` = 0.
    """
    toks = docs.select(
        F.explode(tokenize_for_scoring(F.col(text_col))).alias("term")
    )
    sketches = toks.mapInPandas(
        lambda it: _mg_partition(it, capacity), schema="term string, cnt long"
    )
    merged = sketches.groupBy("term").agg(F.sum("cnt").alias("cnt"))
    err = merged.filter(F.col("term") == _DECR_KEY).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("err_ub")
    )
    hitters = (
        merged.filter(F.col("term") != _DECR_KEY)
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(top_n)
    )
    w = F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("term")))
    return hitters.crossJoin(F.broadcast(err)).select(
        w.alias("rank"),
        "term",
        F.col("cnt").alias("count_lb"),
        "err_ub",
    )


# ---- KMV (K-Minimum-Values) distinct-count sketch ----

# normalization denominator for the 60-bit md5 hash: 16^15
_H60_SPACE = float(16**15)


def _md5_hash60(col) -> F.Column:
    """Engine-portable 60-bit hash: first 15 md5 hex chars as a long
    (DuckDB mirror: ``CAST(concat('0x', substr(md5(x), 1, 15)) AS
    BIGINT)`` — bit-identical, the same trick the dedup family and
    the sampler use)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10)
        .cast("decimal(20,0)")
        .cast("long")
    )


def _kmv_partial(batches, k: int):
    """Per-partition partial: the <= k smallest DISTINCT hashes per
    group seen in this partition. Vectorized pandas (drop_duplicates +
    groupby.nsmallest), bounded memory (k per live group), no
    per-value Python loop. Min-k is a mergeable summary: the global
    min-k of a union equals the min-k over the concatenated partials,
    so the follow-up window pass needs only ``partitions * groups * k``
    rows — never the raw value stream."""
    state = pd.DataFrame({"grp": pd.Series(dtype="object"), "h": pd.Series(dtype="int64")})
    for pdf in batches:
        both = pd.concat([state, pdf[["grp", "h"]]], ignore_index=True)
        both = both.drop_duplicates(["grp", "h"])
        state = (
            both.sort_values(["grp", "h"], kind="stable")
            .groupby("grp", sort=False)
            .head(k)
            .reset_index(drop=True)
        )
    yield state


def _grouped_values(
    docs: DataFrame, group_col: str, text_col: str, granularity: str
) -> DataFrame:
    """(grp, value) stream the sketch counts distinct values of:
    ``term`` = whitespace tokens, ``shingle3`` = word 3-grams (the
    dedup family's shingle definition — space-joined token windows)."""
    toks = docs.select(
        F.col(group_col).alias("grp"),
        tokenize_for_scoring(F.col(text_col)).alias("toks"),
    )
    if granularity == "term":
        return toks.select("grp", F.explode("toks").alias("value"))
    if granularity != "shingle3":
        raise ValueError(f"unknown granularity: {granularity!r}")
    n = 3
    return toks.filter(F.size("toks") >= n).select(
        "grp",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - n),
                lambda i: F.array_join(F.slice("toks", i + 1, n), " "),
            )
        ).alias("value"),
    )


def _kmv_minset(values: DataFrame, k: int) -> DataFrame:
    """(grp, h): the k smallest distinct 60-bit hashes per group —
    the KMV sketch itself. Partial min-k per partition (bounded
    memory), then one tiny per-group window over ``partitions x
    groups x k`` candidate rows."""
    hashed = values.select("grp", _md5_hash60(F.col("value")).alias("h"))
    partials = hashed.mapInPandas(
        lambda it: _kmv_partial(it, k), schema="grp string, h long"
    )
    w = Window.partitionBy("grp").orderBy(F.asc("h"))
    return (
        partials.dropDuplicates(["grp", "h"])
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """(grp, n_held, est) from a ``(grp, h)`` min-hash sketch:
    ``n_held`` = hashes retained (= min(k, true distinct count));
    ``est`` = n_held while unsaturated, else the unbiased KMV
    estimator ``(k-1) / normalized_kth_min``."""
    agg = sketch.groupBy("grp").agg(
        F.count("*").alias("n_held"), F.max("h").alias("kth_h")
    )
    est = F.when(
        F.col("n_held") < k, F.col("n_held").cast("double")
    ).otherwise(F.lit(float(k - 1)) / (F.col("kth_h") / F.lit(_H60_SPACE)))
    return agg.select("grp", "n_held", F.round(est, 6).alias("est")).orderBy("grp")


def kmv_cardinality(
    docs: DataFrame,
    k: int = 64,
    group_col: str = "lang",
    text_col: str = "text",
    granularity: str = "shingle3",
) -> DataFrame:
    """ES ``cardinality``-aggregation analogue: per-group approximate
    distinct-value count via a K-Minimum-Values sketch (Bar-Yossef et
    al. 2002; Beyer et al. 2007). Returns one row per group:
    ``(grp, n_held, est)`` — see ``kmv_estimate``.

    Reference parity: none (the reference has no analytics); this is
    the ES `cardinality` agg re-expressed as a mergeable Spark sketch.

    Scale shape (100 TB): hashing + per-partition min-k partials run
    inside ``mapInPandas`` with memory bounded by k per group; only
    ``partitions x groups x k`` candidate rows shuffle into the final
    per-group window. The k-min-hash set itself is the persistable
    artifact — sketches from two snapshots/units union-and-truncate to
    the sketch of the union corpus (no re-scan), which a plain
    ``count(distinct)`` cannot do. The estimator is deterministic
    given the md5 hash, so the DuckDB oracle reproduces it bit-for-bit
    (est rounded to 6dp).
    """
    values = _grouped_values(docs, group_col, text_col, granularity)
    return kmv_estimate(_kmv_minset(values, k), k)


def kmv_merge(sketch_a: DataFrame, sketch_b: DataFrame, k: int) -> DataFrame:
    """Union two KMV sketches (rows of ``(grp, h)`` min-hash sets) and
    re-truncate to the k smallest distinct hashes per group — the
    mergeable-summaries property: the result is exactly the sketch that
    a single pass over the concatenated corpora would have built."""
    w = Window.partitionBy("grp").orderBy(F.asc("h"))
    return (
        sketch_a.unionByName(sketch_b)
        .dropDuplicates(["grp", "h"])
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def kmv_minhashes(
    docs: DataFrame,
    k: int = 64,
    group_col: str = "lang",
    text_col: str = "text",
    granularity: str = "shingle3",
) -> DataFrame:
    """The raw per-group k-min-hash set ``(grp, h)`` — the persistable
    sketch artifact ``kmv_merge`` unions. Same partial-then-window plan
    as ``kmv_cardinality``."""
    return _kmv_minset(_grouped_values(docs, group_col, text_col, granularity), k)


def kmv_set_ops(
    docs: DataFrame,
    k: int = 64,
    group_col: str = "source",
    text_col: str = "text",
    granularity: str = "shingle3",
) -> DataFrame:
    """Sketch-space set algebra between every unordered group pair —
    the DataSketches theta-sketch union/intersection pattern (Beyer et
    al. 2007 §4; Dasgupta et al. 2016) over the engine's KMV sketches:
    estimate |A ∪ B|, Jaccard(A, B), and |A ∩ B| of two groups'
    distinct-value sets WITHOUT comparing the sets themselves.

    -> (grp_a, grp_b, n_union_held, union_est, jaccard, intersect_est)
    for every pair grp_a < grp_b:
    - union sketch = k smallest distinct hashes of sketch_a ∪ sketch_b
      (the mergeable-summaries closure: exactly the sketch of the
      concatenated corpora), ``union_est`` = its KMV estimate;
    - ``jaccard`` = fraction of union-sketch hashes present in BOTH
      group sketches (each union-sketch hash is a uniform sample of
      A ∪ B, and membership in the k-min sets is exact for hashes this
      small), rounded 6dp;
    - ``intersect_est`` = jaccard * union_est (the standard KMV
      intersection composition; never estimated directly — min-k of an
      intersection is not a sketch of it).

    Why it matters at 100 TB: vocabulary/shingle overlap between two
    crawls, sources, or snapshots via exact distinct-intersection is a
    full shuffle of both value streams; the sketches are groups x k
    rows, persistable, and this whole operator is arithmetic over
    them. The estimator is deterministic given md5, so the DuckDB
    oracle reproduces it bit-for-bit.
    """
    sketch = _kmv_minset(_grouped_values(docs, group_col, text_col, granularity), k)
    pairs = (
        sketch.select(F.col("grp").alias("grp_a"))
        .distinct()
        .join(sketch.select(F.col("grp").alias("grp_b")).distinct())
        .filter(F.col("grp_a") < F.col("grp_b"))
    )
    # union candidates: both sketches' hashes, deduped, k smallest per pair
    uh = (
        pairs.join(
            F.broadcast(sketch),
            (F.col("grp") == F.col("grp_a")) | (F.col("grp") == F.col("grp_b")),
        )
        .select("grp_a", "grp_b", "h")
        .distinct()
    )
    w = Window.partitionBy("grp_a", "grp_b").orderBy(F.asc("h"))
    union_sketch = uh.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
    # membership of each union-sketch hash in the per-group k-min sets
    in_a = sketch.select(F.col("grp").alias("grp_a"), "h").withColumn(
        "ina", F.lit(1)
    )
    in_b = sketch.select(F.col("grp").alias("grp_b"), "h").withColumn(
        "inb", F.lit(1)
    )
    marked = (
        union_sketch.join(F.broadcast(in_a), ["grp_a", "h"], "left")
        .join(F.broadcast(in_b), ["grp_b", "h"], "left")
    )
    agg = marked.groupBy("grp_a", "grp_b").agg(
        F.count("*").alias("n_union_held"),
        F.max("h").alias("kth_h"),
        F.sum(
            F.when(F.col("ina").isNotNull() & F.col("inb").isNotNull(), 1).otherwise(0)
        ).alias("n_both"),
    )
    union_est = F.when(
        F.col("n_union_held") < k, F.col("n_union_held").cast("double")
    ).otherwise(F.lit(float(k - 1)) / (F.col("kth_h") / F.lit(_H60_SPACE)))
    return (
        agg.withColumn("union_est", F.round(union_est, 6))
        .withColumn(
            "jaccard",
            F.round(F.col("n_both") / F.col("n_union_held"), 6),
        )
        .withColumn(
            "intersect_est",
            F.round(F.col("n_both") / F.col("n_union_held") * union_est, 6),
        )
        .select(
            "grp_a", "grp_b", "n_union_held", "union_est", "jaccard",
            "intersect_est",
        )
        .orderBy("grp_a", "grp_b")
    )


# ---- Bloom filter (mergeable membership sketch) ----

# bits per filter word: 60 keeps every mask (1 << bit) strictly positive
# in a signed 64-bit long on BOTH engines (Spark and DuckDB), so the
# bit_or aggregation never touches the sign bit and the oracle is
# bit-identical. A JVM-only implementation would use 64.
_BLOOM_WORD_BITS = 60


def _bloom_bit_positions(col, m_bits: int, k: int) -> F.Column:
    """Array of the value's ``k`` bit positions in an ``m_bits``-wide
    Bloom filter. Hash family: the engine-portable 60-bit md5 hash of
    ``"<i>:<value>"`` for i in 0..k-1 (DuckDB mirror:
    ``CAST(concat('0x', substr(md5(concat(i, ':', v)), 1, 15)) AS
    BIGINT) % m``), the same construction the KMV/dedup family uses —
    deterministic across engines, partitionings, and sessions."""
    return F.array(
        *[
            _md5_hash60(F.concat(F.lit(f"{i}:"), col)) % F.lit(m_bits)
            for i in range(k)
        ]
    )


def bloom_build(
    values: DataFrame, value_col: str, m_bits: int = 30720, k: int = 4
) -> DataFrame:
    """(word_idx, word) — a Bloom filter over the value stream as a
    table of 60-bit words (only words with >= 1 set bit appear; an
    absent word_idx is all-zero).

    The membership structure the exact-dedup family needs at corpus
    scale (Dolma's cross-shard URL/paragraph dedup runs exactly this):
    INSERTED VALUES ALWAYS TEST POSITIVE (no false negatives), absent
    values test positive with probability ~(1 - e^(-k·n/m))^k, and two
    filters over different shards MERGE by bitwise OR into exactly the
    filter of the union — so per-shard builds need no coordination.

    Scale shape (100 TB): one combinable hash aggregation. Each value
    explodes into k (word_idx, mask) rows — bounded fan-out — and
    ``groupBy(word_idx).agg(bit_or)`` is map-side combinable, so the
    shuffle carries at most ``partitions × live_words`` rows. The
    filter itself is m/60 rows however large the input: size m for the
    expected distinct count (m = 14.4 GB of words per 10^10 values at
    1% fp) and it stays a well-partitioned table; probes join on
    word_idx (broadcast when small, co-partitioned otherwise). No
    driver-side state at any size.
    """
    if m_bits < _BLOOM_WORD_BITS or k < 1:
        raise ValueError("m_bits must be >= 60 and k >= 1")
    pos = values.select(
        F.explode(
            _bloom_bit_positions(F.col(value_col), m_bits, k)
        ).alias("p")
    )
    return (
        pos.select(
            (F.col("p") / _BLOOM_WORD_BITS).cast("long").alias("word_idx"),
            F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(p % {_BLOOM_WORD_BITS} AS INT))"
        ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bitwise-OR union of two same-geometry filters: exactly the
    filter of the concatenated value streams (the mergeability law the
    tests pin) — per-shard filters combine without re-reading data."""
    return (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.expr("bit_or(word)").alias("word"))
    )


def bloom_contains(
    filter_words: DataFrame,
    probes: DataFrame,
    value_col: str,
    probe_col: str,
    m_bits: int = 30720,
    k: int = 4,
    broadcast_filter: bool = True,
) -> DataFrame:
    """(probe, contained) — test each probe value against the filter:
    contained iff ALL k of its bits are set. ``broadcast_filter=True``
    for planning-sized filters; at 10^12-value geometries leave it
    False and Catalyst plans a co-partitioned join on word_idx."""
    ppos = probes.select(
        F.col(probe_col).alias("probe"),
        F.explode(
            _bloom_bit_positions(F.col(value_col), m_bits, k)
        ).alias("p"),
    ).select(
        "probe",
        (F.col("p") / _BLOOM_WORD_BITS).cast("long").alias("word_idx"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(p % {_BLOOM_WORD_BITS} AS INT))"
        ).alias("mask"),
    )
    fw = F.broadcast(filter_words) if broadcast_filter else filter_words
    hits = ppos.join(fw, "word_idx", "left").select(
        "probe",
        F.when(
            F.col("word").isNotNull()
            & (F.col("word").bitwiseAND(F.col("mask")) != 0),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("hit"),
    )
    return hits.groupBy("probe").agg(
        (F.sum("hit") == F.lit(k)).alias("contained")
    )


# ---------------------------------------------------------------------------
# HyperLogLog: the industry-standard mergeable cardinality sketch
# (Flajolet et al. 2007, "HyperLogLog: the analysis of a near-optimal
# cardinality estimation algorithm"; the ES `cardinality` aggregation
# and Spark's own approx_count_distinct are HLL-family). Complements
# the KMV sketch above: HLL state is a FIXED 2^p-register array per
# group (KMV holds k hashes), so at 10^12 values the persisted sketch
# is ~m bytes per group regardless of k-vs-cardinality, and two
# snapshots' sketches merge by element-wise register MAX — the
# classic "count distinct users across daily partitions without
# re-scanning" shape.
# ---------------------------------------------------------------------------

_HLL_BITS = 60  # md5-portable hash width (see _md5_hash60)


def _hll_alpha(m: int) -> float:
    """Bias-correction constant from the HLL paper (Fig. 3)."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    values: DataFrame, p: int, grp_col: str = "grp", value_col: str = "value"
) -> DataFrame:
    """(grp, j, r) — the non-zero HLL registers per group: ``j`` =
    top-``p`` hash bits (register index), ``r`` = max over the
    group's values of (leading-zero count of the remaining ``60-p``
    bits + 1). One combinable groupBy-MAX — partial aggregation
    collapses each task's stream to <= 2^p rows before the shuffle,
    so the network volume is `tasks x m`, independent of corpus size.

    The rank uses the MSB-length identity ``rank = q - len(bin(w)) + 1``
    (``q+1`` when the low bits are all zero), which the DuckDB oracle
    mirrors bit-for-bit with the same md5 hash."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    q = _HLL_BITS - p
    h = values.select(
        F.col(grp_col).alias("grp"), _md5_hash60(F.col(value_col)).alias("h")
    )
    w = F.col("h").bitwiseAND(F.lit((1 << q) - 1))
    rank = F.when(w == 0, F.lit(q + 1)).otherwise(
        F.lit(q) - F.length(F.bin(w)) + F.lit(1)
    )
    return (
        h.select("grp", F.shiftright("h", q).alias("j"), rank.alias("r"))
        .groupBy("grp", "j")
        .agg(F.max("r").alias("r"))
    )


def hll_estimate(registers: DataFrame, p: int) -> DataFrame:
    """(grp, m, nonzero, est) from a ``(grp, j, r)`` register table:
    the raw HLL estimator ``alpha_m * m^2 / (V + sum 2^-r)`` (the V
    all-zero registers each contribute 2^0 = 1) with the paper's
    small-range linear-counting correction ``m * ln(m / V)`` when the
    raw estimate <= 2.5m and V > 0. No large-range correction — the
    60-bit hash space makes collisions negligible at any realistic
    cardinality. Deterministic given md5, so the DuckDB oracle
    reproduces ``est`` to the 6dp it is rounded to."""
    m = 1 << p
    alpha = _hll_alpha(m)
    agg = registers.groupBy("grp").agg(
        F.count("*").alias("nonzero"),
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("s"),
    )
    v = F.lit(float(m)) - F.col("nonzero")
    raw = F.lit(alpha * m * m) / (v + F.col("s"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("nonzero") < m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(
        "grp",
        F.lit(m).alias("m"),
        "nonzero",
        F.round(est, 6).alias("est"),
    ).orderBy("grp")


def hll_cardinality(
    docs: DataFrame,
    p: int = 9,
    group_col: str = "lang",
    text_col: str = "text",
    granularity: str = "shingle3",
) -> DataFrame:
    """ES ``cardinality`` aggregation via HyperLogLog: per-group
    approximate distinct count of terms or word 3-grams. Returns
    ``(grp, m, nonzero, est)`` — see ``hll_estimate``.

    Reference parity: none (joonsoome/embed-rerank has no analytics);
    this is the ES cardinality agg / Spark approx_count_distinct
    re-expressed with an engine-portable hash so the estimate is
    oracle-checkable, and with the register table exposed as a
    first-class persistable artifact (`hll_registers`) that
    `hll_merge` combines across index units/snapshots without
    re-scanning — the property the opaque built-in sketch does not
    give you.

    Scale shape (100 TB): hash + rank are JVM codegen (md5 / conv /
    bin / shiftright — no Python); the register build is one
    map-side-combinable groupBy bounded at 2^p rows per task; the
    estimate pass touches <= groups x m rows. Standard error ~=
    1.04 / sqrt(m) (p=9 -> ~4.6%)."""
    values = _grouped_values(docs, group_col, text_col, granularity)
    return hll_estimate(hll_registers(values, p), p)


def hll_merge(regs_a: DataFrame, regs_b: DataFrame) -> DataFrame:
    """Union two ``(grp, j, r)`` register tables by element-wise MAX —
    the HLL merge law: the result is exactly the register table a
    single pass over the concatenated streams would have built, so
    per-unit sketches roll up across LSM units / Iceberg snapshots
    with no re-scan and no accuracy loss."""
    return (
        regs_a.unionByName(regs_b)
        .groupBy("grp", "j")
        .agg(F.max("r").alias("r"))
    )


def cumulative_cardinality(
    docs: DataFrame,
    ts_col: str,
    interval: str = "week",
    p: int = 9,
    text_col: str = "text",
    granularity: str = "shingle3",
) -> DataFrame:
    """(bucket_start, bucket_est, cum_est) — the ES
    ``cumulative_cardinality`` pipeline aggregation: per date bucket,
    the approximate distinct-value count of that bucket AND of
    everything seen up through it ("total unique users to date"),
    both from the SAME HyperLogLog register tables — the cumulative
    figure is the register-max merge of all buckets <= b (the HLL
    merge law), never a re-scan of earlier buckets' raw values. ES
    computes this agg exactly the same way (HLL++ sketch per bucket,
    merged cumulatively).

    ``cum_est`` is monotonically non-decreasing by construction
    (register merge can only raise registers). Deterministic given
    the md5 hash — the DuckDB oracle replays both estimates.

    Scale shape (100 TB): the corpus-sized pass is the one combinable
    (bucket, j) groupBy-MAX (<= buckets x 2^p rows out); the
    cumulative merge is a broadcast non-equi join over those
    planning-sized register rows (buckets^2 x m worst case, still
    planning-sized), not over values."""
    bucketed = docs.select(
        F.date_format(F.date_trunc(interval, F.col(ts_col)), "yyyy-MM-dd").alias(
            "grp"
        ),
        F.col(text_col).alias("__text"),
    )
    values = _grouped_values(bucketed, "grp", "__text", granularity)
    regs = hll_registers(values, p)
    per_bucket = hll_estimate(regs, p).select(
        F.col("grp").alias("bucket_start"), F.col("est").alias("bucket_est")
    )
    buckets = regs.select(F.col("grp").alias("b")).distinct()
    cum_regs = (
        F.broadcast(buckets)
        .join(regs, F.col("grp") <= F.col("b"))
        .groupBy("b", "j")
        .agg(F.max("r").alias("r"))
        .select(F.col("b").alias("grp"), "j", "r")
    )
    cum = hll_estimate(cum_regs, p).select(
        F.col("grp").alias("bucket_start"), F.col("est").alias("cum_est")
    )
    return (
        per_bucket.join(cum, "bucket_start")
        .orderBy("bucket_start")
        .select("bucket_start", "bucket_est", "cum_est")
    )
