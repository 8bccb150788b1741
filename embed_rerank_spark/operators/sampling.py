"""Deterministic corpus sampling + per-domain capping — the two
selection operators every large-scale training-data pipeline runs
between dedup and training (cf. the C4/Gopher/RefinedWeb pipelines:
hash-bucket subsampling for mixture weights, per-domain caps so no
single host dominates the corpus).

Both are pure JVM-side DataFrame plans (whole-stage codegen, no
Python) and deterministic: re-running on the same input yields the
same sample — the property that makes pipeline re-runs reproducible
and lets a DuckDB oracle verify row-identical output.

Portability note: the sample bucket is md5-derived (like
``operators/dedup.py``'s hash family) so the oracle computes IDENTICAL
buckets — xxhash64/crc32 would be Spark-only.

Scale notes (100 TB):
- ``hash_sample`` is a stateless filter on a scan — embarrassingly
  parallel, no shuffle at all.
- ``cap_per_domain`` is one shuffle by domain + a window; a pathological
  domain holding a large corpus fraction makes that window's partition
  hot — AQE skew-join splitting does not apply to windows, so the
  standard mitigation is a pre-filter: domains with <= n docs (the
  overwhelming majority by count) can skip the window entirely via a
  broadcast of over-cap domains. ``cap_per_domain`` applies that
  pre-filter when ``prefilter=True`` (default): the expensive ranked
  path runs only over docs of over-cap domains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SAMPLE_BUCKETS = 1000


def sample_bucket(key_col, buckets: int = SAMPLE_BUCKETS):
    """Deterministic bucket in [0, buckets) from md5 of the key's
    string form (portable across engines: DuckDB computes the same
    md5 hex, so ``CAST(concat('0x', substr(md5(k), 1, 15)) AS BIGINT)
    % buckets`` matches bit-for-bit)."""
    col = F.col(key_col) if isinstance(key_col, str) else key_col
    h = (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
        .cast("decimal(20,0)")
        .cast("long")
    )
    return F.pmod(h, F.lit(buckets))


def hash_sample(
    df: DataFrame,
    rate_permille: int,
    key_col: str = "doc_id",
    buckets: int = SAMPLE_BUCKETS,
) -> DataFrame:
    """Keep rows whose deterministic hash bucket < rate_permille —
    a reproducible ~rate_permille/buckets sample. A pure filter: no
    shuffle, fully pushdown-friendly, and STABLE under corpus growth
    (a row's membership never changes when other rows appear — the
    property random `.sample()` lacks)."""
    return df.filter(sample_bucket(key_col, buckets) < rate_permille)


def stratified_hash_sample(
    df: DataFrame,
    rates_permille: dict[str, int],
    stratum_col: str,
    default_permille: int = 0,
    key_col: str = "doc_id",
    buckets: int = SAMPLE_BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling (training-mixture weights):
    each stratum keeps its own rate; unlisted strata keep
    ``default_permille``. Still a stateless filter — the rate lookup
    is a literal CASE chain (tiny mixture tables are engine constants,
    not data)."""
    rate = F.lit(default_permille)
    expr = None
    for stratum, permille in sorted(rates_permille.items()):
        cond = F.col(stratum_col) == stratum
        expr = F.when(cond, permille) if expr is None else expr.when(cond, permille)
    rate = expr.otherwise(default_permille) if expr is not None else rate
    return df.filter(sample_bucket(key_col, buckets) < rate)


def cap_per_domain(
    docs: DataFrame,
    n: int,
    domain_col: str = "source",
    order_cols: tuple[str, ...] = ("n_chars",),
    id_col: str = "doc_id",
    prefilter: bool = True,
) -> DataFrame:
    """Keep at most ``n`` docs per domain, preferring the largest
    ``order_cols`` (desc) with ``id_col`` asc as the deterministic
    tiebreak — the anti-monoculture cap of web-corpus pipelines.

    ``prefilter=True`` splits the plan: domains already within the cap
    bypass the window (no per-row ranking cost); only docs of over-cap
    domains shuffle into the ranked path. The over-cap domain list is
    a tiny aggregate broadcast back onto the scan."""
    order = [F.desc(c) for c in order_cols] + [F.asc(id_col)]
    w = Window.partitionBy(domain_col).orderBy(*order)
    ranked = docs.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= n
    )
    if not prefilter:
        return ranked
    counts = docs.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_docs"))
    over = counts.filter(F.col("n_docs") > n).select(domain_col)
    under_docs = docs.join(F.broadcast(over), domain_col, "left_anti").withColumn(
        "rk", F.lit(None).cast("int")
    )
    over_docs = docs.join(F.broadcast(over), domain_col, "left_semi")
    over_ranked = over_docs.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= n
    )
    return under_docs.unionByName(over_ranked.select(*under_docs.columns))


def select_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    token_col: str = "dl",
    order_cols: tuple[str, ...] = ("n_chars",),
    id_col: str = "doc_id",
) -> DataFrame:
    """Dataset sizing: keep the best docs (``order_cols`` desc,
    ``id_col`` asc tiebreak) whose CUMULATIVE token count stays within
    ``budget_tokens`` — a doc is kept iff the tokens BEFORE it (in
    preference order) leave room for at least one of its tokens
    (greedy prefix rule: kept iff cum_before < budget).

    Scale shape — the global ordered cumsum is the classic
    single-partition-window trap; this is the two-phase distributed
    prefix sum instead: range-partition by the preference key and PIN
    the partitioning with ``persist`` (range boundaries are re-sampled
    per job, so the offsets pass and the final pass MUST see identical
    partitions), aggregate per-partition totals (tiny, driver-side
    prefix), then an in-partition cumsum plus the broadcast offset.
    Every partition works independently; nothing global except the
    per-partition totals row set."""
    key_cols = [F.desc(c) for c in order_cols] + [F.asc(id_col)]
    # persist PINS the range partitioning: boundaries are re-sampled
    # per job, so without it the offsets pass and the final pass could
    # disagree on which partition a row lands in (rows would silently
    # get the wrong prefix offset)
    parts = docs.repartitionByRange(*key_cols).withColumn(
        "_pid", F.spark_partition_id()
    ).persist()
    try:
        totals = parts.groupBy("_pid").agg(F.sum(token_col).alias("ptot")).collect()
        offsets = {}
        run = 0
        for r in sorted(totals, key=lambda r: r["_pid"]):
            offsets[r["_pid"]] = run
            run += r["ptot"]
        off_expr = F.create_map(
            [F.lit(x) for kv in sorted(offsets.items()) for x in kv]
        )[F.col("_pid")]
        w = Window.partitionBy("_pid").orderBy(*key_cols).rowsBetween(
            Window.unboundedPreceding, -1
        )
        out = (
            parts.withColumn(
                "cum_before",
                F.coalesce(F.sum(token_col).over(w), F.lit(0)) + off_expr,
            )
            .filter(F.col("cum_before") < budget_tokens)
            .drop("_pid")
        )
        # eagerly materialize the (budget-bounded) result and cut its
        # lineage: the pinned partitioning can then be released, and
        # the output no longer depends on cache blocks surviving
        return out.localCheckpoint(eager=True)
    finally:
        parts.unpersist()


def temperature_mix(
    docs: DataFrame,
    alpha: float,
    budget_docs: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    buckets: int = SAMPLE_BUCKETS,
) -> DataFrame:
    """Temperature-based mixture sampling (the multilingual/domain
    rebalancing rule of XLM-R / LLaMA-style pipelines): domain d with
    n_d docs gets a target of

        t_d = min(n_d, floor(budget_docs * w_d / sum(w)))
        w_d = round(n_d ** alpha * 1e6)   (integer micro-weights)

    alpha < 1 UPWEIGHTS small domains relative to their share (alpha=0
    -> uniform across domains, alpha=1 -> proportional, i.e. plain
    subsampling). Weights are integerized at 1e-6 so the target
    arithmetic is exact bigint math — bit-identical across engines —
    with only the pow() in IEEE doubles. Within a domain, the t_d
    kept docs are chosen by the deterministic md5 bucket (hash-shuffle
    order), id asc tiebreak — membership is reproducible and stable
    under reordering.

    Scale shape: everything is distributed — per-domain counts are one
    combinable agg, the weight total is a single broadcast row, and
    targets broadcast-join back onto the scan. Domains already within
    their target bypass the ranking window (the ``cap_per_domain``
    prefilter split), so the per-domain window only shuffles docs of
    domains that actually need trimming."""
    counts = docs.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_docs"))
    weighted = counts.withColumn(
        "w",
        F.round(F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha))) * 1e6)
        .cast("long"),
    )
    total = weighted.agg(F.sum("w").alias("w_total"))
    targets = (
        weighted.crossJoin(F.broadcast(total))
        .withColumn(
            "target",
            F.least(
                F.col("n_docs"),
                # explicit floor: both engines do IEEE double division
                # of exact bigints here, and floor (not round/truncate
                # ambiguity) is the pinned semantics
                F.floor(
                    (F.lit(int(budget_docs)) * F.col("w")) / F.col("w_total")
                ),
            ).cast("long"),
        )
        .select(domain_col, "n_docs", "target")
    )
    order = [F.asc("_mixb"), F.asc(id_col)]
    keyed = docs.withColumn("_mixb", sample_bucket(id_col, buckets))
    under = (
        keyed.join(
            F.broadcast(targets.filter(F.col("target") >= F.col("n_docs"))),
            domain_col,
            "left_semi",
        )
    )
    over_targets = targets.filter(F.col("target") < F.col("n_docs")).select(
        domain_col, "target"
    )
    w = Window.partitionBy(domain_col).orderBy(*order)
    over = (
        keyed.join(F.broadcast(over_targets), domain_col)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("target"))
        .drop("_rk", "target")
    )
    return under.unionByName(over).drop("_mixb")


def unimax_allocation(
    docs: DataFrame,
    budget_tokens: int,
    max_epochs: int = 1,
    lang_col: str = "lang",
    dl_col: str = "dl",
) -> DataFrame:
    """(lang, n_tokens, cap_tokens, allocated_tokens, capped): UniMax
    language-budget allocation (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining") — the waterfilling alternative to ``temperature_mix``:
    visit languages smallest-first; a language whose full
    ``max_epochs``-epoch corpus fits under an equal split of the
    remaining budget is capped at ``cap = max_epochs * n_tokens``;
    from the first language that exceeds its equal split onward, every
    remaining (larger) language receives the same uniform share.

    Closed form (mirrored exactly by the SQL oracle): rank languages
    by n_tokens asc (lang asc ties); with P_{i-1} the running sum of
    caps before rank i and L the language count, language i is capped
    iff ``cap_i * (L - i + 1) <= B - P_{i-1}``. Cappedness is a prefix
    property (for the first uncapped i0 and any j > i0:
    B - P_{j-1} <= B - P_{i0-1} - (j-i0)*cap_i0 < cap_i0*(L-j+1)
    <= cap_j*(L-j+1)), so k = #capped and the uncapped share is
    ``(B - P_k) div (L - k)`` — which the same argument shows is
    strictly below every uncapped language's cap. All arithmetic is
    exact bigint (``div``, no float division), bit-identical across
    engines.

    Scale shape: one combinable agg over the corpus; the waterfill
    itself runs on the LANGUAGE table — planning-sized by definition
    (the single-partition windows below see one row per language,
    which is why the unpartitioned Window is acceptable here)."""
    counts = docs.groupBy(F.col(lang_col).alias("lang")).agg(
        F.sum(dl_col).cast("long").alias("n_tokens")
    )
    b = int(budget_tokens)
    w_rank = Window.orderBy(F.asc("n_tokens"), F.asc("lang"))
    ranked = (
        counts.withColumn(
            "cap_tokens", (F.lit(int(max_epochs)) * F.col("n_tokens")).cast("long")
        )
        .withColumn("i", F.row_number().over(w_rank))
        .withColumn(
            "p_before",
            F.coalesce(
                F.sum("cap_tokens").over(
                    w_rank.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .withColumn("n_langs", F.count(F.lit(1)).over(Window.partitionBy()))
    )
    flagged = ranked.withColumn(
        "capped",
        F.col("cap_tokens") * (F.col("n_langs") - F.col("i") + 1)
        <= F.lit(b) - F.col("p_before"),
    )
    k_row = flagged.agg(
        F.coalesce(F.max(F.when(F.col("capped"), F.col("i"))), F.lit(0)).alias("k"),
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("cap_tokens"))), F.lit(0)
        ).alias("p_k"),
        F.max("n_langs").alias("n_langs2"),
    )
    return (
        flagged.crossJoin(F.broadcast(k_row))
        .withColumn(
            "allocated_tokens",
            F.when(F.col("capped"), F.col("cap_tokens")).otherwise(
                F.expr("div(" + str(b) + " - p_k, n_langs2 - k)")
            ).cast("long"),
        )
        .select("lang", "n_tokens", "cap_tokens", "allocated_tokens", "capped")
    )
