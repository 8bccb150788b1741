"""Misra-Gries heavy hitters (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from embed_rerank_spark.functions.udfs import tokenize_for_scoring
from embed_rerank_spark.operators.sketches import heavy_hitters


def _docs(spark):
    # zipf-ish synthetic stream: term t_i appears ~60//(i+1) times/doc
    rows = []
    for d in range(20):
        toks = []
        for i in range(30):
            toks += [f"t{i}"] * (60 // (i + 1))
        rows.append((d, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _exact(spark, docs, n):
    return (
        docs.select(F.explode(tokenize_for_scoring(F.col("text"))).alias("term"))
        .groupBy("term")
        .count()
        .orderBy(F.desc("count"), F.asc("term"))
        .limit(n)
        .collect()
    )


def test_exact_when_capacity_covers_vocab(spark):
    docs = _docs(spark)
    got = heavy_hitters(docs, capacity=1000, top_n=10).collect()
    want = _exact(spark, docs, 10)
    assert [(r["rank"], r["term"], r["count_lb"]) for r in got] == [
        (i + 1, r["term"], r["count"]) for i, r in enumerate(want)
    ]
    assert all(r["err_ub"] == 0 for r in got)


def test_lossy_sketch_is_lower_bound_within_guarantee(spark):
    docs = _docs(spark)
    exact = {r["term"]: r["count"] for r in _exact(spark, docs, 1000)}
    got = heavy_hitters(docs, capacity=8, top_n=10).collect()
    assert got, "heaviest terms must survive a tiny sketch"
    err = got[0]["err_ub"]
    assert err > 0  # capacity 8 << 30 distinct forces decrements
    for r in got:
        true = exact[r["term"]]
        assert r["count_lb"] <= true  # never overcounts
        assert true - r["count_lb"] <= err  # MG undercount guarantee
    # the single heaviest term is guaranteed present and top-ranked
    heaviest = max(exact, key=lambda t: (exact[t], t))
    assert got[0]["term"] == heaviest


# ---- KMV distinct-count sketch ----

from embed_rerank_spark.operators.sketches import (  # noqa: E402
    kmv_cardinality,
    kmv_estimate,
    kmv_merge,
    kmv_minhashes,
)


def _kmv_docs(spark):
    # two groups: 'big' has 500 distinct terms (saturates k=64),
    # 'small' has 10 (stays exact)
    rows = []
    for d in range(50):
        toks = [f"w{(d * 10 + j) % 500}" for j in range(40)]
        rows.append((d, " ".join(toks), "big"))
    for d in range(50, 60):
        toks = [f"s{j % 10}" for j in range(40)]
        rows.append((d, " ".join(toks), "small"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_kmv_unsaturated_is_exact(spark):
    docs = _kmv_docs(spark)
    got = {
        r["grp"]: r
        for r in kmv_cardinality(docs, k=64, granularity="term").collect()
    }
    assert got["small"]["n_held"] == 10
    assert got["small"]["est"] == 10.0


def test_kmv_saturated_estimate_within_bound(spark):
    docs = _kmv_docs(spark)
    got = {
        r["grp"]: r
        for r in kmv_cardinality(docs, k=64, granularity="term").collect()
    }
    assert got["big"]["n_held"] == 64
    # KMV relative error ~ 1/sqrt(k-2) ≈ 12.7%; allow 4 sigma
    assert abs(got["big"]["est"] - 500) / 500 < 0.51


def test_kmv_merge_equals_single_pass(spark):
    docs = _kmv_docs(spark)
    a = kmv_minhashes(docs.filter("doc_id % 2 = 0"), k=64, granularity="term")
    b = kmv_minhashes(docs.filter("doc_id % 2 = 1"), k=64, granularity="term")
    merged = kmv_estimate(kmv_merge(a, b, 64), 64).collect()
    whole = kmv_estimate(kmv_minhashes(docs, k=64, granularity="term"), 64).collect()
    assert sorted(map(tuple, merged)) == sorted(map(tuple, whole))


def test_kmv_partial_bounds_rows_per_partition(spark):
    # the mapInPandas partial never emits more than k rows per group
    # per partition: repartition to 4, count partial output directly
    from embed_rerank_spark.operators.sketches import (
        _grouped_values,
        _kmv_partial,
        _md5_hash60,
    )
    from pyspark.sql import functions as F  # noqa: PLC0415

    docs = _kmv_docs(spark).repartition(4)
    hashed = _grouped_values(docs, "lang", "text", "term").select(
        "grp", _md5_hash60(F.col("value")).alias("h")
    )
    partials = hashed.mapInPandas(
        lambda it: _kmv_partial(it, 16), schema="grp string, h long"
    )
    counts = (
        partials.withColumn("pid", F.spark_partition_id())
        .groupBy("pid", "grp")
        .count()
        .collect()
    )
    assert counts and all(r["count"] <= 16 for r in counts)


def test_kmv_set_ops_matches_python_reference(spark):
    import hashlib

    from embed_rerank_spark.operators.sketches import kmv_set_ops

    # three groups with engineered overlap: a∩b shares w0..w59 of 100,
    # c is disjoint from both
    def doc(words):
        return " ".join(words)

    rows = []
    rows += [(i, doc([f"w{j}" for j in range(i * 10, i * 10 + 10)]), "a") for i in range(10)]
    rows += [(100 + i, doc([f"w{j}" for j in range(i * 10, i * 10 + 10)]), "b") for i in range(6)]
    rows += [(200 + i, doc([f"v{j}" for j in range(i * 10, i * 10 + 10)]), "b") for i in range(4)]
    rows += [(300 + i, doc([f"u{j}" for j in range(i * 10, i * 10 + 10)]), "c") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, src string")

    k = 16

    def h60(v: str) -> int:
        return int(hashlib.md5(v.encode()).hexdigest()[:15], 16)

    def sketch(values: set[str]) -> list[int]:
        return sorted({h60(v) for v in values})[:k]

    def est(hs: list[int]) -> float:
        if len(hs) < k:
            return float(len(hs))
        return round((k - 1) / (hs[-1] / float(16**15)), 6)

    vocab = {
        "a": {f"w{j}" for j in range(100)},
        "b": {f"w{j}" for j in range(60)} | {f"v{j}" for j in range(40)},
        "c": {f"u{j}" for j in range(50)},
    }
    want = {}
    for ga, gb in [("a", "b"), ("a", "c"), ("b", "c")]:
        sa, sb = set(sketch(vocab[ga])), set(sketch(vocab[gb]))
        union = sorted(sa | sb)[:k]
        nboth = sum(1 for h in union if h in sa and h in sb)
        ue = est(union)
        want[(ga, gb)] = (
            len(union),
            ue,
            round(nboth / len(union), 6),
            round(nboth / len(union) * ue, 6),
        )

    got = {
        (r["grp_a"], r["grp_b"]): (
            r["n_union_held"],
            r["union_est"],
            r["jaccard"],
            r["intersect_est"],
        )
        for r in kmv_set_ops(
            docs, k=k, group_col="src", granularity="term"
        ).collect()
    }
    assert got == want
    # sanity: the engineered overlap shows up, the disjoint pair doesn't
    assert got[("a", "c")][2] == 0.0
    assert got[("a", "b")][2] > 0.2


# ---- Bloom filter ----


def _py_bloom_positions(value: str, m_bits: int, k: int) -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"{i}:{value}".encode()).hexdigest()[:15], 16) % m_bits
        for i in range(k)
    ]


def test_bloom_positions_match_python_reference(spark):
    from embed_rerank_spark.operators.sketches import _bloom_bit_positions

    vals = ["alpha", "beta", "the quick brown fox", "äöü unicode"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        r["v"]: list(r["p"])
        for r in df.select(
            "v", _bloom_bit_positions(F.col("v"), 30720, 4).alias("p")
        ).collect()
    }
    for v in vals:
        assert got[v] == _py_bloom_positions(v, 30720, 4)


def test_bloom_no_false_negatives_and_fp_rate(spark):
    """Every inserted value tests positive (the Bloom guarantee); a
    disjoint probe set sees only the designed false-positive rate
    (deterministic md5 hashing makes the count reproducible)."""
    from embed_rerank_spark.operators.sketches import bloom_build, bloom_contains

    m, k, n = 30720, 4, 500
    ins = spark.createDataFrame([(f"val-{i}",) for i in range(n)], "v string")
    filt = bloom_build(ins, "v", m_bits=m, k=k)
    present = bloom_contains(
        filt, ins.selectExpr("v", "v AS probe"), "v", "probe", m_bits=m, k=k
    ).collect()
    assert len(present) == n and all(r["contained"] for r in present)

    absent = spark.createDataFrame(
        [(f"absent-{i}",) for i in range(2000)], "v string"
    )
    fp = bloom_contains(
        filt, absent.selectExpr("v", "v AS probe"), "v", "probe", m_bits=m, k=k
    ).filter("contained").count()
    # theoretical fp ~= (1 - e^(-k*n/m))^4 ~= 1.6e-5 at this geometry;
    # 2000 deterministic probes should see at most a handful
    assert fp <= 3


def test_bloom_merge_is_union(spark):
    """bit_or merge of per-shard filters == the filter built over the
    concatenated stream, bit for bit (the mergeability law)."""
    from embed_rerank_spark.operators.sketches import bloom_build, bloom_merge

    a = spark.createDataFrame([(f"a-{i}",) for i in range(100)], "v string")
    b = spark.createDataFrame([(f"b-{i}",) for i in range(100)], "v string")
    merged = {
        r["word_idx"]: r["word"]
        for r in bloom_merge(
            bloom_build(a, "v", 6000, 3), bloom_build(b, "v", 6000, 3)
        ).collect()
    }
    whole = {
        r["word_idx"]: r["word"]
        for r in bloom_build(a.unionByName(b), "v", 6000, 3).collect()
    }
    assert merged == whole


def test_bloom_rejects_bad_geometry(spark):
    import pytest

    from embed_rerank_spark.operators.sketches import bloom_build

    df = spark.createDataFrame([("x",)], "v string")
    with pytest.raises(ValueError):
        bloom_build(df, "v", m_bits=10, k=4)
    with pytest.raises(ValueError):
        bloom_build(df, "v", m_bits=6000, k=0)


# ---- HyperLogLog cardinality sketch ----


def _hll_py(values, p):
    """Pure-python HLL reference on md5-60bit hashes."""
    import hashlib
    import math

    m = 1 << p
    q = 60 - p
    regs = [0] * m
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        j = h >> q
        w = h & ((1 << q) - 1)
        r = q + 1 if w == 0 else q - (w.bit_length()) + 1
        regs[j] = max(regs[j], r)
    nonzero = sum(1 for r in regs if r > 0)
    s = sum(2.0 ** -r for r in regs)
    if m <= 16:
        alpha = 0.673
    elif m <= 32:
        alpha = 0.697
    elif m <= 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / s
    v0 = m - nonzero
    if raw <= 2.5 * m and v0 > 0:
        est = m * math.log(m / v0)
    else:
        est = raw
    return nonzero, est


def test_hll_matches_python_reference(spark):
    from embed_rerank_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    vals = [(v % 3, f"v{v}") for v in range(5000)]
    df = spark.createDataFrame(vals, "grp string, value string")
    p = 7
    got = {
        r["grp"]: (r["nonzero"], r["est"])
        for r in hll_estimate(hll_registers(df, p), p).collect()
    }
    for g in (0, 1, 2):
        nz, est = _hll_py([v for gg, v in vals if gg == g], p)
        assert got[str(g)][0] == nz
        assert abs(got[str(g)][1] - round(est, 6)) < 1e-6


def test_hll_accuracy_within_3_sigma(spark):
    from embed_rerank_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    import math

    n = 20000
    p = 9
    df = spark.createDataFrame(
        [("g", f"item-{v}") for v in range(n)], "grp string, value string"
    )
    est = hll_estimate(hll_registers(df, p), p).collect()[0]["est"]
    sigma = 1.04 / math.sqrt(1 << p)
    assert abs(est - n) / n < 3 * sigma


def test_hll_merge_equals_single_pass(spark):
    from embed_rerank_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    p = 6
    a = spark.createDataFrame(
        [("g", f"a{v}") for v in range(800)], "grp string, value string"
    )
    b = spark.createDataFrame(
        [("g", f"a{v}") for v in range(400, 1200)], "grp string, value string"
    )
    merged = hll_estimate(hll_merge(hll_registers(a, p), hll_registers(b, p)), p)
    single = hll_estimate(hll_registers(a.unionByName(b), p), p)
    assert merged.collect() == single.collect()


def test_hll_linear_counting_small_range(spark):
    from embed_rerank_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    # 10 values in m=4096 registers: raw estimate is far below 2.5m,
    # so the small-range path must fire and be near-exact
    p = 12
    df = spark.createDataFrame(
        [("g", f"x{v}") for v in range(10)], "grp string, value string"
    )
    row = hll_estimate(hll_registers(df, p), p).collect()[0]
    assert row["nonzero"] <= 10
    assert abs(row["est"] - 10) < 1.0


def test_hll_rejects_bad_p(spark):
    from embed_rerank_spark.operators.sketches import hll_registers

    import pytest as _pytest

    df = spark.createDataFrame([("g", "v")], "grp string, value string")
    with _pytest.raises(ValueError):
        hll_registers(df, 3)
    with _pytest.raises(ValueError):
        hll_registers(df, 17)


def test_cumulative_cardinality_monotone_and_final_matches_global(spark):
    from embed_rerank_spark.operators.sketches import (
        cumulative_cardinality,
        hll_cardinality,
    )

    import datetime as dt

    rows = []
    for i in range(300):
        ts = dt.datetime(2024, 1, 1) + dt.timedelta(days=(i * 7) % 60)
        rows.append((i, f"alpha{i % 40} beta{i % 70} gamma{i} delta{i} eps{i}", ts))
    docs = spark.createDataFrame(rows, "doc_id long, text string, warc_ts timestamp")
    out = cumulative_cardinality(docs, "warc_ts", interval="week", p=7).collect()
    assert len(out) >= 3
    cums = [r["cum_est"] for r in out]
    assert cums == sorted(cums)  # register merge only ever raises
    for r in out:
        assert r["bucket_est"] <= r["cum_est"] + 1e-9
    # the last cumulative estimate IS the whole-corpus estimate (same
    # registers): compare against hll_cardinality on a single group
    whole = hll_cardinality(
        docs.withColumn("g", F.lit("g")), p=7, group_col="g"
    ).collect()[0]["est"]
    assert abs(cums[-1] - whole) < 1e-6
