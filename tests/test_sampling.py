"""Deterministic sampling + per-domain capping."""

from __future__ import annotations

from pyspark.sql import functions as F

from embed_rerank_spark.operators.sampling import (
    cap_per_domain,
    hash_sample,
    stratified_hash_sample,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_hash_sample_is_deterministic_and_growth_stable(spark):
    docs = _docs(spark)
    a = {r["doc_id"] for r in hash_sample(docs, 100).select("doc_id").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, 100).select("doc_id").collect()}
    assert a == b and 0 < len(a) < docs.count()
    # growth-stability: sampling a SUBSET keeps exactly the members
    # that fall in the subset (row membership never depends on corpus)
    half = docs.filter(F.col("doc_id") < 250)
    c = {r["doc_id"] for r in hash_sample(half, 100).select("doc_id").collect()}
    assert c == {d for d in a if d < 250}
    # nested rates: a 50-permille sample is a subset of the 100 one
    d = {r["doc_id"] for r in hash_sample(docs, 50).select("doc_id").collect()}
    assert d <= a


def test_stratified_rates_apply_per_stratum(spark):
    docs = _docs(spark)
    out = stratified_hash_sample(
        docs, {"src0": 1000, "src1": 0}, "source", default_permille=100
    )
    rows = out.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in rows}
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert by_src.get("src0") == n_src0  # rate 1000 = keep all
    assert "src1" not in by_src  # rate 0 = drop all


def test_cap_per_domain_prefilter_matches_plain_window(spark):
    docs = _docs(spark)
    fast = cap_per_domain(docs, 5, prefilter=True)
    slow = cap_per_domain(docs, 5, prefilter=False)
    ka = sorted(r["doc_id"] for r in fast.select("doc_id").collect())
    kb = sorted(r["doc_id"] for r in slow.select("doc_id").collect())
    assert ka == kb
    counts = fast.groupBy("source").count().collect()
    assert all(r["count"] <= 5 for r in counts)
    # cap prefers the longest docs: kept min n_chars >= dropped max
    kept = fast.select("doc_id").withColumn("kept", F.lit(True))
    j = docs.join(kept, "doc_id", "left").groupBy("source").agg(
        F.min(F.when(F.col("kept"), F.col("n_chars"))).alias("kept_min"),
        F.max(F.when(F.col("kept").isNull(), F.col("n_chars"))).alias("drop_max"),
    )
    for r in j.collect():
        if r["drop_max"] is not None:
            assert r["kept_min"] >= r["drop_max"]


def test_select_token_budget_prefix_rule(spark):
    """Distributed prefix-sum selection equals the single-machine
    greedy prefix: ordered by (n_chars desc, doc_id asc), kept iff
    tokens before it < budget."""
    from embed_rerank_spark.functions.udfs import tokenize_for_scoring
    from embed_rerank_spark.operators.sampling import select_token_budget

    docs = _docs(spark).withColumn(
        "dl", F.size(tokenize_for_scoring(F.col("text")))
    )
    budget = 7000
    out = {
        r["doc_id"]: r["cum_before"]
        for r in select_token_budget(docs, budget).collect()
    }
    rows = sorted(
        ((r["n_chars"], r["doc_id"], r["dl"]) for r in docs.collect()),
        key=lambda x: (-x[0], x[1]),
    )
    want = {}
    cum = 0
    for _nc, did, dl in rows:
        if cum < budget:
            want[did] = cum
        cum += dl
    assert out == want and out
    # budget respected up to one doc of overshoot (greedy prefix rule)
    assert max(out.values()) < budget


def test_unimax_allocation_hand_computed(spark):
    """Waterfill against a hand computation: caps are prefix-monotone,
    capped langs get full epochs, the rest split the remainder."""
    from embed_rerank_spark.operators.sampling import unimax_allocation

    # per-lang token masses: a=100, b=200, c=1000, d=5000
    rows = [("a", 100), ("b", 200), ("c", 1000), ("d", 5000)]
    docs = spark.createDataFrame(
        [(f"{lang}{i}", lang, n // 10) for lang, n in rows for i in range(10)],
        "doc_id string, lang string, dl long",
    )
    # E=2, B=3000: caps 200,400,2000,10000
    # i=1 a: 200*4=800  <= 3000           -> capped (alloc 200)
    # i=2 b: 400*3=1200 <= 2800           -> capped (alloc 400)
    # i=3 c: 2000*2=4000 > 2400           -> uncapped
    # share = (3000 - 600) div 2 = 1200 for c and d
    got = {
        r.lang: (r.n_tokens, r.cap_tokens, r.allocated_tokens, r.capped)
        for r in unimax_allocation(docs, budget_tokens=3000, max_epochs=2).collect()
    }
    assert got == {
        "a": (100, 200, 200, True),
        "b": (200, 400, 400, True),
        "c": (1000, 2000, 1200, False),
        "d": (5000, 10000, 1200, False),
    }
    # budget beyond E*total: everything capped, budget left on the table
    all_capped = unimax_allocation(docs, budget_tokens=10**9, max_epochs=2).collect()
    assert all(r.capped and r.allocated_tokens == r.cap_tokens for r in all_capped)
    # tiny budget: nothing capped, uniform split
    tiny = unimax_allocation(docs, budget_tokens=7, max_epochs=2).collect()
    assert all((not r.capped) and r.allocated_tokens == 1 for r in tiny)


def test_unimax_total_never_exceeds_budget(spark):
    from embed_rerank_spark.operators.sampling import unimax_allocation

    docs = spark.createDataFrame(
        [(str(i), f"l{i % 7}", (i * 37) % 400 + 1) for i in range(200)],
        "doc_id string, lang string, dl long",
    )
    for budget in (50, 500, 5000, 50000):
        out = unimax_allocation(docs, budget_tokens=budget, max_epochs=3).collect()
        total_cap = sum(r.cap_tokens for r in out)
        spent = sum(r.allocated_tokens for r in out)
        assert spent <= min(budget, total_cap)
        # every allocation respects its epoch cap
        assert all(r.allocated_tokens <= r.cap_tokens for r in out)
