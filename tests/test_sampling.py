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
