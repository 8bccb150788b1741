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
