"""Shard routing (ES _routing as storage partition pruning): routed
queries physically read ONLY their tenants' partition directories, and
per-tenant BM25 matches a Python brute force computed with per-tenant
statistics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.operators.routing import routed_topk, write_routed

ROWS = [
    (0, "scan join merge", "t0"),
    (1, "scan scan filter", "t0"),
    (2, "merge filter", "t0"),
    (3, "scan join", "t1"),
    (4, "join join join", "t1"),
    (5, "filter scan", "t2"),
]
QUERIES = [(1, "t0", "scan"), (2, "t1", "join scan"), (3, "t2", "zzz_oov")]


def _brute(rows, routed_queries, k=10, k1=1.2, b=0.75):
    out = {}
    for qid, val, q in routed_queries:
        tenant = [(d, t.split()) for d, t, v in rows if v == val]
        n = len(tenant)
        if not n:
            continue
        avgdl = sum(len(toks) for _, toks in tenant) / n
        dfreq: dict[str, int] = {}
        for _, toks in tenant:
            for t in set(toks):
                dfreq[t] = dfreq.get(t, 0) + 1
        hits = []
        for d, toks in tenant:
            score = 0.0
            for term in set(q.split()):
                tf = toks.count(term)
                if not tf:
                    continue
                idf = math.log((n - dfreq[term] + 0.5) / (dfreq[term] + 0.5) + 1)
                score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
            if score > 0:
                hits.append((d, score))
        hits.sort(key=lambda t: (-round(t[1], 6), t[0]))
        if hits:
            out[qid] = [
                (r + 1, d, round(s, 6)) for r, (d, s) in enumerate(hits[:k])
            ]
    return out


@pytest.fixture(scope="module")
def routed_path(spark, tmp_path_factory):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string, source string")
    path = str(tmp_path_factory.mktemp("routed"))
    write_routed(docs, path, routing_col="source")
    return path


def test_routed_topk_matches_per_tenant_brute(spark, routed_path):
    docs = spark.read.parquet(routed_path)
    got: dict = {}
    for r in routed_topk(spark, docs, QUERIES, k=10).collect():
        got.setdefault(r.query_id, []).append(
            (r["rank"], r.doc_id, round(r.score, 6))
        )
    for v in got.values():
        v.sort()
    assert got == _brute(ROWS, QUERIES)
    # tenant isolation: query 2 (t1) must never surface t0's doc 0
    assert all(d in (3, 4) for _, d, _ in got[2])
    with pytest.raises(ValueError):
        routed_topk(spark, docs, QUERIES, k=0)


def test_routing_prunes_partitions(spark, routed_path):
    """The routed layout + routing predicate = partition pruning: the
    scan's file set only contains the queried tenants' directories."""
    def partition_filters(df) -> str:
        qe = df._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        return "\n".join(
            line
            for line in qe.explainString(mode).splitlines()
            if "PartitionFilters" in line
        )

    docs = spark.read.parquet(routed_path)
    pf = partition_filters(docs.filter(F.col("source").isin(["t0"])))
    assert "source" in pf and "t0" in pf
    # and the full operator's scans carry the partition filter
    out = routed_topk(spark, docs, [(1, "t0", "scan")], k=5)
    pf_out = partition_filters(out)
    assert pf_out and "source" in pf_out and "t0" in pf_out
    assert "t1" not in pf_out and "t2" not in pf_out
