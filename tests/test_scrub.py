"""PII scrubbing + url canonicalization (operators/scrub.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from embed_rerank_spark.operators.scrub import (
    canonicalize_url,
    pii_scrub,
    url_dedup_groups,
)


def test_pii_scrub_counts_and_redaction(spark):
    rows = [
        (1, "mail me at Bob.smith+x@Example.org or call +1 (555) 010-9999 now"),
        (2, "server at 10.0.255.7 and 192.168.1.1, email a@b.co"),
        (3, "no pii here"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (1, 0, 1)
    assert got[1]["scrubbed"] == "mail me at <EMAIL> or call <PHONE> now"
    assert (got[2]["n_emails"], got[2]["n_ips"], got[2]["n_phones"]) == (1, 2, 0)
    assert got[2]["scrubbed"] == "server at <IP> and <IP>, email <EMAIL>"
    assert got[3]["scrubbed"] == "no pii here"
    assert got[4]["scrubbed"] == ""


def test_pii_scrub_is_pure_projection(spark):
    """No shuffle: the scrub is a per-row map over the scan."""
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_canonicalize_url_rules(spark):
    cases = [
        # case + default port + trailing slash + tracking + fragment
        ("HTTPS://WWW.Example.COM:443/Path/Sub/?utm_source=feed&b=2&a=1#frag",
         "https://www.example.com/Path/Sub?a=1&b=2"),
        # already canonical
        ("https://www.example.com/Path/Sub?a=1&b=2",
         "https://www.example.com/Path/Sub?a=1&b=2"),
        # http default port; root slash preserved
        ("http://Example.com:80/", "http://example.com/"),
        # all params tracking -> no '?'
        ("http://example.com/?utm_campaign=x", "http://example.com/"),
        # param sort, ref stripped
        ("https://example.com/p?ref=tw&z=9&a=2", "https://example.com/p?a=2&z=9"),
        # non-default port kept; path case kept
        ("https://Example.com:8443/A/b", "https://example.com:8443/A/b"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i long, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonicalize_url(F.col("url")).alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_url_dedup_groups_survivor(spark):
    rows = [
        (5, "https://a.com/x?utm_source=1"),
        (9, "https://A.com/x"),
        (7, "https://a.com/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: r for r in url_dedup_groups(df).collect()}
    assert got[5]["n_same"] == 2 and got[5]["is_canonical"]
    assert got[9]["n_same"] == 2 and not got[9]["is_canonical"]
    assert got[7]["n_same"] == 1 and got[7]["is_canonical"]
