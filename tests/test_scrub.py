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


def test_url_blocklist_rule_precedence_and_subdomains(spark):
    from embed_rerank_spark.operators.scrub import url_blocklist_filter

    pages = spark.createDataFrame(
        [
            (1, "https://ads.example.com/p/9"),
            (2, "https://sub.ads.example.com/x"),
            (3, "https://adsxexample.com/p/1"),      # NOT a subdomain match
            (4, "https://ok.example.net/p/1deep"),   # path prefix
            (5, "https://ads.example.com/p/1"),      # host rule wins over path
            (6, "https://clean.example.net/other"),
        ],
        "doc_id long, url string",
    )
    out = {
        r.doc_id: (r.blocked, r.block_rule)
        for r in url_blocklist_filter(
            pages, host_suffixes=["ads.example.com"], path_prefixes=["/p/1"]
        ).collect()
    }
    assert out[1] == (True, "host:ads.example.com")
    assert out[2] == (True, "host:ads.example.com")   # subdomain
    assert out[3] == (True, "path:/p/1")              # host miss, path hit
    assert out[4] == (True, "path:/p/1")
    assert out[5] == (True, "host:ads.example.com")   # host rules first
    assert out[6] == (False, None)


def test_crawl_delta_truth_table(spark):
    from embed_rerank_spark.operators.scrub import crawl_delta

    old = spark.createDataFrame(
        [("u1", "same"), ("u2", "before"), ("u3", "gone")],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("u1", "same"), ("u2", "after"), ("u4", "fresh")],
        "url string, text string",
    )
    got = {r.url: r.change for r in crawl_delta(old, new).collect()}
    assert got == {"u2": "changed", "u3": "deleted", "u4": "added"}
