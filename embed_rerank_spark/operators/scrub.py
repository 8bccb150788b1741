"""Corpus scrubbing: PII detection/redaction and crawl-URL
canonicalization — per-row hygiene passes a web-scale training-data
pipeline runs on every page before anything else sees the text.

Reference parity note: the reference (joonsoome/embed-rerank) serves
rerank requests and does no corpus hygiene; these operators are part of
the ingest pipeline this engine adds around the index build (SURVEY.md
§2 pipeline extensions; C4/RefinedWeb-style curation stages).

Scale shape (100 TB): every operator here is a pure per-row projection
— regexp/string expressions inside whole-stage codegen, no Python, no
shuffle of its own. The only aggregation lives in the caller (e.g.
grouping by canonical url for crawl dedup), and that is one combinable
hash agg keyed by a value with web-scale cardinality (no hot key:
a canonical url's dup group is bounded by the crawler's politeness).

The regexes are written in the common RE2/Java subset (character
classes, bounded repetition, non-capturing groups, ``\\b``) so the
DuckDB oracle can run the IDENTICAL pattern — both engines use
leftmost-match, greedy semantics for this subset, making redaction
byte-deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# leftmost, greedy, RE2-and-Java-portable patterns (see module doc)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9][0-9() \-]{6,}[0-9]"

# tracking query parameters stripped by canonicalize_url (the usual
# crawl-frontier normalization list: UTM campaign tags + click ids)
TRACKING_PARAM_RE = r"^(utm_[a-z]+|ref|fbclid|gclid|msclkid)="


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, scrubbed): count and redact
    emails -> ``<EMAIL>``, IPv4 literals -> ``<IP>``, international
    phone numbers -> ``<PHONE>``.

    Redaction order is pinned (email, ip, phone) so overlapping
    matches resolve identically everywhere: an email's host can't be
    half-eaten by the ip pass, and digit runs inside an already
    redacted token never re-match. Counts are taken BEFORE any
    replacement, each against the original text.
    """
    c = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        _count(c, EMAIL_RE).alias("n_emails"),
        _count(c, IPV4_RE).alias("n_ips"),
        _count(c, PHONE_RE).alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a crawl url, the key crawl-frontier and
    url-level dedup group on:

    1. lowercase scheme + host (path/query case preserved)
    2. drop the fragment (``#...``)
    3. drop default ports (``:80`` http, ``:443`` https)
    4. drop tracking query params (``utm_*``, ``ref``, click ids),
       sort the surviving params byte-lexicographically, drop the
       ``?`` when none survive
    5. strip one trailing slash from a non-root path

    Pure string/array expressions (split + filter + array_sort +
    rebuild), no UDF — identical results from the DuckDB oracle's
    mirror expression.
    """
    # 2: fragment first, so nothing later sees it
    u = F.regexp_replace(url, r"#.*$", "")
    # 1: lowercase scheme://host[:port] (the prefix up to the first
    # '/' after the scheme), leave the rest alone
    head = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1)
    tail = F.substring(u, F.length(head) + F.lit(1), F.length(u))
    head = F.lower(head)
    # 3: default ports
    head = F.when(
        head.startswith("https://"), F.regexp_replace(head, r":443$", "")
    ).otherwise(F.regexp_replace(head, r"(^http://.*):80$", "$1"))
    # 4: query param strip + sort
    path = F.regexp_replace(tail, r"\?.*$", "")
    query = F.when(
        tail.contains("?"), F.regexp_replace(tail, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
    )
    qs = F.array_join(F.array_sort(params), "&")
    # 5: trailing slash on a non-root path
    path = F.when(
        path.rlike(r"^/.+/$"), F.substring(path, 1, F.length(path) - F.lit(1))
    ).otherwise(path)
    return F.concat(
        head,
        path,
        F.when(qs != F.lit(""), F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def url_dedup_groups(
    pages: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, url, canon_url, n_same, is_canonical): url-level crawl
    dedup — group by canonical url, count the group, and mark the
    survivor (smallest doc_id per group; the deterministic engine
    tie-break). One combinable agg + a broadcast-size-agnostic join
    back on canon_url; at web scale both sides hash-partition on
    canon_url so the join is co-located with the agg."""
    canon = pages.select(
        F.col(id_col).alias("doc_id"),
        F.col(url_col).alias("url"),
        canonicalize_url(F.col(url_col)).alias("canon_url"),
    )
    groups = canon.groupBy("canon_url").agg(
        F.count(F.lit(1)).alias("n_same"), F.min("doc_id").alias("keep_id")
    )
    return canon.join(groups, "canon_url").select(
        "doc_id",
        "url",
        "canon_url",
        "n_same",
        (F.col("doc_id") == F.col("keep_id")).alias("is_canonical"),
    )


def url_blocklist_filter(
    pages: DataFrame,
    host_suffixes: list[str] = (),
    path_prefixes: list[str] = (),
    url_col: str = "url",
) -> DataFrame:
    """pages + (blocked: boolean, block_rule: string|null) — crawl
    blocklist filtering (the UT1/adult-blocklist step every
    Common-Crawl-derived pipeline runs before anything else): a url
    is blocked when its HOST equals or is a subdomain of any
    ``host_suffixes`` entry, or its PATH starts with any
    ``path_prefixes`` entry. First matching rule (host rules first,
    each list in given order) is reported; pipelines keep
    ``~blocked`` and audit the rest.

    Scale shape: one codegen'd projection per rule chained into a
    single pass — the rule lists are config-sized, no join at all, so
    the filter composes with partition pruning and costs one scan."""
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    path = F.parse_url(F.col(url_col), F.lit("PATH"))
    rule_expr = F.lit(None).cast("string")
    # build the when-chain in reverse so earlier rules win
    for p in reversed(list(path_prefixes)):
        rule_expr = F.when(path.startswith(p), F.lit(f"path:{p}")).otherwise(rule_expr)
    for h in reversed(list(host_suffixes)):
        rule_expr = F.when(
            (host == h) | host.endswith("." + h), F.lit(f"host:{h}")
        ).otherwise(rule_expr)
    return pages.withColumn("block_rule", rule_expr).withColumn(
        "blocked", F.col("block_rule").isNotNull()
    )


def crawl_delta(
    old_pages: DataFrame,
    new_pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(url, change, old_fp, new_fp): the snapshot diff that feeds an
    incremental reindex — ``added`` (url only in the new crawl),
    ``deleted`` (only in the old), ``changed`` (present in both with a
    different content fingerprint), unchanged urls absent. The delta
    IS the L0 segment the LSM ingest path needs: only added/changed
    docs re-extract and re-index, deleted urls become tombstones.

    Scale shape: one md5 fingerprint projection per side and ONE
    url-keyed full-outer join — snapshots co-partitioned/bucketed by
    url make it shuffle-free; nothing is collected."""
    o = old_pages.select(
        F.col(url_col).alias("url"), F.md5(F.col(text_col)).alias("old_fp")
    )
    n = new_pages.select(
        F.col(url_col).alias("url"), F.md5(F.col(text_col)).alias("new_fp")
    )
    joined = o.join(n, "url", "full_outer")
    return joined.select(
        "url",
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("deleted"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit(None))
        .alias("change"),
        "old_fp",
        "new_fp",
    ).filter(F.col("change").isNotNull())
