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
