"""WARC ingestion: raw Common-Crawl-style archives -> the ``pages`` table.

The engine's input contract is the Iceberg/parquet ``pages`` table
(`sources/web_tables.py`); this module is the pipeline head that
PRODUCES that table from WARC archives (ISO 28500, the public format
Common Crawl publishes). It parses ``WARC-Type: response`` records out
of archive blobs entirely executor-side:

- ``read_warc(spark, path)`` — ``spark.read.format("binaryFile")``
  over ``*.warc`` files, one row per archive, then one vectorized
  Arrow pass splits records and emits (url, warc_ts, html).
- ``warc_records(df)`` — the same parser over any DataFrame carrying
  archive bytes (e.g. already-landed blobs in a table).
- ``pages_from_warc(...)`` — adds deterministic ``text`` (tag-strip +
  whitespace-collapse html-to-text, pinned in tests) and ``lang``
  (from an ``WARC-Identified-Content-Language`` header when present,
  else empty) to complete the pages schema.

Scale notes (how this maps to a real 100 TB crawl):

- One task per archive file: Common Crawl ships ~1 GB .warc.gz files,
  tens of thousands per crawl — natural, even parallelism with zero
  shuffle (the parse is a map). ``binaryFile`` loads a whole archive
  per row, which is exactly how per-record-gzip-member WARCs must be
  handled anyway; memory stays bounded at one archive per task.
- The parser is a single linear scan per blob (find header block,
  read Content-Length, slice payload) — no regex over the payload,
  no per-record Python function calls beyond slicing.
- Output feeds straight into the extract/index build; partition by
  ``days(warc_ts)`` on write to enable snapshot/segment pruning.

Header parsing follows the WARC/1.0 record grammar: header lines are
CRLF-terminated ``Name: value`` pairs, the header block ends at the
first empty line, the payload is exactly ``Content-Length`` bytes,
records are separated by CRLF CRLF. For ``response`` records the
payload is an HTTP response; the html body starts after the HTTP
header block's blank line.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_RECORDS_SCHEMA = "url string, warc_ts timestamp, html binary, lang string"

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"


def _parse_blob(blob: bytes) -> list[tuple[str, dt.datetime, bytes, str]]:
    """Linear scan over one archive: yields (url, ts, html, lang) per
    WARC-Type: response record. Malformed trailing bytes are dropped
    (truncated fetches are normal in crawl archives)."""
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        start = blob.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = blob.find(_HDR_END, start)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in blob[start:hdr_end].split(_CRLF)[1:]:
            sep = line.find(b":")
            if sep > 0:
                headers[line[:sep].strip().decode("latin-1").lower()] = (
                    line[sep + 1 :].strip().decode("latin-1")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + len(_HDR_END)
            continue
        payload_start = hdr_end + len(_HDR_END)
        payload_end = payload_start + clen
        if payload_end > n:
            break  # truncated final record
        pos = payload_end
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts_raw = headers.get("warc-date", "")
        try:
            ts = dt.datetime.strptime(ts_raw, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            continue
        payload = blob[payload_start:payload_end]
        # payload = HTTP response; body after the HTTP header block
        http_end = payload.find(_HDR_END)
        html = payload[http_end + len(_HDR_END) :] if http_end >= 0 else payload
        lang = headers.get("warc-identified-content-language", "")
        out.append((url, ts, html, lang))
    return out


def warc_records(df: DataFrame, blob_col: str = "content") -> DataFrame:
    """(url, warc_ts, html, lang) — one row per response record, from a
    DataFrame of archive blobs. Pure map (no shuffle); one Arrow batch
    in, one out."""

    def parse(batches: Iterator[pa.RecordBatch]):
        for batch in batches:
            urls, tss, htmls, langs = [], [], [], []
            for blob in batch.column(0).to_pylist():
                for url, ts, html, lang in _parse_blob(blob or b""):
                    urls.append(url)
                    tss.append(ts)
                    htmls.append(html)
                    langs.append(lang)
            yield pa.RecordBatch.from_pydict(
                {"url": urls, "warc_ts": tss, "html": htmls, "lang": langs},
                schema=pa.schema(
                    [
                        ("url", pa.string()),
                        ("warc_ts", pa.timestamp("us")),
                        ("html", pa.binary()),
                        ("lang", pa.string()),
                    ]
                ),
            )

    return df.select(F.col(blob_col)).mapInArrow(parse, WARC_RECORDS_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Archive files -> response records, one task per file."""
    return warc_records(spark.read.format("binaryFile").load(path))


# html-to-text, pinned semantics: drop script/style subtrees, strip
# tags, decode the five standard entities, collapse whitespace runs to
# single spaces, trim. All JVM-side regex — no Python in the scan.
_TEXT_EXPR = (
    "trim(regexp_replace(regexp_replace(regexp_replace("
    "decode(html, 'UTF-8'), "
    "'(?is)<(script|style)[^>]*>.*?</\\\\1>', ' '), "
    "'(?s)<[^>]*>', ' '), "
    "'\\\\s+', ' '))"
)


def pages_from_warc(records: DataFrame) -> DataFrame:
    """Complete the pages schema: deterministic html->text plus the
    pass-through columns. The entity decode covers &amp; &lt; &gt;
    &quot; &#39; (the set html escaping produces)."""
    text = F.expr(_TEXT_EXPR)
    for ent, ch in [
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),  # last so &amp;lt; decodes to &lt; not <
    ]:
        text = F.replace(text, F.lit(ent), F.lit(ch))
    return records.select(
        "url", "warc_ts", "html", text.alias("text"), "lang"
    )


def write_warc(rows: list[tuple[str, dt.datetime, bytes]]) -> bytes:
    """Serialize (url, ts, html) rows as a WARC/1.0 archive of response
    records — the test/bench fixture generator (the inverse of
    ``_parse_blob``), kept here so the format knowledge lives in one
    module."""
    chunks = []
    for url, ts, html in rows:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode("latin-1")
            + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n".encode("latin-1")
            + f"Content-Length: {len(http)}\r\n".encode("latin-1")
            + b"\r\n"
        )
        chunks.append(hdr + http + b"\r\n\r\n")
    return b"".join(chunks)
