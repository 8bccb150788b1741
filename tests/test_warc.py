"""WARC ingestion: record-parser round-trip, html->text semantics,
malformed-input tolerance, file-reader path."""

from __future__ import annotations

import datetime as dt

from embed_rerank_spark.sources.pages import generate_pages
from embed_rerank_spark.sources.warc import (
    pages_from_warc,
    read_warc,
    warc_records,
    write_warc,
)

TS = dt.datetime(2025, 6, 1, 12, 0, 0)


def _blob_df(spark, blobs):
    return spark.createDataFrame(
        [(f"f{i}", b) for i, b in enumerate(blobs)], "path string, content binary"
    )


def test_roundtrip_synthetic_corpus(spark):
    rows = [
        (r["url"], r["warc_ts"], bytes(r["html"]))
        for r in generate_pages(spark, 60, n_snapshots=2).collect()
    ]
    blobs = [write_warc(rows[i::3]) for i in range(3)]  # 3 archives
    got = warc_records(_blob_df(spark, blobs)).collect()
    assert len(got) == 60
    want = {u: (t, h) for u, t, h in rows}
    for r in got:
        t, h = want[r["url"]]
        assert r["warc_ts"] == t
        assert bytes(r["html"]) == h


def test_read_warc_files(spark, tmp_path):
    rows = [(f"https://e.org/{i}", TS, f"<p>doc {i}</p>".encode()) for i in range(8)]
    for i in range(2):
        (tmp_path / f"part{i}.warc").write_bytes(write_warc(rows[i::2]))
    got = read_warc(spark, str(tmp_path / "*.warc")).collect()
    assert sorted(r["url"] for r in got) == sorted(u for u, _, _ in rows)


def test_pages_from_warc_text_semantics(spark):
    html = (
        b"<html><head><style>p { color: red }</style>"
        b"<script>var x = '<p>not text</p>';</script></head>"
        b"<body><h1>Title</h1>\n<p>Hello   <b>world</b> &amp; &lt;tag&gt; "
        b"&quot;q&quot; &#39;s&#39; &amp;lt;</p></body></html>"
    )
    blob = write_warc([("https://e.org/x", TS, html)])
    out = pages_from_warc(warc_records(_blob_df(spark, [blob]))).collect()
    assert len(out) == 1
    row = out[0]
    assert row["text"] == "Title Hello world & <tag> \"q\" 's' &lt;"
    assert set(out[0].asDict()) == {"url", "warc_ts", "html", "text", "lang"}


def test_skips_non_response_and_truncated_records(spark):
    good = write_warc([("https://e.org/ok", TS, b"<p>ok</p>")])
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://e.org/req\r\n"
        b"WARC-Date: 2025-06-01T12:00:00Z\r\n"
        b"Content-Length: 4\r\n\r\nGET /\r\n\r\n"
    )
    truncated = write_warc([("https://e.org/cut", TS, b"x" * 100)])[:-60]
    blob = b"garbage-prefix" + req + good + truncated
    got = warc_records(_blob_df(spark, [blob])).collect()
    assert [r["url"] for r in got] == ["https://e.org/ok"]


def test_lang_header_passthrough(spark):
    blob = write_warc([("https://e.org/de", TS, b"<p>hallo</p>")])
    blob = blob.replace(
        b"WARC-Type: response\r\n",
        b"WARC-Type: response\r\nWARC-Identified-Content-Language: deu\r\n",
    )
    got = warc_records(_blob_df(spark, [blob])).collect()
    assert got[0]["lang"] == "deu"
