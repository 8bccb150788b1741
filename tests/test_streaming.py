"""Structured Streaming parity: the windowed event operators run
unchanged over ``readStream`` sources (same code path as batch)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.operators.events import tumbling_counts

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_schema(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").schema


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """File-stream sources need a DIRECTORY of files."""
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "events.parquet")
    return str(d)


def test_tumbling_counts_streaming_matches_batch(spark, events_schema, events_dir):
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    expected = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in tumbling_counts(batch).collect()
    }

    stream = spark.readStream.schema(events_schema).parquet(events_dir)
    # same operator, streaming source; complete mode aggregates all data
    q = (
        tumbling_counts(stream.where(F.col("event_id").isNotNull()))
        .writeStream.format("memory")
        .queryName("tumbling_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in spark.sql("select * from tumbling_stream").collect()
    }
    assert got == expected


def test_streaming_with_watermark_append(spark, events_schema, events_dir):
    """Watermarked append-mode aggregation: windows finalize once the
    watermark passes — the late-data handling path."""
    stream = spark.readStream.schema(events_schema).parquet(events_dir)
    # watermarks need TIMESTAMP (LTZ); the parquet column is NTZ
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append emits only windows older than the final watermark; all but
    # the last window(s) of the feed qualify
    n = spark.sql("select count(*) c from wm_stream").first().c
    batch_windows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .count()
        .count()
    )
    assert 0 < n <= batch_windows


def test_stateful_sessionizer_matches_batch_closed_sessions(spark, events_schema, tmp_path):
    """applyInPandasWithState sessionizer: every emitted (closed)
    session must be exactly a batch-sessionize session."""
    import shutil

    from embed_rerank_spark.operators.events import sessionize, sessionize_stateful

    # two time-ordered files -> two micro-batches, so the second
    # batch's watermark closes idle sessions from the first
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    half = ev.agg(F.expr("percentile_approx(ts, 0.5)")).first()[0]
    d = tmp_path / "stream_in"
    for name, part in (
        ("a_first", ev.filter(F.col("ts") <= half)),
        ("b_second", ev.filter(F.col("ts") > half)),
    ):
        staging = str(tmp_path / f"stage_{name}")
        part.coalesce(1).write.parquet(staging)
        src = next(p for p in __import__("pathlib").Path(staging).glob("*.parquet"))
        d.mkdir(exist_ok=True)
        shutil.copy(src, d / f"{name}.parquet")

    stream = (
        spark.readStream.schema(events_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
    )
    q = (
        sessionize_stateful(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_stateful")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.session_start, r.n_events, r.session_end)
        for r in spark.sql("select * from sess_stateful").collect()
    }
    assert len(got) > 0

    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {
        (r.user_id, r.session_start, r.n_events, r.session_end)
        for r in sessionize(batch).collect()
    }
    assert got <= want, sorted(got - want)[:5]
    # the stream must have closed a substantial share of all sessions
    assert len(got) >= len(want) // 4


def test_stateful_sessionizer_out_of_order_within_watermark(spark, tmp_path):
    """An in-watermark event OLDER than the open session's start must
    re-derive session_start (the raw-event buffer re-sessionizes), so
    emitted sessions match batch sessionize even when micro-batches
    arrive out of event-time order."""
    import datetime as dt
    import shutil

    from embed_rerank_spark.operators.events import sessionize, sessionize_stateful

    t = lambda h, m: dt.datetime(2025, 6, 1, h, m)  # noqa: E731
    batches = [
        [(1, t(12, 0)), (1, t(12, 5))],   # wm after: 11:55
        [(1, t(11, 58)), (1, t(14, 0))],  # 11:58 admissible, < open start
        [(1, t(15, 30))],                 # advances wm to seal session 1
    ]
    schema = "user_id long, ts timestamp"
    d = tmp_path / "ooo_stream"
    d.mkdir()
    for i, rows in enumerate(batches):
        staging = str(tmp_path / f"ooo_stage_{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(staging)
        src = next(p for p in __import__("pathlib").Path(staging).glob("*.parquet"))
        shutil.copy(src, d / f"{i:02d}.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .withWatermark("ts", "10 minutes")
    )
    q = (
        sessionize_stateful(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_ooo")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.n_events, r.session_end)
        for r in spark.sql("select * from sess_ooo").collect()
    }
    all_events = spark.createDataFrame(sum(batches, []), schema)
    want = {
        (r.user_id, r.session_start, r.n_events, r.session_end)
        for r in sessionize(all_events).collect()
    }
    # the first session (11:58 start — re-derived from the late event,
    # 3 events) must be emitted and exactly match batch semantics
    first = (1, int(t(11, 58).timestamp()), 3, int(t(12, 5).timestamp()))
    assert first in got, sorted(got)
    assert got <= want, sorted(got - want)


def test_streaming_exact_dedup_matches_batch(spark, tmp_path):
    """Dedup-at-the-door: the content-digest stream dedup keeps exactly
    one row per distinct text (within the watermark horizon), matching
    the batch distinct-digest set."""
    from embed_rerank_spark.operators.dedup import streaming_exact_dedup

    rows = []
    for i in range(40):
        text = f"page body {i % 15}"  # 15 distinct contents, heavy dup storm
        rows.append((f"http://u{i}", f"2024-01-01 10:{i:02d}:00", text))
    src = spark.createDataFrame(rows, "url string, ts_str string, text string") \
        .withColumn("warc_ts", F.col("ts_str").cast("timestamp")).drop("ts_str")
    d = tmp_path / "pages_stream"
    src.coalesce(1).write.mode("overwrite").parquet(str(d))

    stream = spark.readStream.schema(
        spark.read.parquet(str(d)).schema
    ).parquet(str(d))
    q = (
        streaming_exact_dedup(stream, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from dedup_stream").collect()
    # one survivor per distinct content; helper column dropped
    assert len(got) == 15
    assert len({r.text for r in got}) == 15
    assert set(got[0].asDict()) == {"url", "text", "warc_ts"}

    # url-keyed variant: all 40 urls are distinct -> nothing dropped
    q2 = (
        streaming_exact_dedup(stream, watermark="10 minutes", key="url")
        .writeStream.format("memory")
        .queryName("dedup_stream_url")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.sql("select count(*) n from dedup_stream_url").first().n == 40

    import pytest as _pytest

    with _pytest.raises(ValueError):
        streaming_exact_dedup(stream, key="nope")
