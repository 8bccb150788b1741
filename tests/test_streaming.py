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
