"""Source adapters for the Common-Crawl-style ``pages`` web table.

The engine's input contract (BASELINE.json input_hint) is an Iceberg
table ``(url string, warc_ts timestamp, html binary, text string,
lang string)``. This sandbox has no Iceberg runtime, so the adapter
exposes ONE entrypoint that reads either format — the rest of the
engine only sees a DataFrame with the pages schema:

- ``format="parquet"``: plain parquet directory (the sandbox path)
- ``format="iceberg"``: ``spark.read.format("iceberg")`` with optional
  snapshot-range options — the exact incremental-read surface the
  snapshot-segment build consumes (`start-snapshot-id` /
  `end-snapshot-id` delimit one segment's rows, replacing the
  ``warc_ts``-day filter used for parquet)

Partition-pruning note (SURVEY.md §4): an Iceberg pages table should
be partitioned by ``days(warc_ts)``; the segment build's per-snapshot
filter then prunes manifests/files before any scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

PAGES_COLUMNS = [f.name for f in PAGES_SCHEMA.fields]


def read_pages(
    spark: SparkSession,
    source: str,
    format: str = "parquet",
    start_snapshot_id: int | None = None,
    end_snapshot_id: int | None = None,
) -> DataFrame:
    """Load the pages table with the engine schema enforced.

    ``source`` is a path (parquet) or a catalog table name (iceberg).
    Snapshot ids select an Iceberg incremental range — one build
    segment's input.
    """
    if format == "parquet":
        df = spark.read.parquet(source)
    elif format == "iceberg":
        reader = spark.read.format("iceberg")
        if start_snapshot_id is not None:
            reader = reader.option("start-snapshot-id", str(start_snapshot_id))
        if end_snapshot_id is not None:
            reader = reader.option("end-snapshot-id", str(end_snapshot_id))
        df = reader.load(source)
    else:
        raise ValueError(f"unknown pages format: {format}")

    missing = [c for c in PAGES_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"pages table missing columns: {missing}")
    # enforce engine types (never inferSchema — SURVEY.md §1.2)
    return df.select(
        F.col("url").cast("string"),
        F.col("warc_ts").cast("timestamp"),
        F.col("html").cast("binary"),
        F.col("text").cast("string"),
        F.col("lang").cast("string"),
    )
