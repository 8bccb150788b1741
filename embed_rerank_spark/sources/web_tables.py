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

Real-cluster recipe (the sandbox has no Iceberg runtime; exercised
here through a reader-capture contract test instead):

    spark-submit --py-files embed_rerank_spark.zip \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.web=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.web.type=hive \
      job.py --pages web.crawl.pages --format iceberg \
             --start-snapshot-id <prev> --end-snapshot-id <curr>

Snapshot ids come from the table's ``.snapshots`` metadata table; one
(start, end] range is exactly one build segment's input.
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


def iceberg_read_options(
    start_snapshot_id: int | None = None, end_snapshot_id: int | None = None
) -> dict[str, str]:
    """Reader options selecting an Iceberg incremental snapshot range
    (one build segment's input). Option names are the public Iceberg
    Spark-read options; kept pure so the contract test can pin them
    without an Iceberg runtime."""
    opts: dict[str, str] = {}
    if start_snapshot_id is not None:
        opts["start-snapshot-id"] = str(start_snapshot_id)
    if end_snapshot_id is not None:
        opts["end-snapshot-id"] = str(end_snapshot_id)
    return opts


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
        for k, v in iceberg_read_options(start_snapshot_id, end_snapshot_id).items():
            reader = reader.option(k, v)
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
