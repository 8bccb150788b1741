"""url -> dense doc-id dictionary (index-size optimization, optional).

Default doc ids are ``xxhash64(url)`` — deterministic and
partition-independent, but uniform in int64 space, so posting-list
doc-id DELTAS average ~2^64/df and varbyte-encode at ~9 bytes for rare
terms (BENCH/BASELINE.md index-storage section). A dense 0..N-1 id
space makes the average delta ~N/df, cutting doc-id bytes roughly 4x
on the long tail.

The assignment job is the classic scalable dense-rank (no global
window, no driver materialization):

1. range-partition + sort urls (Spark's distributed sort — the only
   total order in the job), materialized once so both later passes see
   the same bucket assignment;
2. count rows per bucket (one tiny collect of n_partitions longs);
3. dense_id = bucket offset + row_number within the bucket (a
   per-bucket window, never a global one).

Determinism: dense_id = rank of url in the sorted url set — stable
across runs/partitionings for a FIXED corpus. Unlike hash ids it is
NOT stable under corpus growth (a new url shifts later ranks), which
is why hash ids stay the engine default; a production deployment
appends new urls at the tail of the dictionary instead of re-ranking
(recorded trade-off).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_url_dictionary(
    docs: DataFrame,
    url_col: str = "url",
    num_partitions: int | None = None,
    staging_path: str | None = None,
) -> DataFrame:
    """(url, dense_id): dense_id = rank of url in sorted url order,
    0-based, collision-free by construction.

    The sorted layout MUST be materialized once before the two passes
    (offset count, id assignment): ``repartitionByRange`` samples its
    boundaries per job, so re-executing the lineage between passes can
    shift rows across partitions and silently duplicate ids. With
    ``staging_path`` the sorted urls round-trip through parquet (the
    production shape — a 10^12-row url list stages to the lake);
    without it they persist to executor memory/disk (sandbox scale)."""
    spark = docs.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    urls = (
        docs.select(F.col(url_col).alias("url"))
        .distinct()
        .repartitionByRange(n_parts, "url")
        .sortWithinPartitions("url")
        .withColumn("pid", F.spark_partition_id())
    )
    if staging_path is not None:
        urls.write.mode("overwrite").parquet(staging_path)
        urls = spark.read.parquet(staging_path)
    else:
        from pyspark import StorageLevel  # noqa: PLC0415

        urls = urls.persist(StorageLevel.MEMORY_AND_DISK)
    # offsets: one tiny collect of n_partitions counts; assignment is a
    # per-BUCKET window (partitionBy pid, orderBy url) — no global
    # window, and correct no matter how the staged files re-split into
    # read tasks, because pid is a stored column, not a task id.
    from pyspark.sql import Window  # noqa: PLC0415

    counts = {
        r.pid: r.n
        for r in urls.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = spark.createDataFrame(offsets, "pid int, off long")
    w = Window.partitionBy("pid").orderBy("url")
    return (
        urls.join(F.broadcast(off_df), "pid")
        .withColumn("dense_id", F.col("off") + F.row_number().over(w) - 1)
        .select("url", "dense_id")
    )


def with_dense_ids(
    docs: DataFrame, dictionary: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Replace/attach ``doc_id`` with the dictionary's dense id (one
    shuffle join on url; at build time this rides the extraction
    shuffle)."""
    out = docs.join(dictionary.withColumnRenamed("url", url_col), url_col)
    if "doc_id" in out.columns:
        out = out.drop("doc_id")
    return out.withColumnRenamed("dense_id", "doc_id")


def index_bytes_per_posting(manifest: DataFrame) -> dict:
    """{postings, bytes, bytes_per_posting} from a lineage manifest."""
    row = manifest.agg(
        F.sum("postings_emitted").alias("p"), F.sum("bytes_compressed").alias("b")
    ).collect()[0]
    return {
        "postings": int(row.p),
        "bytes": int(row.b),
        "bytes_per_posting": float(row.b) / max(int(row.p), 1),
    }


def extend_url_dictionary(
    dictionary: DataFrame,
    docs: DataFrame,
    url_col: str = "url",
    num_partitions: int | None = None,
    staging_path: str | None = None,
) -> DataFrame:
    """Append-only dictionary growth — the production path for a live
    crawl (module docstring trade-off): EXISTING assignments are
    untouched (so already-built posting segments stay valid and
    mergeable), and urls not yet in the dictionary get the next dense
    ids, ranked among themselves, starting at max(dense_id)+1.

    Cost model at 10^12 urls: one anti-join (new urls are the small
    side of the corpus after the first crawl), one distributed sort of
    ONLY the new urls, one scalar max. New-id density preserves the
    small-delta property within each appended range; the sorted-order
    locality degrades only across crawl generations, which is exactly
    the LSM segment boundary anyway."""
    base_row = dictionary.agg(F.max("dense_id").alias("m")).collect()[0]
    base = (base_row.m if base_row.m is not None else -1) + 1
    new_urls = (
        docs.select(F.col(url_col).alias("url"))
        .distinct()
        .join(dictionary.select("url"), "url", "left_anti")
    )
    appended = build_url_dictionary(
        new_urls, num_partitions=num_partitions, staging_path=staging_path
    ).withColumn("dense_id", F.col("dense_id") + F.lit(base))
    return dictionary.unionByName(appended)
