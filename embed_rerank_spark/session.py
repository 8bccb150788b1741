"""SparkSession factory with the engine's tuned defaults.

Local-mode testing uses ``local[N]``; on a real cluster the same conf
is passed to spark-submit. AQE is on so skewed shuffles are re-planned
at runtime; Arrow is on because every Python-side stage in this engine
is a pandas/Arrow UDF (no per-row Python anywhere).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "embed-rerank-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or 32 (the sandbox size);
    ``shuffle_partitions`` defaults to the core count — at cluster
    scale you would size it to total-cores × 2-3, which the caller
    controls the same way.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cores

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # a posting-shard FILE is a scoring-work unit, not a byte
        # count: a high open cost stops the file bin-packer from
        # stacking several shard files onto one task (which would
        # serialize query scoring) and keeps one scan task per shard
        # file on the shuffle-free query path (postings.shard_files)
        .config("spark.sql.files.openCostInBytes", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
