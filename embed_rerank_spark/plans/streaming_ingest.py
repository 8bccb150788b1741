"""Structured Streaming ingestion into the LSM index.

The batch build already has the log-structured shape (independent
per-snapshot segments with manifest-last commit markers, tiered
compaction folding them upward), so continuous ingestion is the same
machinery driven by a stream: each micro-batch commits ONE level-0
segment via ``foreachBatch`` — the standard Structured Streaming
pattern for sinks with their own transactional layout — then tiered
compaction runs in-line whenever a level fills. Queries see every
sealed segment through ``load_tiered`` immediately; no rebuild, no
read downtime (readers hold their own unit list).

Exactly-once: ``foreachBatch`` may REPLAY a batch after failure, so
the sink must be idempotent per ``batch_id``. It is, twice over:
segment ids derive from ``batch_id``, a committed segment
(manifest present) is skipped outright, and a partially-written one
is rebuilt by deterministic overwrite — byte-identical, because
extraction and encoding are deterministic per url (the build's
resume invariant, reused verbatim).

At production scale the compaction step would run as a separate
maintenance job (it is already restart-safe and ignores the streaming
query entirely); running it inside ``foreachBatch`` keeps the sandbox
story single-process without changing semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.codec import BLOCK_SIZE
from .build_index import build_segment, committed_snapshots
from .tiered import DEFAULT_FANOUT, compact


def stream_batch_ingestor(
    path: str,
    n_shards: int = 8,
    block_size: int = BLOCK_SIZE,
    n_salts: int = 1,
    positional: bool = False,
    fanout: int = DEFAULT_FANOUT,
    compact_each_batch: bool = True,
):
    """Returns the ``foreachBatch`` function committing each
    micro-batch of pages as one level-0 segment (plus in-line tiered
    compaction). Exposed separately so tests and batch backfills can
    drive the exact sink the stream runs."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        snap = f"stream-{batch_id:08d}"
        if snap in committed_snapshots(path):
            return  # replayed batch: already committed, skip
        if batch_df.limit(1).count() == 0:
            return  # empty trigger: no segment
        build_segment(
            batch_df.sparkSession,
            batch_df,
            path,
            snap,
            n_shards=n_shards,
            block_size=block_size,
            n_salts=n_salts,
            positional=positional,
        )
        if compact_each_batch:
            compact(batch_df.sparkSession, path, fanout=fanout, block_size=block_size)

    return ingest


def start_streaming_ingest(
    pages_stream: DataFrame,
    path: str,
    checkpoint: str,
    n_shards: int = 8,
    block_size: int = BLOCK_SIZE,
    n_salts: int = 1,
    positional: bool = False,
    fanout: int = DEFAULT_FANOUT,
    trigger_available_now: bool = True,
):
    """pages stream -> LSM index at ``path``. Returns the started
    ``StreamingQuery``; callers ``awaitTermination()`` (availableNow
    drains the backlog then stops — the backfill shape) or leave it
    running for continuous ingestion."""
    writer = pages_stream.writeStream.foreachBatch(
        stream_batch_ingestor(
            path,
            n_shards=n_shards,
            block_size=block_size,
            n_salts=n_salts,
            positional=positional,
            fanout=fanout,
        )
    ).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
