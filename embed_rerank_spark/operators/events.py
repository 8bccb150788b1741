"""Time-windowed operators over event streams (batch + streaming).

The reference has no streaming surface (SURVEY.md §2.5: "Streaming:
none"), but a table-scale ingestion pipeline needs windowed rollups of
its telemetry/event feeds. These use Spark's native window operators —
``F.window`` (tumbling) and ``F.session_window`` (gap-based) — which
run identically over batch DataFrames and Structured Streaming inputs:
the same function works on ``spark.readStream`` sources with a
watermark added by the caller.

Scale notes: both are single-shuffle hash aggregations on
(window, key); partial aggregation is map-side combinable, and event
-time partitioning in the source table (e.g. Iceberg partitioned by
day(ts)) lets Catalyst prune scans to the queried range.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window_duration: str = "5 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per (tumbling window, key) event counts + value sum.

    Returns (window_start: epoch seconds, <key>, n_events, sum_value)
    — window boundaries as epoch seconds so downstream comparisons are
    timezone-free.
    """
    return (
        events.groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"), F.col(key_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(value_col).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            key_col,
            "n_events",
            F.round("sum_value", 6).alias("sum_value"),
        )
    )


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Custom stateful sessionizer via ``applyInPandasWithState`` —
    the operator form needed when session semantics outgrow
    ``F.session_window`` (per-key dynamic gaps, session caps, custom
    emission). Streaming-only: requires a watermark on ``ts_col``.

    State per user = the int64-µs timestamps of every event not yet
    inside an EMITTED session, kept raw (one binary blob) so that
    in-watermark out-of-order arrivals re-split sessions exactly: an
    event older than the open session's start re-derives session_start
    (and can split one buffered session into two) because the
    sessionization always reruns over the full buffer. A session is
    emitted only once it is SEALED — ``end + gap <= watermark`` — at
    which point no admissible event (Spark drops rows below the
    watermark before this operator) can extend, join, or re-split it.
    Idle users close via event-time timeout at ``max(buffer) + gap``.

    Output rows are CLOSED sessions (user_id, session_start, n_events,
    session_end) in epoch seconds — identical tuples to the batch
    ``sessionize`` regardless of micro-batch arrival order, for every
    session the watermark has sealed.

    State size: events of unsealed sessions only — bounded by the
    watermark delay plus the open session's history. A pathological
    never-idle key grows its buffer like any exact sessionizer's state;
    cap with a max-session-length policy upstream if that matters.
    """
    import numpy as np
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, session_start long, n_events int, session_end long"
    )
    state_schema = "buf binary"
    gap_us = gap_seconds * 1_000_000

    def _sessions(ts: np.ndarray) -> list[tuple[int, int, int]]:
        """Sorted µs timestamps -> [(start, end, n)] gap-split sessions."""
        breaks = np.flatnonzero(np.diff(ts) >= gap_us) + 1
        bounds = np.concatenate(([0], breaks, [len(ts)]))
        return [
            (int(ts[s]), int(ts[e - 1]), int(e - s))
            for s, e in zip(bounds[:-1], bounds[1:])
        ]

    def fn(key, pdfs, state: GroupState):
        user = key[0]
        if state.hasTimedOut:
            # watermark >= max(buffer) + gap: every buffered session is
            # sealed — emit them all and drop the state
            (blob,) = state.get
            ts = np.sort(np.frombuffer(blob, dtype=np.int64))
            state.remove()
            closed = [
                (user, s // 1_000_000, n, e // 1_000_000)
                for s, e, n in _sessions(ts)
            ]
            if closed:
                yield pd.DataFrame(
                    closed,
                    columns=["user_id", "session_start", "n_events", "session_end"],
                )
            return
        new_ts = []
        for pdf in pdfs:
            # pandas ns timestamps -> µs epoch
            new_ts.extend(int(t.value) // 1000 for t in pd.to_datetime(pdf[ts_col]))
        buf = np.array(new_ts, dtype=np.int64)
        if state.exists:
            (blob,) = state.get
            buf = np.concatenate([np.frombuffer(blob, dtype=np.int64), buf])
        buf = np.sort(buf)
        wm_us = state.getCurrentWatermarkMs() * 1000
        closed = []
        kept_from = 0
        sessions = _sessions(buf)
        pos = 0
        for s, e, n in sessions:
            if e + gap_us <= wm_us:
                closed.append((user, s // 1_000_000, n, e // 1_000_000))
                kept_from = pos + n
            pos += n
        buf = buf[kept_from:]
        if len(buf):
            state.update((buf.tobytes(),))
            state.setTimeoutTimestamp((int(buf[-1]) + gap_us) // 1000)  # ms
        else:
            state.remove()
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "n_events", "session_end"],
            )

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessions per user via ``F.session_window``: a new
    session starts when the inter-event gap exceeds ``gap``.

    Returns (user_id, session_start: epoch seconds, n_events,
    last_ts: epoch seconds). ``session_window.end`` is last event + gap
    by definition, so we expose ``max(ts)`` instead — it's the
    engine-independent session boundary.
    """
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            user_col,
            F.unix_timestamp("first_ts").alias("session_start"),
            "n_events",
            F.unix_timestamp("last_ts").alias("session_end"),
        )
    )


def trending_keys(
    events: DataFrame,
    window_duration: str = "1 day",
    ts_col: str = "ts",
    key_col: str = "event_type",
    min_lift: float = 1.1,
) -> DataFrame:
    """(window_start, <key>, n_events, expected, lift, z_score) — keys
    over-represented in a time window relative to their OWN all-time
    rate: the significant-terms-on-a-date-slice pattern (ES
    "trending topics" recipe: date_histogram + significant keys with
    the rest of time as background). Per (window, key):

        expected = total_key_events / n_windows      (uniform rate)
        lift     = n / expected
        z_score  = (n - mean_per_window) / std_per_window

    where mean/std are the key's per-window population moments over
    ALL windows in the data (empty windows count as zero — computed
    from sum/sumsq over the distinct-window count, not only observed
    rows). Rows with lift >= ``min_lift`` survive, ordered lift desc.

    Runs identically over a batch frame or a watermarked stream (the
    per-window agg is Spark's native window operator; the background
    join becomes a stream-static or stream-stream join).

    Scale shape: one (window, key) hash agg over the events scan —
    map-side combinable — then two TINY aggregates (per-key moments,
    global window count) broadcast back; no second corpus pass."""
    win = (
        events.groupBy(F.window(F.col(ts_col), window_duration).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp(F.col("w.start")).alias("window_start"), key_col, "n")
    )
    n_windows = win.select("window_start").distinct().agg(
        F.count(F.lit(1)).alias("n_windows")
    )
    moments = (
        win.groupBy(key_col)
        .agg(
            F.sum("n").alias("s1"),
            F.sum(F.col("n") * F.col("n")).alias("s2"),
        )
        .crossJoin(F.broadcast(n_windows))
        .withColumn("mean_w", F.col("s1") / F.col("n_windows"))
        .withColumn(
            "std_w",
            F.sqrt(
                F.greatest(
                    F.col("s2") / F.col("n_windows") - F.col("mean_w") * F.col("mean_w"),
                    F.lit(0.0),
                )
            ),
        )
    )
    out = (
        win.join(F.broadcast(moments.select(key_col, "s1", "n_windows", "mean_w", "std_w")), key_col)
        .withColumn("expected", F.col("s1") / F.col("n_windows"))
        .withColumn("lift", F.col("n") / F.col("expected"))
        .withColumn(
            "z_score",
            F.when(F.col("std_w") > 0, (F.col("n") - F.col("mean_w")) / F.col("std_w")).otherwise(
                F.lit(0.0)
            ),
        )
        .filter(F.col("lift") >= float(min_lift))
    )
    return out.select(
        "window_start",
        key_col,
        F.col("n").alias("n_events"),
        F.round("expected", 6).alias("expected"),
        F.round("lift", 6).alias("lift"),
        F.round("z_score", 6).alias("z_score"),
    )


def change_points(
    events: DataFrame,
    window_duration: str = "1 day",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(<key>, n_buckets, cp_ts, cusum_max, mean_before, mean_after,
    delta) — step-change detection per key over its bucketed metric
    series: the ES ``change_point`` aggregation shape, implemented as
    the classic CUSUM argmax estimator (Page 1954; Taylor's
    change-point analysis): with x_i the per-bucket mean of
    ``value_col`` and x̄ the series mean,

        S_i = Σ_{j<=i} (x_j - x̄)         (cumulative sum of residuals)
        cp  = argmax_i |S_i|             (earliest bucket on ties)

    ``mean_before`` averages buckets <= cp, ``mean_after`` the rest;
    ``delta`` = after - before is the detected step. Series with < 2
    buckets report no change point (cp_ts null, delta 0). All floats
    rounded 6dp so the arithmetic is engine-portable.

    Scale shape: ONE map-side-combinable (key, bucket) hash agg over
    the events scan; everything after runs on the bucketed series —
    bounded by the time range, thousands of rows per key at most — so
    the per-key windows (running sum, argmax) never see raw events.
    The same shape runs incrementally: per-bucket (sum, count)
    partials are mergeable across streaming micro-batches or LSM
    units, and CUSUM re-derives from the merged series."""
    bucketed = (
        events.groupBy(
            F.col(key_col).alias("key"),
            F.window(F.col(ts_col), window_duration).alias("w"),
        )
        .agg(F.round(F.avg(value_col), 6).alias("x"))
        .select("key", F.unix_timestamp(F.col("w.start")).alias("bucket_ts"), "x")
    )
    stats = bucketed.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_buckets"), F.avg("x").alias("xbar")
    )
    wseq = Window.partitionBy("key").orderBy("bucket_ts")
    cusum = (
        bucketed.join(F.broadcast(stats), "key")
        .withColumn(
            "s", F.round(F.sum(F.col("x") - F.col("xbar")).over(wseq), 6)
        )
        .withColumn("abss", F.abs(F.col("s")))
    )
    wpick = Window.partitionBy("key").orderBy(F.desc("abss"), F.asc("bucket_ts"))
    cp = (
        cusum.withColumn("rk", F.row_number().over(wpick))
        .filter(F.col("rk") == 1)
        .select("key", F.col("bucket_ts").alias("cp_ts"), F.col("abss").alias("cusum_max"))
    )
    sides = (
        bucketed.join(F.broadcast(cp), "key")
        .groupBy("key")
        .agg(
            F.round(
                F.avg(F.when(F.col("bucket_ts") <= F.col("cp_ts"), F.col("x"))), 6
            ).alias("mean_before"),
            F.round(
                F.avg(F.when(F.col("bucket_ts") > F.col("cp_ts"), F.col("x"))), 6
            ).alias("mean_after"),
        )
    )
    return (
        stats.join(cp, "key", "left")
        .join(sides, "key", "left")
        .select(
            F.col("key").alias(key_col),
            "n_buckets",
            F.when(F.col("n_buckets") >= 2, F.col("cp_ts")).alias("cp_ts"),
            F.when(F.col("n_buckets") >= 2, F.col("cusum_max"))
            .otherwise(F.lit(0.0))
            .alias("cusum_max"),
            F.col("mean_before"),
            F.when(F.col("n_buckets") >= 2, F.col("mean_after")).alias("mean_after"),
            F.when(
                F.col("n_buckets") >= 2,
                F.round(F.col("mean_after") - F.col("mean_before"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("delta"),
        )
        .orderBy(key_col)
    )
