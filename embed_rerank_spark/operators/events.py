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
from pyspark.sql import DataFrame
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

    State per user = the OPEN session (start, last, n). A batch's
    events close any session whose gap is exceeded in-batch; idle
    sessions close via event-time timeout when the watermark passes
    ``last + gap``. Output rows are CLOSED sessions
    (user_id, session_start, n_events, session_end) in epoch seconds —
    identical tuples to the batch ``sessionize`` for every session the
    watermark has sealed.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, session_start long, n_events int, session_end long"
    )
    state_schema = "start long, last long, n int"

    def fn(key, pdfs, state: GroupState):
        user = key[0]
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user],
                    "session_start": [start // 1_000_000],
                    "n_events": [n],
                    "session_end": [last // 1_000_000],
                }
            )
            return
        ts = []
        for pdf in pdfs:
            # pandas ns timestamps -> µs epoch
            ts.extend(int(t.value) // 1000 for t in pd.to_datetime(pdf[ts_col]))
        ts.sort()  # micro-batch order is not event order
        start = last = None
        n = 0
        if state.exists:
            start, last, n = state.get
        closed = []
        gap_us = gap_seconds * 1_000_000
        for t in ts:
            if start is None:
                start = last = t
                n = 1
            elif t - last >= gap_us:
                closed.append((user, start // 1_000_000, n, last // 1_000_000))
                start = last = t
                n = 1
            else:
                last = max(last, t)
                n += 1
        state.update((start, last, n))
        # close the open session once the watermark passes last + gap
        state.setTimeoutTimestamp((last + gap_us) // 1000)  # ms
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
