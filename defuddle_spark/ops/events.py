"""Event-stream analytics over the `events` table (event_id, ts, user_id,
event_type, value, props) — the windowed/sessionized aggregation shapes a
crawl-telemetry pipeline needs (per-window throughput, per-user sessions).

Native Spark SQL only: date_trunc tumbling windows (pushes down to a
single hash aggregate) and lag()-based sessionization (one shuffle on
user_id, no Python). Both are ANSI-expressible, so the driver's DuckDB
oracle checks them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def windowed_counts(events: DataFrame, granularity: str = "hour") -> DataFrame:
    """Tumbling-window event stats: (window_start, event_type, n_events,
    avg_value, n_users)."""
    return (events
            .groupBy(F.date_trunc(granularity, "ts").alias("window_start"),
                     "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.avg("value"), 6).alias("avg_value"),
                 F.countDistinct("user_id").alias("n_users"))
            .select("window_start", "event_type", "n_events", "avg_value",
                    "n_users"))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessions split on inactivity gaps: (user_id, n_sessions,
    n_events, longest_session_events).

    session id = running count of gap-breaks (lag over user_id/ts order) —
    the classic single-shuffle sessionization.
    """
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; go through LTZ for epoch seconds (differences
    # are timezone-invariant, so the gap comparison is exact)
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap_break = F.when(
        epoch - F.lag(epoch).over(w_user) > gap_minutes * 60, 1
    ).otherwise(0)
    with_session = events.withColumn(
        "session_id",
        F.sum(gap_break).over(
            w_user.rowsBetween(Window.unboundedPreceding, 0)))
    per_session = (with_session
                   .groupBy("user_id", "session_id")
                   .agg(F.count("*").alias("session_events")))
    return (per_session
            .groupBy("user_id")
            .agg(F.count("*").cast("int").alias("n_sessions"),
                 F.sum("session_events").alias("n_events"),
                 F.max("session_events").alias("longest_session_events"))
            .select("user_id", "n_sessions", "n_events",
                    "longest_session_events"))
