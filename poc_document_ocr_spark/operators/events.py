"""Event-time operators over an append-only event log.

The reference's only time semantics are wall-clock stamps on operations
(``Operation.cs:9``); a web-scale engine additionally needs event-time
bucketing and sessionization for telemetry/training-signal tables. Both are
pure built-in expressions:

* :func:`windowed_event_stats` — tumbling-window aggregation
  (``F.window``), JSON property extraction (``get_json_object``),
  distinct-user counts. Batch form of the Structured Streaming windowed
  aggregation in ``streaming/windows.py`` (same groupBy, plus watermark).
* :func:`sessionize_events` — idle-gap sessionization: the same
  gaps-and-islands window pattern as the identifier run-grouping
  (``aggregation.with_runs``), keyed on time deltas instead of identifier
  changes. One (user_id, ts) sort-shuffle, then a doc-grain groupBy.

Scale notes: windows/sessions shuffle on (key, time-bucket); AQE handles
hot users; no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["windowed_event_stats", "sessionize_events"]


def windowed_event_stats(
    events: DataFrame, window: str = "1 hour"
) -> DataFrame:
    """Tumbling-window per-type stats: counts, distinct users, value
    min/max, and the sum of the integer ``k`` property parsed out of the
    JSON ``props`` column (map-side JSON path, no UDF)."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.withColumn("k", k)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.sum("k").alias("sum_k"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "n_users",
            "min_value",
            "max_value",
            "sum_k",
        )
    )


def sessionize_events(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Idle-gap sessions per user: a new session starts when the gap to the
    previous event exceeds ``gap_minutes``. Returns one row per session
    with start/end, event count, and min/max value.

    Deterministic under ties: ordering is (ts, event_id).
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap (no sub-second truncation ambiguity); the cast
    # handles TIMESTAMP_NTZ parquet columns (identity under the UTC session)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    boundary = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    cume = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    with_sess = events.withColumn(
        "session_id", F.sum(boundary).over(cume).cast("int")
    )
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_end"
            ),
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
