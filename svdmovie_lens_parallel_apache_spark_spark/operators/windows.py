"""Event-time window operators over the ``events`` table (batch form).

Not present in the reference (Spark 1.6 predates Structured Streaming;
SURVEY.md §2.1 "Streaming: none"). These are the batch twins of the
streaming jobs in ``streaming/jobs.py`` — same logical ops, so the
DuckDB oracle can validate them, and the streaming path reuses the
expressions with a watermark bolted on.

Scale notes: running totals / sessionization partition by ``user_id`` —
the window sort is within user only, so skew is bounded by the hottest
user; tumbling aggregation is a plain hash agg on (bucket, type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import portable_round as _r


def tumbling_agg(events: DataFrame, bucket: str = "hour") -> DataFrame:
    """Per (hour, event_type): count + sum(value). date_trunc keeps the
    bucket SQL-portable; the streaming twin uses F.window()."""
    return (
        events.groupBy(
            F.date_trunc(bucket, F.col("ts")).alias("bucket_ts"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r(F.sum("value"), 4).alias("sum_value"),
        )
    )


def running_totals(events: DataFrame) -> DataFrame:
    """Per-user running sum of ``value`` in event-time order (row_number +
    cumulative sum). Deterministic: ties broken by event_id."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("rn"),
        _r(F.sum("value").over(w), 4).alias("running_value"),
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap from the
    previous event of the same user exceeds ``gap_minutes``.

    Classic lag + cumulative-sum-of-boundaries; the streaming twin is
    ``F.session_window`` / ``applyInPandasWithState``.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60
    with_flag = events.withColumn(
        "new_session",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w) > gap_s,
            F.lit(1),
        )
        .otherwise(F.lit(0)),
    ).withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull(), F.lit(1)).otherwise(F.col("new_session")),
    )
    with_sess = with_flag.withColumn("session_id", F.sum("new_session").over(w))
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.col("ts").cast("long")).alias("session_start_s"),
            F.max(F.col("ts").cast("long")).alias("session_end_s"),
        )
    )
