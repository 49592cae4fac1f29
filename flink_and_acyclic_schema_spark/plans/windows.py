"""Time-window aggregation plans over the events table (batch forms).

Streaming forms (readStream + watermark) live in streaming_plans.py; these are
the batch equivalents expressed with built-in bucketing so the DuckDB oracle
can replicate them (time_bucket). The reference has no windowing at all
(SURVEY.md §2.2 — event time unused, DataFlow.java:28 commented out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec, dsum
from ..registry import register
from ..tables import load


def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window counts/sums per event_type."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(dec("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


register(
    "window_tumbling",
    window_tumbling,
    """SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS win_start, event_type,
              count(*) AS n_events, sum(value::DECIMAL(12,4))::DOUBLE AS sum_value
       FROM events GROUP BY 1, 2""",
)


def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes (each event lands in 2 windows)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "n_events")
    )


register(
    "window_sliding",
    window_sliding,
    """WITH phased AS (
         SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS b FROM events
         UNION ALL
         SELECT time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE FROM events)
       SELECT b AS win_start, count(*) AS n_events FROM phased GROUP BY b""",
)


def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 10-minute inactivity gap, computed with
    the gaps-and-islands pattern (lag + cumulative sum) so the same SQL runs on
    the oracle. The streaming form uses session_window() in streaming_plans."""
    e = load(spark, sf_dir, "events")
    e.createOrReplaceTempView("events_w")
    return spark.sql(
        """
        WITH base AS (
          SELECT user_id, ts, value, event_id,
                 timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) AS ep_us
          FROM events_w),
        marked AS (
          SELECT user_id, ts, value,
                 CASE WHEN ep_us
                           - lag(ep_us) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           > 600000000 OR lag(ep_us) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session,
                 event_id
          FROM base),
        sessions AS (
          SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
          FROM marked)
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end,
               CAST(sum(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
        FROM sessions GROUP BY user_id, session_id
        """
    )


register(
    "window_session",
    window_session,
    """WITH base AS (
         SELECT user_id, ts, value, event_id, epoch_us(ts) AS ep_us FROM events),
       marked AS (
         SELECT user_id, ts, value,
                CASE WHEN ep_us
                          - lag(ep_us) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          > 600000000 OR lag(ep_us) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                     THEN 1 ELSE 0 END AS new_session,
                event_id
         FROM base),
       sessions AS (
         SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
         FROM marked)
       SELECT user_id, session_id::BIGINT AS session_id, count(*) AS n_events,
              min(ts) AS session_start, max(ts) AS session_end,
              sum(value::DECIMAL(12,4))::DOUBLE AS sum_value
       FROM sessions GROUP BY user_id, session_id""",
)
