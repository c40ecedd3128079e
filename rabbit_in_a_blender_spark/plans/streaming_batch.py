"""Streaming-window extension queries (SURVEY §2.M), batch-checkable.

The same window specs run under Structured Streaming via
``rabbit_in_a_blender_spark.streaming`` (readStream + watermark); here
they run in batch so the DuckDB oracle can verify the window semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_tables
from ..streaming.windows import session_agg, sliding_agg, tumbling_agg
from .catalog import register

TS_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "stream_tumbling_1h",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 3)     AS total_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def stream_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    return tumbling_agg(e, "ts", "1 hour", ["event_type"])


@register(
    "stream_sliding_1h_30m",
    oracle="""
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM (
      SELECT e.event_type,
             make_timestamp(CAST((floor(epoch(ts) / 1800) * 1800 - o.off) * 1000000 AS BIGINT)) AS ws
      FROM events e CROSS JOIN (VALUES (0), (1800)) o(off)
    )
    GROUP BY ws, event_type
    """,
)
def stream_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    return sliding_agg(e, "ts", "1 hour", "30 minutes", ["event_type"])


@register(
    "stream_session_30m",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 3)     AS total_value
    FROM sessions GROUP BY user_id, sess_id
    """,
)
def stream_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    return session_agg(e, "ts", "30 minutes", ["user_id"])
