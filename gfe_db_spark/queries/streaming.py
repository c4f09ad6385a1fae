"""Streaming-shaped query inventory over `events`: sessionization and
tumbling-window aggregation — the batch forms of the operators
`streaming/` runs with readStream (ST-family + beyond-reference)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gfe_db_spark.queries import QuerySpec
from gfe_db_spark.sources.tables import table

SESSION_GAP_MS = 30 * 60 * 1000


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + cumulative gap-count (the batch equivalent
    of session_window in Structured Streaming): per (user, session) event
    counts and session length."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts"))
    gap = ms - F.unix_millis(F.lag("ts").over(w))
    with_flag = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_MS), F.lit(1)).otherwise(F.lit(0)),
    )
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sessions = with_flag.withColumn(
        "session_id", F.sum("new_session").over(wcum).cast("long")
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.unix_millis(F.col("ts"))) - F.min(F.unix_millis(F.col("ts")))).alias(
                "session_ms"
            ),
        )
        .orderBy("user_id", "session_id")
    )


SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > {SESSION_GAP_MS}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         CAST(SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MAX(epoch_ms(ts)) - MIN(epoch_ms(ts)) AS session_ms
FROM sessions GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour window aggregation (batch form of the streaming
    windowed agg; epoch-aligned buckets match DuckDB's time_bucket)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.window("ts", "6 hours").start, "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(30,8)")).cast("double").alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


TUMBLING_SQL = """
SELECT strftime(time_bucket(INTERVAL '6 hours', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "sessionize": QuerySpec(sessionize, SESSIONIZE_SQL, "gap sessionization"),
    "tumbling_window": QuerySpec(tumbling_window, TUMBLING_SQL, "6h tumbling agg"),
}
