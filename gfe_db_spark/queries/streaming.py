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


def stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful streaming operator (applyInPandasWithState,
    §2.8+) executed for real: file-source stream over the events parquet →
    per-user running totals → memory sink, driven to completion
    (processAllAvailable). Rows-only by design — arbitrary-state streaming
    semantics are exactly the non-SQL-expressible case."""
    import uuid

    from gfe_db_spark.streaming.structured import read_event_stream, stateful_user_totals

    name = f"ut_{uuid.uuid4().hex[:8]}"
    events = read_event_stream(spark, f"{sf_dir}/events.parquet")
    q = (
        stateful_user_totals(events)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(
        f"SELECT user_id, n_events, total_value FROM {name} ORDER BY user_id"
    )


def stream_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3 executed for real: stream the events parquet through the
    bucketed foreachBatch MERGE sink twice (second pass replays the same
    input) and return per-bucket target counts — idempotence shows as
    first-pass counts. Rows-only: the sink's effect is filesystem state."""
    import tempfile

    from pyspark.sql import functions as F

    from gfe_db_spark.streaming.structured import foreach_batch_upsert, read_event_stream

    target = tempfile.mkdtemp(prefix="gfe_sink_") + "/events_upserted"
    for _ in range(2):  # replay → MERGE idempotence
        events = read_event_stream(spark, f"{sf_dir}/events.parquet")
        q = foreach_batch_upsert(
            events.select("event_id", "user_id", "value"), target, ["event_id"], n_buckets=8
        ).start()
        q.processAllAvailable()
        q.stop()
    return (
        spark.read.parquet(target)
        .groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("__bucket")
    )


def imgt_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 via the registered Python DataSource (`spark.read.format("imgt")`)
    with record-aligned byte splits, on the deterministic mini-release —
    the second, catalog-integrated scan path next to read_imgt_dat."""
    import tempfile

    from pyspark.sql import functions as F

    from gfe_db_spark.sources.imgt_datasource import register
    from gfe_db_spark.testing_fixtures import write_release_dat

    tmp = tempfile.mkdtemp(prefix="gfe_ds_")
    dat = write_release_dat(tmp, "3550")
    register(spark)
    df = spark.read.format("imgt").load(dat)
    return df.select("allele_id", "hla_name", "locus", F.col("length").cast("long").alias("length")).orderBy(
        "allele_id"
    )


IMGT_DS_SQL = """
SELECT * FROM (VALUES
  ('HLA00001', 'HLA-A*01:01:01:01', 'HLA-A', CAST(20 AS BIGINT)),
  ('HLA00002', 'HLA-A*01:02',       'HLA-A', CAST(20 AS BIGINT)),
  ('HLA00003', 'HLA-B*07:02',       'HLA-B', CAST(12 AS BIGINT)),
  ('HLA00004', 'DRB5*01:02',        'DRB5',  CAST(20 AS BIGINT)),
  ('HLA00005', 'HLA-DRB5*01:11',    'HLA-DRB5', CAST(20 AS BIGINT)),
  ('HLA00006', 'HLA-A*99:99',       'HLA-A', CAST(3 AS BIGINT))
) AS t(allele_id, hla_name, locus, length)
ORDER BY allele_id
"""


QUERIES: dict[str, QuerySpec] = {
    "sessionize": QuerySpec(sessionize, SESSIONIZE_SQL, "gap sessionization"),
    "tumbling_window": QuerySpec(tumbling_window, TUMBLING_SQL, "6h tumbling agg"),
    "stream_user_totals": QuerySpec(
        stream_user_totals, None, "applyInPandasWithState executed (rows-only)"
    ),
    "stream_upsert_sink": QuerySpec(
        stream_upsert_sink, None, "foreachBatch bucketed MERGE sink + replay (rows-only)"
    ),
    "imgt_datasource_scan": QuerySpec(
        imgt_datasource_scan, IMGT_DS_SQL, "Python DataSource scan (S1)"
    ),
}
