"""Event-stream sessionization over the ``events`` table.

The batch twin of the streaming path: gap-based sessionization (a new
session when a user's inter-event gap exceeds 30 minutes) via the same
lag → flag → cumulative-sum segmentation the span merger uses, then one
aggregate per session. Shuffles once on user_id; the window and the
groupBy share that partitioning, so Catalyst plans a single exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SESSION_GAP_US = 30 * 60 * 1_000_000


def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_id",
        "value",
        # events.ts is TIMESTAMP_NTZ; the UTC session tz makes the cast the
        # identity mapping DuckDB's epoch_us applies to naive timestamps
        F.unix_micros(F.col("ts").cast("timestamp")).alias("te"),
    )
    w = Window.partitionBy("user_id").orderBy("te", "event_id")
    new_sess = (
        F.coalesce((F.col("te") - F.lag("te").over(w)) > SESSION_GAP_US, F.lit(True))
    ).cast("int")
    ev = ev.withColumn("new_sess", new_sess).withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return ev.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("te").alias("start_te"),
        F.max("te").alias("end_te"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


EVENT_SESSIONS_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, value, CAST(epoch_us(ts) AS BIGINT) AS te
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN te - LAG(te) OVER (PARTITION BY user_id ORDER BY te, event_id)
                      > {SESSION_GAP_US}
                 OR LAG(te) OVER (PARTITION BY user_id ORDER BY te, event_id) IS NULL
                 THEN 1 ELSE 0 END AS new_sess
  FROM ev
),
sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY te, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(te) AS start_te, MAX(te) AS end_te,
       ROUND(SUM(value), 2)     AS total_value
FROM sess GROUP BY user_id, session_id
"""
