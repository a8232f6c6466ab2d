"""Funnel and retention analytics over the ``events`` table.

The two classic product-analytics questions every event warehouse
answers, expressed Spark-first with value-exact DuckDB twins (all time
arithmetic in integer microseconds/days — Spark ``unix_micros`` ≡ DuckDB
``epoch_us``, ``datediff`` ≡ ``date_diff('day', …)`` — so no float or
timezone drift can flip a value):

* ``event_funnel`` — the ordered view → click → purchase funnel: per
  user, the FIRST view, the first click strictly after it, the first
  purchase strictly after that, completion counted only within
  FUNNEL_WINDOW_US of the view. Three filtered min-aggregations chained
  by user-keyed joins — each stage's frame is user-sized (≤ one row per
  user), so at 10^12 events the heavy lifting is three map-side-combined
  mins over the event scan and the joins never exceed |users|.

* ``event_retention`` — weekly retention cohorts: cohort = Monday week
  of the user's first event, one row per (cohort_week, week_offset)
  with the distinct users active that week. One min-aggregation for the
  cohort table (user-sized, broadcast back) + one distinct over
  (user, week) — the standard two-scan cohort shape; offsets are
  integer-day differences divided by 7, never float.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # purchase within 7 days of view


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: (n_view, n_click, n_purchase, rate_click, rate_purchase)
    — users entering each ordered funnel step, with per-step conversion
    rates (rounded to 6 dp identically in both engines)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    v = (
        ev.where(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == FUNNEL_STEPS[1])
        .join(v, "user_id")
        .where(F.col("us") > F.col("t1"))
        .groupBy("user_id", "t1")
        .agg(F.min("us").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == FUNNEL_STEPS[2])
        .join(c, "user_id")
        .where(F.col("us") > F.col("t2"))
        .groupBy("user_id", "t1")
        .agg(F.min("us").alias("t3"))
        .where(F.col("t3") - F.col("t1") <= FUNNEL_WINDOW_US)
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase")))
    )
    return counts.select(
        "n_view",
        "n_click",
        "n_purchase",
        F.round(F.col("n_click") / F.col("n_view"), 6).alias("rate_click"),
        F.round(F.col("n_purchase") / F.col("n_click"), 6).alias("rate_purchase"),
    )


EVENT_FUNNEL_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
v AS (
  SELECT user_id, MIN(us) AS t1 FROM ev
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
),
c AS (
  SELECT e.user_id, v.t1, MIN(e.us) AS t2
  FROM ev e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.us > v.t1
  GROUP BY e.user_id, v.t1
),
p AS (
  SELECT e.user_id, c.t1, MIN(e.us) AS t3
  FROM ev e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.us > c.t2
  GROUP BY e.user_id, c.t1
  HAVING MIN(e.us) - c.t1 <= {FUNNEL_WINDOW_US}
)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_click,
       (SELECT COUNT(*) FROM p) AS n_purchase,
       ROUND((SELECT COUNT(*) FROM c) * 1.0 / (SELECT COUNT(*) FROM v), 6)
         AS rate_click,
       ROUND((SELECT COUNT(*) FROM p) * 1.0 / (SELECT COUNT(*) FROM c), 6)
         AS rate_purchase
"""


def event_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cohort_week, week_offset, n_users) — weekly retention triangle:
    users whose FIRST event falls in cohort_week and who are active
    week_offset weeks later (offset 0 = the cohort week itself)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts").cast("timestamp"))).alias("wk")
    )
    cohort = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(F.broadcast(cohort), "user_id")
        .select(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            "week_offset",
            "n_users",
        )
    )


EVENT_RETENTION_SQL = """
WITH ev AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
),
cohort AS (SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY user_id)
SELECT CAST(c.cohort_week AS VARCHAR) AS cohort_week,
       CAST(date_diff('day', c.cohort_week, e.wk) / 7 AS INT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM ev e JOIN cohort c ON c.user_id = e.user_id
GROUP BY c.cohort_week, CAST(date_diff('day', c.cohort_week, e.wk) / 7 AS INT)
"""


# ---------------------------------------------------------------------------
# daily volume anomaly — trailing-window z-score over per-type event counts
# ---------------------------------------------------------------------------

ANOM_TRAIL_DAYS = 7
ANOM_MIN_WINDOW = 3
ANOM_SIGMA = 3.0


def event_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day, n, trail_mean, trail_std, is_anomaly) — per-type
    daily event volume flagged against its own trailing week: anomalous
    iff n > mean + 3σ over the PRECEDING ≤7 days (≥3 days of history —
    the cold-start rows are dropped, not emitted as false negatives).
    The monitoring query an always-on ingest pipeline alarms from.

    Determinism across engines is engineered, not hoped for: the window
    carries only INTEGER sums (Σn, Σn², count), so mean/var/σ derive from
    exact integers via one shared formula — no engine-library variance
    (whose accumulation order could differ in the last ulp) touches the
    comparison. Plan shape: the 10^12-row scan collapses to one
    (event_type, day) map-side-combined count; the window runs over that
    tiny daily table partitioned by type — driver-trivial at any scale.
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-ANOM_TRAIL_DAYS, -1)
    )
    trail = daily.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("k"),
    ).where(F.col("k") >= ANOM_MIN_WINDOW)
    mean = F.col("s1") / F.col("k")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("k")) / F.col("k")
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    return trail.select(
        "event_type",
        "day",
        "n",
        F.round(mean, 6).alias("trail_mean"),
        F.round(std, 6).alias("trail_std"),
        (F.col("n") > mean + F.lit(ANOM_SIGMA) * std).alias("is_anomaly"),
    )


EVENT_ANOMALY_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
trail AS (
  SELECT event_type, day, n,
         SUM(n) OVER w AS s1,
         SUM(n * n) OVER w AS s2,
         COUNT(*) OVER w AS k
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {ANOM_TRAIL_DAYS} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, n,
       ROUND(s1 * 1.0 / k, 6) AS trail_mean,
       ROUND(sqrt(GREATEST((s2 - s1 * 1.0 * s1 / k) / k, 0.0)), 6) AS trail_std,
       n > s1 * 1.0 / k + {ANOM_SIGMA} * sqrt(GREATEST((s2 - s1 * 1.0 * s1 / k) / k, 0.0))
         AS is_anomaly
FROM trail WHERE k >= {ANOM_MIN_WINDOW}
"""
