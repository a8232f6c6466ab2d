"""As-of join — attach the most recent right-side row at-or-before each
left row, per key. The canonical time-series operator Spark's DataFrame
API lacks (pandas has ``merge_asof``; kdb/Flink/QuestDB ship it native).

Spark-first design — the union merge-sort formulation, NOT a range join:
union both sides into one stream, shuffle ONCE on the key, sort each
partition by (ts, event_id), and carry the last right-side row forward
with ``last(..., ignorenulls=True)`` over an unbounded-preceding row
window. Cost is one Exchange + one in-partition sort regardless of how
many right rows precede each left row; the naive
``left.ts >= right.ts`` range join Catalyst would pick for the same
semantics builds O(|left| × |right|) intermediate rows per key before
its max-aggregate. Skewed keys (viral users) cost their own row count,
never a cross product.

Tie semantics: rows are ordered by (ts, event_id); a right row with the
same timestamp as a left row matches only if its event_id sorts first —
deterministic under the driver's stable ordering requirement.

The registered query joins each ``purchase`` event to the same user's
most recent ``view`` event — the classic attribution query.

Reference parity note: the reference has no event-time operators; this
extends the transcript/event analytics surface (SURVEY.md §2.10 family)
for training-data pipelines (e.g. aligning tool results to the turn that
triggered them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

LEFT_TYPE = "purchase"
RIGHT_TYPE = "view"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    order: list[str],
    carry: list[str],
) -> DataFrame:
    """Generic as-of join: for each ``left`` row, the latest ``right`` row
    at-or-before it in ``order``, matching on ``key``.

    ``carry`` columns are taken from the right side; all ``left`` columns
    survive. Both inputs must share the ``key`` + ``order`` columns."""
    l = left.withColumn("_is_left", F.lit(True))
    r = right.withColumn("_is_left", F.lit(False))
    for c in left.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    for c in carry:
        l = l.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    cols = left.columns + ["_is_left"] + carry
    u = l.select(cols).unionByName(r.select(cols))
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last(c, ignorenulls=True).over(w).alias(c) for c in carry]
    keep = [c for c in left.columns if c not in carry]
    return u.select(*keep, "_is_left", *carried).where(F.col("_is_left")).drop("_is_left")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def asof_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, user_id, ts_epoch, view_event_id, view_ts_epoch, gap_s)
    — each purchase with the same user's most recent prior view."""
    ev = _events(spark, sf_dir)
    left = ev.where(F.col("event_type") == LEFT_TYPE).select(
        "event_id", "user_id", "ts"
    )
    right = (
        ev.where(F.col("event_type") == RIGHT_TYPE)
        .select(
            F.col("event_id").alias("view_event_id"),
            "user_id",
            "ts",
        )
        .withColumn("view_ts", F.col("ts"))
        .withColumn("event_id", F.col("view_event_id"))
    )
    out = asof_join(
        left,
        right.select("event_id", "user_id", "ts", "view_event_id", "view_ts"),
        key="user_id",
        order=["ts", "event_id"],
        carry=["view_event_id", "view_ts"],
    )
    # events.ts is TIMESTAMP_NTZ; the UTC session tz makes unix_micros the
    # identity mapping DuckDB's epoch_us applies to naive timestamps
    te = F.unix_micros(F.col("ts").cast("timestamp"))
    vte = F.unix_micros(F.col("view_ts").cast("timestamp"))
    return out.select(
        "event_id",
        "user_id",
        te.alias("ts_us"),
        "view_event_id",
        vte.alias("view_ts_us"),
        (te - vte).alias("gap_us"),
    )


ASOF_VIEW_PURCHASE_SQL = f"""
WITH u AS (
  SELECT event_id, user_id, ts,
         event_type = '{LEFT_TYPE}' AS is_left,
         CASE WHEN event_type = '{RIGHT_TYPE}' THEN event_id END AS view_event_id,
         CASE WHEN event_type = '{RIGHT_TYPE}' THEN ts END AS view_ts
  FROM events WHERE event_type IN ('{LEFT_TYPE}', '{RIGHT_TYPE}')
),
carried AS (
  SELECT event_id, user_id, ts, is_left,
         LAST_VALUE(view_event_id IGNORE NULLS) OVER w AS view_event_id,
         LAST_VALUE(view_ts IGNORE NULLS) OVER w AS view_ts
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       view_event_id,
       CAST(epoch_us(view_ts) AS BIGINT) AS view_ts_us,
       CAST(epoch_us(ts) AS BIGINT) - CAST(epoch_us(view_ts) AS BIGINT) AS gap_us
FROM carried WHERE is_left
"""
