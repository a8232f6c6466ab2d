"""Watermarked tumbling-window aggregation under LATE arrivals — the
append-mode finalization semantics a streaming KG/metrics pipeline
relies on, replayed deterministically and pinned by the batch oracle.

The staged replay splits the events table into two micro-batch files
(ordered by forced mtimes, the FileStreamSource contract):

* batch 0 — "on-time": every event below the time cutoff except a
  deterministic held-back subset,
* batch 1 — "the rest": the tail (ts ≥ cutoff) PLUS the held-back old
  rows, which therefore arrive LATE — many of them far beyond the
  watermark horizon.

Semantics this pins (measured on this engine version, asserted in
tests/test_streaming_late.py, and encoded in the oracle):

1. The watermark advances at batch boundaries to
   ``floor(max_event_ms seen so far) − delay``; during batch 1 it is
   ``maxA − delay``.
2. Late input rows are NOT dropped while their window's state is still
   live — they MERGE (Spark's drop applies to state already evicted;
   with two batches every group's first eviction happens at or after
   batch 1's end, so every late row lands in live state and the final
   count equals the batch count).
3. A window is emitted (append mode) exactly once, when the watermark
   first reaches ``window_end ≤ watermark`` (boundary measured:
   INCLUSIVE) — windows past the final watermark are withheld, which
   is the correctness half of "late data handling": never emit a
   window that could still change.

Those three rules give the emitted set a closed form the DuckDB twin
computes from the SAME parquet: full-corpus tumbling counts, filtered
to windows whose end ≤ final watermark. Value equality across a replay
with out-of-order arrival is the batch ≡ stream invariant with late
data in the loop.

At 10^12 turns this operator is the standing ingest aggregation: state
is one row per (window, type), the watermark bounds state size, and the
two-file replay here stands in for the multi-executor micro-batch
cadence (same state-store code path).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WINDOW = "1 day"
WINDOW_US = 86_400_000_000
DELAY = "6 hours"
DELAY_MS = 6 * 3600 * 1000
# held-back rule: old rows of these users arrive in batch 1 (late)
HOLD_MOD = 7


def _cutoff_us(spark: SparkSession, sf_dir: str) -> int:
    """On-time/tail split point: min + 3/4 of the span, integer µs."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    row = ev.agg(F.min(tus).alias("lo"), F.max(tus).alias("hi")).first()
    return row["lo"] + (row["hi"] - row["lo"]) * 3 // 4


def stage_two_batches(spark: SparkSession, sf_dir: str, dst: str) -> str:
    """Write the on-time file and the late+tail file with forced mtimes so
    the file stream source replays them as two ordered micro-batches."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cut = _cutoff_us(spark, sf_dir)
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    held = (F.col("user_id") % HOLD_MOD == 0) & (tus < F.lit(cut))
    on_time = ev.where((tus < F.lit(cut)) & ~held)
    late_tail = ev.where((tus >= F.lit(cut)) | held)
    tmp = tempfile.mkdtemp(prefix="late_build_")
    on_time.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/a")
    late_tail.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/b")
    os.makedirs(dst, exist_ok=True)
    fa = glob.glob(f"{tmp}/a/part-*.parquet")[0]
    fb = glob.glob(f"{tmp}/b/part-*.parquet")[0]
    shutil.copy(fa, f"{dst}/batch0.parquet")
    shutil.copy(fb, f"{dst}/batch1.parquet")
    now = time.time()
    os.utime(f"{dst}/batch0.parquet", (now - 120, now - 120))
    os.utime(f"{dst}/batch1.parquet", (now - 60, now - 60))
    shutil.rmtree(tmp, ignore_errors=True)
    return dst


def windowed_counts_stream(stream: DataFrame) -> DataFrame:
    # parquet carries TIMESTAMP_NTZ; the session is pinned UTC so the cast
    # is epoch-identical (the sessionize.py convention)
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", DELAY)
        .groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            F.col("n").cast("long").alias("n"),
        )
    )


def run_late_window_once(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str | None = None,
    query_name: str | None = None,
):
    """Bounded two-micro-batch replay; returns (emitted rows DF, query)."""
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="late_ckpt_")
    query_name = query_name or f"stream_late_{uuid.uuid4().hex[:8]}"
    static = spark.read.parquet(src_dir)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = windowed_counts_stream(stream)
    q = (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(f"late-window replay '{query_name}' did not finish")
    return spark.table(query_name), q


def stream_late_window_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: stage → two-batch out-of-order replay → emitted
    (window_start, event_type, n) rows."""
    src = os.path.join(
        tempfile.gettempdir(), f"stream_late_src_{uuid.uuid4().hex[:12]}"
    )
    stage_two_batches(spark, sf_dir, src)
    try:
        emitted, _ = run_late_window_once(spark, src)
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return emitted


# DuckDB twin: the closed form of rules 1-3 — full-corpus tumbling counts,
# windows withheld past the final watermark floor(max_ms) − delay.
STREAM_LATE_WINDOW_SQL = f"""
WITH ev AS (
  SELECT epoch_us(ts) AS tus, event_type FROM events
),
wm AS (
  SELECT (MAX(tus) // 1000) - {DELAY_MS} AS wm_ms FROM ev
),
win AS (
  SELECT tus - (tus % {WINDOW_US}) AS ws_us, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2
)
SELECT ws_us // 1000000 AS window_start, event_type, n
FROM win CROSS JOIN wm
WHERE (ws_us + {WINDOW_US}) // 1000 <= wm_ms
"""
