"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch twin (`operators/sessions.py`) segments each user's event
stream into sessions whenever the inter-event gap exceeds 30 minutes.
This module is the *streaming* form of the same operator — the per-key
state machine a real ingest pipeline would run on the unbounded events
feed, where the lag/cumsum window trick is unavailable because the
stream never ends:

* state per ``user_id`` = the one open session
  ``(session_id, start_te, end_te, n_events, total_value)``;
* an arriving event either extends the open session or — when the gap
  exceeds ``SESSION_GAP_US`` — closes it (emitting one output row) and
  opens the next;
* the **event-time timeout** closes the trailing open session once the
  watermark passes ``end + gap``: late events beyond the watermark can
  no longer extend it, so at that point the session is final. This is
  what bounds state to O(active users), not O(stream).

Emission semantics (append mode) are therefore deterministic given a
bounded replay that processes the input in one micro-batch: a session is
emitted iff it was closed by a later event of the same user, or its
``end + gap`` fell behind the final watermark ``max(ts) - DELAY`` (the
no-data micro-batch that Structured Streaming runs after the last data
batch fires those timeouts). The DuckDB oracle for the registry query
``stream_sessions`` states exactly that predicate over the batch
sessionization — watermark arithmetic is in *milliseconds* (Spark
truncates event-time µs → ms for watermark/timeout bookkeeping), and the
timeout fires strictly after (``wm_ms > timeout_ms``).

Scale: one shuffle on user_id (the state key); state rows are O(1) per
user. At 1000 executors the same code runs unchanged — keys hash across
the cluster and the RocksDB/HDFS state store holds the per-user rows.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ed_twitter_spark.operators.sessions import SESSION_GAP_US

WATERMARK = "2 minutes"
DELAY_MS = 2 * 60 * 1000
GAP_MS = SESSION_GAP_US // 1000

_OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, "
    "start_te long, end_te long, total_value double"
)
_STATE_SCHEMA = (
    "session_id long, start_te long, end_te long, "
    "n_events long, total_value double"
)


def _emit(user_id: int, sid: int, st: int, en: int, n: int, tv: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_id": [sid],
            "n_events": [n],
            "start_te": [st],
            "end_te": [en],
            # match the batch twin / oracle ROUND(SUM(value), 2)
            "total_value": [round(tv, 2)],
        }
    )


def _sessionize_key(
    key: Tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # watermark passed end+gap: the open session is final
        sid, st, en, n, tv = state.get
        state.remove()
        yield _emit(user_id, sid, st, en, n, tv)
        return

    chunks = [p for p in pdf_iter]
    pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
    pdf = pdf.sort_values(["te", "event_id"])

    if state.exists:
        sid, st, en, n, tv = state.get
    else:
        sid, st, en, n, tv = 0, 0, 0, 0, 0.0

    for te, val in zip(pdf["te"].to_numpy(), pdf["value"].to_numpy()):
        te = int(te)
        if n == 0:
            sid, st, en, n, tv = sid + 1, te, te, 1, float(val)
        elif te - en > SESSION_GAP_US:
            yield _emit(user_id, sid, st, en, n, tv)
            sid, st, en, n, tv = sid + 1, te, te, 1, float(val)
        else:
            en, n, tv = te, n + 1, tv + float(val)

    state.update((sid, st, en, n, tv))
    # Spark's watermark/timeout clock is ms (µs truncated); fires at wm > ts
    state.setTimeoutTimestamp(en // 1000 + GAP_MS)


def sessionize_stream(stream: DataFrame) -> DataFrame:
    """Watermarked per-user stateful sessionization of an events stream.

    ``stream`` must carry (event_id, ts, user_id, value); the watermark
    column ``ets`` and the µs event time ``te`` are derived here so batch
    and streaming paths share the integer-µs timestamp convention.
    """
    ev = stream.select(
        "user_id",
        "event_id",
        "value",
        F.col("ts").cast("timestamp").alias("ets"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("te"),
    ).withWatermark("ets", WATERMARK)
    return ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_key,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_sessionize(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    query_name: str = "stream_sessions",
) -> DataFrame:
    """Bounded replay (availableNow) of the events parquet through the
    stateful sessionizer into a memory sink; returns the emitted rows as
    a batch DataFrame.

    With the default single micro-batch (no ``max_files_per_trigger``)
    the emitted set is deterministic and oracle-checkable; splitting into
    multiple batches exercises cross-batch state carry (tested, but the
    emitted set then depends on intermediate watermarks).
    """
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="stream_sess_ckpt_")
    # the file stream source wants a directory; the testdata table is a
    # single parquet file — stage a hardlink (fall back to copy) into one
    src_file = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(src_file):
        src = src_file
    else:
        src = tempfile.mkdtemp(prefix="stream_sess_src_")
        try:
            os.link(src_file, os.path.join(src, "events.parquet"))
        except OSError:
            import shutil

            shutil.copy(src_file, os.path.join(src, "events.parquet"))
    static = spark.read.parquet(src)
    reader = spark.readStream.schema(static.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    sessions = sessionize_stream(reader.parquet(src))
    q = (
        sessions.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(query_name)


# Emitted = batch sessions closed either by a successor session of the
# same user, or by the event-time timeout: wm_ms > end_ms + gap_ms with
# wm_ms = (max event time over the whole input, truncated to ms) - delay.
STREAM_SESSIONS_SQL = f"""
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
),
agg AS (
  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         MIN(te) AS start_te, MAX(te) AS end_te,
         ROUND(SUM(value), 2) AS total_value,
         CAST(session_id AS BIGINT) = MAX(CAST(session_id AS BIGINT))
             OVER (PARTITION BY user_id) AS is_last
  FROM sess GROUP BY user_id, session_id
),
wm AS (
  SELECT (MAX(te) // 1000) - {DELAY_MS} AS wm_ms FROM ev
)
SELECT user_id, session_id, n_events, start_te, end_te, total_value
FROM agg, wm
WHERE NOT is_last OR wm_ms > (end_te // 1000) + {GAP_MS}
"""
