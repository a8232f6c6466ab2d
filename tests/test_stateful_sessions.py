"""Stateful streaming sessionization (`streaming/sessionize.py`):

* single-batch bounded replay emits exactly the sessions the append-mode
  contract finalizes (closed by a successor, or timed out under the final
  watermark), value-exact vs the batch twin `event_sessions`;
* a time-ordered multi-file replay (state carried across micro-batches)
  emits the same set — cross-batch state carry changes nothing observable.
"""

from __future__ import annotations

import datetime

from conftest import SF_SMOKE

from pyspark.sql import functions as F

from ed_twitter_spark.operators.sessions import SESSION_GAP_US, event_sessions
from ed_twitter_spark.streaming import sessionize as ssz


def _expected_emitted(spark, sf_dir):
    """Batch sessions filtered by the append-mode emission predicate."""
    sess = event_sessions(spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    max_te = ev.agg(
        F.max(F.unix_micros(F.col("ts").cast("timestamp")))
    ).first()[0]
    wm_ms = max_te // 1000 - ssz.DELAY_MS
    from pyspark.sql import Window

    last = F.max("session_id").over(Window.partitionBy("user_id"))
    return {
        tuple(r)
        for r in sess.withColumn("is_last", F.col("session_id") == last)
        .where(
            (~F.col("is_last"))
            | (F.lit(wm_ms) > (F.col("end_te") / 1000).cast("long") + ssz.GAP_MS)
        )
        .select(
            "user_id", "session_id", "n_events", "start_te", "end_te", "total_value"
        )
        .collect()
    }


def test_stateful_sessions_single_batch(spark, tmp_path):
    got = {
        tuple(r)
        for r in ssz.run_sessionize(
            spark,
            SF_SMOKE,
            checkpoint_dir=str(tmp_path / "ckpt"),
            query_name="t_sess_single",
        ).collect()
    }
    want = _expected_emitted(spark, SF_SMOKE)
    assert len(got) > 0
    assert got == want


def test_stateful_sessions_state_carries_across_batches(spark, tmp_path):
    # split events into three time-ordered files so per-user sessions span
    # micro-batch boundaries; write oldest-first with distinct mtimes so the
    # file source replays them in event-time order (no late drops, so the
    # emitted set must equal the single-batch one)
    import os
    import time

    # place the two cuts strictly inside multi-event sessions so at least
    # one session's events provably land in different micro-batches
    multi = (
        event_sessions(spark, SF_SMOKE)
        .where(F.col("n_events") > 1)
        .orderBy("start_te")
        .select("start_te", "end_te")
        .collect()
    )
    assert len(multi) >= 2, "fixture has no multi-event sessions to split"
    cuts = [
        (multi[0]["start_te"] + multi[0]["end_te"]) // 2,
        (multi[-1]["start_te"] + multi[-1]["end_te"]) // 2,
    ]
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").withColumn(
        "te", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    src = str(tmp_path / "sess_src")
    os.makedirs(src, exist_ok=True)
    parts = [
        ev.where(F.col("te") <= cuts[0]).drop("te"),
        ev.where((F.col("te") > cuts[0]) & (F.col("te") <= cuts[1])).drop("te"),
        ev.where(F.col("te") > cuts[1]).drop("te"),
    ]
    sf_like = str(tmp_path / "sf_like")
    os.makedirs(sf_like, exist_ok=True)
    for i, p in enumerate(parts):
        p.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"_p{i}"))
        f = next(
            fn
            for fn in os.listdir(str(tmp_path / f"_p{i}"))
            if fn.endswith(".parquet")
        )
        os.rename(
            str(tmp_path / f"_p{i}" / f), os.path.join(src, f"part{i}.parquet")
        )
        time.sleep(1.1)  # distinct mtimes -> file-source replay order

    # point run_sessonize at a dir whose events.parquet is the 3-file dir
    os.symlink(src, os.path.join(sf_like, "events.parquet"))
    got = {
        tuple(r)
        for r in ssz.run_sessionize(
            spark,
            sf_like,
            checkpoint_dir=str(tmp_path / "ckpt_mb"),
            max_files_per_trigger=1,
            query_name="t_sess_multi",
        ).collect()
    }
    want = _expected_emitted(spark, SF_SMOKE)
    assert len(got) > 0
    assert got == want
    # the split genuinely crossed session boundaries (state was carried):
    # an emitted session spans each cut (row layout: user_id, session_id,
    # n_events, start_te, end_te, total_value)
    for cut in cuts:
        assert any(
            r[3] <= cut <= r[4] for r in want
        ), "test split did not exercise cross-batch state"
