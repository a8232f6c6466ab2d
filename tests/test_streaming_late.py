"""Late-arrival watermark semantics of the two-batch windowed replay.

The gate pins emitted values ≡ the closed-form batch SQL; this test pins
the MECHANISM the closed form relies on (module docstring rules 1-3):
real two-batch replay, watermark sequence, late rows merging into live
state, and windows past the final watermark being withheld.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from ed_twitter_spark.streaming import late_window as lw
from tests.conftest import SF_SMOKE


def test_two_batch_late_replay_semantics(spark):
    src = os.path.join(tempfile.gettempdir(), f"late_t_{uuid.uuid4().hex[:10]}")
    lw.stage_two_batches(spark, SF_SMOKE, src)
    try:
        emitted, q = lw.run_late_window_once(spark, src)
        prog = [p for p in q.recentProgress]

        ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        tus = F.unix_micros(F.col("ts").cast("timestamp"))
        cut = lw._cutoff_us(spark, SF_SMOKE)
        held = (F.col("user_id") % lw.HOLD_MOD == 0) & (tus < F.lit(cut))
        n_a = ev.where((tus < F.lit(cut)) & ~held).count()
        n_b = ev.count() - n_a
        assert n_b > 0 and n_a > 0

        data_batches = [p for p in prog if p["numInputRows"] > 0]
        assert [p["numInputRows"] for p in data_batches] == [n_a, n_b]

        # watermark during batch 1 = floor(maxA ms) − delay (rule 1)
        max_a_us = (
            ev.where((tus < F.lit(cut)) & ~held).agg(F.max(tus).alias("m")).first()["m"]
        )
        wm1 = data_batches[1]["eventTime"]["watermark"]
        import datetime

        wm1_ms = int(
            datetime.datetime.fromisoformat(wm1.replace("Z", "+00:00")).timestamp()
            * 1000
        )
        assert wm1_ms == max_a_us // 1000 - lw.DELAY_MS

        # held-back rows arrive beyond that watermark (genuinely late) ...
        n_late_beyond = ev.where(
            held & (tus < F.lit((wm1_ms) * 1000))
        ).count()
        assert n_late_beyond > 0
        # ... yet the emitted counts equal the FULL batch counts (rule 2:
        # merged, not dropped) and windows past the final watermark are
        # withheld (rule 3)
        max_all_us = ev.agg(F.max(tus).alias("m")).first()["m"]
        wm_final_ms = max_all_us // 1000 - lw.DELAY_MS
        batch = (
            ev.select(tus.alias("tus"), "event_type")
            .groupBy(
                (F.col("tus") - F.col("tus") % lw.WINDOW_US).alias("ws_us"),
                "event_type",
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )
        expect_emit = {
            (r["ws_us"] // 1_000_000, r["event_type"]): r["n"]
            for r in batch.collect()
            if (r["ws_us"] + lw.WINDOW_US) // 1000 <= wm_final_ms
        }
        expect_withheld = sum(
            1
            for r in batch.collect()
            if (r["ws_us"] + lw.WINDOW_US) // 1000 > wm_final_ms
        )
        got = {
            (r["window_start"], r["event_type"]): r["n"] for r in emitted.collect()
        }
        assert got == expect_emit
        assert expect_withheld > 0  # the cutoff actually withheld something
    finally:
        shutil.rmtree(src, ignore_errors=True)
