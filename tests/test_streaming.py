"""Structured Streaming ingestion: bounded replay in append mode emits
exactly the *finalized* windows (watermark passed), with values equal to
the batch aggregate, and duplicate deliveries dedup away."""

from __future__ import annotations

import datetime

from conftest import SF_SMOKE

from ed_twitter_spark import synth
from ed_twitter_spark.streaming import ingest


def _materialize_transcripts(spark, tmp_path, duplicate: bool = False) -> str:
    t = synth.transcripts(spark, SF_SMOKE)
    src = str(tmp_path / "stream_src")
    t.write.mode("overwrite").parquet(src)
    if duplicate:
        # simulate at-least-once redelivery: append the same turns again
        t.write.mode("append").parquet(src)
    return src


def _batch_aggregate(spark, src):
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(src)
        .dropDuplicates(["conv_id", "turn_idx"])
        .select(
            "conv_id",
            F.window("ts", ingest.WINDOW).alias("window"),
            F.size(
                F.filter(
                    F.split("text", r"\s+"),
                    lambda t: F.length(t) >= synth.MENTION_MIN_LEN,
                )
            ).alias("n"),
        )
        .groupBy(F.col("window.start").alias("win_start"), "conv_id")
        .agg(F.sum("n").alias("mentions"))
        .collect()
    )


def _finalized_keys(spark, src, batch_rows):
    """Keys of windows the append-mode run must have finalized: window end
    at-or-before the final watermark (max event time − delay)."""
    from pyspark.sql import functions as F

    max_ts = spark.read.parquet(src).agg(F.max("ts")).first()[0]
    def _delta(spec: str) -> datetime.timedelta:
        n, unit = spec.split()
        return datetime.timedelta(**{unit.rstrip("s") + "s": int(n)})

    wm = max_ts - _delta(ingest.WATERMARK)
    win = _delta(ingest.WINDOW)
    return {
        (r["win_start"], r["conv_id"])
        for r in batch_rows
        if r["win_start"] + win <= wm
    }


def test_stream_matches_batch_aggregate(spark, tmp_path):
    src = _materialize_transcripts(spark, tmp_path)
    rows = ingest.run_ingest_once(spark, src, str(tmp_path / "ckpt")).collect()
    got = {(r["win_start"], r["conv_id"]): r["mentions"] for r in rows}

    batch = _batch_aggregate(spark, src)
    want = {(r["win_start"], r["conv_id"]): r["mentions"] for r in batch}
    final = _finalized_keys(spark, src, batch)

    assert len(got) > 0
    # every emitted window is value-exact vs the batch aggregate
    assert all(want.get(k) == v for k, v in got.items())
    # every window that must be finalized under the watermark was emitted
    assert final <= set(got)


def test_stream_dedups_redelivered_turns(spark, tmp_path):
    src = _materialize_transcripts(spark, tmp_path, duplicate=True)
    rows = ingest.run_ingest_once(spark, src, str(tmp_path / "ckpt2")).collect()
    got = {(r["win_start"], r["conv_id"]): r["mentions"] for r in rows}

    batch_once = _batch_aggregate(spark, src)  # deduped batch twin
    want = {(r["win_start"], r["conv_id"]): r["mentions"] for r in batch_once}

    assert len(got) > 0
    # emitted counts equal the *deduped* batch values — redelivery did not
    # double-count any window
    assert all(want.get(k) == v for k, v in got.items())


def test_foreach_batch_stage_handoff(spark, tmp_path):
    """The stream lands in the same checkpoint catalog as the batch
    pipeline: per-micro-batch stages with lineage + per-partition metrics,
    whose union equals the deduped batch read of the source."""
    from ed_twitter_spark import io as kgio

    src = _materialize_transcripts(spark, tmp_path, duplicate=True)
    root = str(tmp_path / "stage_root")
    stages = ingest.run_ingest_to_stage(
        spark, src, str(tmp_path / "ckpt_fb"), root
    )
    assert len(stages) >= 1

    total = 0
    for name in stages:
        rec = kgio.read_lineage(spark, root, name)
        assert rec is not None and rec["deps"] == '["transcript_stream"]'
        m = kgio.read_metrics(spark, root, name).collect()
        tot = next(r for r in m if r["partition_id"] == -1)
        assert rec["rows"] == tot["rows"]
        total += rec["rows"]

    want = (
        spark.read.parquet(src).dropDuplicates(["conv_id", "turn_idx"]).count()
    )
    assert total == want
