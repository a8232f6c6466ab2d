"""Structured Streaming ingestion: bounded replay equals the batch result,
and duplicate deliveries dedup away."""

from __future__ import annotations

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


def test_stream_matches_batch_aggregate(spark, tmp_path):
    src = _materialize_transcripts(spark, tmp_path)
    rows = ingest.run_ingest_once(spark, src, str(tmp_path / "ckpt"))
    got = {(r["win_start"], r["conv_id"]): r["mentions"] for r in rows}

    from pyspark.sql import functions as F

    batch = (
        spark.read.parquet(src)
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
    want = {(r["win_start"], r["conv_id"]): r["mentions"] for r in batch}
    assert got == want and len(got) > 0


def test_stream_dedups_redelivered_turns(spark, tmp_path):
    src = _materialize_transcripts(spark, tmp_path, duplicate=True)
    rows = ingest.run_ingest_once(spark, src, str(tmp_path / "ckpt2"))
    total = sum(r["mentions"] for r in rows)

    from pyspark.sql import functions as F

    once = (
        spark.read.parquet(src)
        .dropDuplicates(["conv_id", "turn_idx"])
        .select(
            F.size(
                F.filter(
                    F.split("text", r"\s+"),
                    lambda t: F.length(t) >= synth.MENTION_MIN_LEN,
                )
            ).alias("n")
        )
        .agg(F.sum("n"))
        .first()[0]
    )
    assert total == once
