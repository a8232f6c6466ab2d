"""Streaming HLL: the register table as streaming-aggregation state.

Pins the batch≡stream contract: a micro-batched replay of the document
stream produces EXACTLY the batch register table and estimate (the state
store's max-merge is the sketch's merge), and an incremental restart
from the checkpoint folds newly-landed files into the same registers.
"""

from __future__ import annotations

import pytest
from conftest import SF_SMOKE

from ed_twitter_spark.operators import sketches as sk
from ed_twitter_spark.operators.dedup import shingle_rows
from ed_twitter_spark.streaming import sketch as ssk


def _batch_registers(spark, src_dir):
    from pyspark.sql import functions as F

    items = shingle_rows(spark.read.parquet(src_dir)).select("shingle")
    register, rank = sk.hll_register_cols(F.col("shingle"))
    return (
        items.select(register.alias("register"), rank.alias("rank"))
        .groupBy("register")
        .agg(F.max("rank").alias("m"))
    )


def test_stream_registers_equal_batch(spark, tmp_path):
    src = ssk.stage_documents(spark, SF_SMOKE, str(tmp_path / "src"), n_files=4)
    # maxFilesPerTrigger=1 -> 4 micro-batches: a real incremental merge
    got = ssk.run_distinct_once(
        spark, src, checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    want = _batch_registers(spark, src)
    as_set = lambda df: {(r["register"], r["m"]) for r in df.collect()}
    assert as_set(got) == as_set(want)


def test_stream_estimate_equals_batch_query(spark, tmp_path):
    batch = sk.distinct_sketch(spark, SF_SMOKE).collect()[0]
    stream = ssk.stream_distinct_query(spark, SF_SMOKE).collect()[0]
    # EXACT equality: the estimate algebra is order-independent dyadic
    assert stream.hll_raw_estimate == batch.hll_raw_estimate
    assert stream.zero_registers == batch.zero_registers


def test_stream_incremental_restart(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    first, second = (
        docs.where("doc_id % 2 = 0"),
        docs.where("doc_id % 2 = 1"),
    )
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    first.coalesce(1).write.mode("overwrite").parquet(src)
    ssk.run_distinct_once(spark, src, checkpoint_dir=ckpt, query_name="hll_a")
    # new files land; restart from the same checkpoint processes only them,
    # and the merged state must equal one pass over everything
    second.coalesce(1).write.mode("append").parquet(src)
    got = ssk.run_distinct_once(spark, src, checkpoint_dir=ckpt, query_name="hll_b")
    want = _batch_registers(spark, src)
    as_set = lambda df: {(r["register"], r["m"]) for r in df.collect()}
    assert as_set(got) == as_set(want)


def test_stream_cms_counters_equal_batch(spark, tmp_path):
    """Counter (sum-merge) state across micro-batches equals one batch
    aggregation of the same cells — the additive analogue of the HLL
    max-merge test above."""
    from pyspark.sql import functions as F

    from ed_twitter_spark.operators.sketches import CMS_DEPTH, _cms_bucket_col

    src = ssk.stage_documents(spark, SF_SMOKE, str(tmp_path / "src"), n_files=4)
    got = ssk.run_cms_once(
        spark, src, checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    toks = spark.read.parquet(src).select(
        F.explode(F.split("text", r"\s+")).alias("token")
    )
    want = (
        toks.select(
            F.posexplode(
                F.array(*[_cms_bucket_col(d) for d in range(CMS_DEPTH)])
            ).alias("depth", "bucket")
        )
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    as_set = lambda df: {(r["depth"], r["bucket"], r["cnt"]) for r in df.collect()}
    assert as_set(got) == as_set(want)


def test_stream_dedup_equals_batch(spark, tmp_path):
    """Micro-batched streaming dedup state ≡ batch dedup_exact, and an
    incremental restart folds a late-arriving duplicate file into the
    same state (n_docs increments, canonical MIN survives)."""
    from pyspark.sql import functions as F

    from ed_twitter_spark.operators.dedup import dedup_exact

    src = ssk.stage_documents(spark, SF_SMOKE, str(tmp_path / "dsrc"), n_files=4)
    got = ssk.run_dedup_once(
        spark, src, checkpoint_dir=str(tmp_path / "dckpt"), max_files_per_trigger=1
    )
    as_map = lambda df: {
        r["content_hash"]: (r["n_docs"], r["canonical_doc_id"]) for r in df.collect()
    }
    want = as_map(dedup_exact(spark, SF_SMOKE))
    assert as_map(got) == want

    # late file: re-send one existing doc with a HIGHER doc_id (dup text)
    docs = spark.read.parquet(src)
    one = docs.orderBy("doc_id").limit(1)
    dup_id = one.first()["doc_id"] + 10_000_000
    one.withColumn("doc_id", F.lit(dup_id).cast("long")).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got2 = as_map(
        ssk.run_dedup_once(
            spark, src, checkpoint_dir=str(tmp_path / "dckpt"),
            max_files_per_trigger=1,
        )
    )
    h = one.select(F.md5(F.lower("text")).alias("h")).first()["h"]
    n0, canon0 = want[h]
    assert got2[h] == (n0 + 1, canon0)  # count grew, canonical unchanged
    assert {k: v for k, v in got2.items() if k != h} == {
        k: v for k, v in want.items() if k != h
    }
