"""Streaming distinct-cardinality: HLL registers as live aggregation state.

The point of a register sketch at 10^12 turns is that it never needs the
corpus twice — and that makes it the natural STREAMING cardinality
monitor: the 256-register table IS the streaming state (bounded, tiny,
mergeable by element-wise max), maintained by an ordinary streaming
aggregation ``groupBy(register).max(rank)``. Spark's state store applies
exactly the merge the sketch algebra defines, so the cumulative register
table after any micro-batch split equals the batch table on the same
input — the batch≡stream property the registry oracle checks value-exact
(same estimate algebra as ``operators/sketches.py``, which argues why
the float sum is order-independent EXACT).

Plan shape per micro-batch: stateless shingle explode + hash projection
(no shuffle), then the aggregation exchange over ≤256 keys. Output mode
is ``complete`` — legal and cheap precisely because the aggregate is 256
rows; the memory sink holds the current register table, and the final
estimate is one batch aggregation over it. Unlike the stateless
streaming linker (`streaming/link.py`), this demonstrates the STATEFUL
side of the streaming surface with bounded state.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ed_twitter_spark.operators.dedup import shingle_rows
from ed_twitter_spark.operators.sketches import (
    _SHINGLES_DISTINCT_SQL,
    _HLL_ALPHA_M2,
    HLL_M,
    hll_estimate,
    hll_register_cols,
)


def hll_register_stream(docs_stream: DataFrame) -> DataFrame:
    """documents stream → live (register, m) aggregation (the sketch state)."""
    items = shingle_rows(docs_stream).select("shingle")
    register, rank = hll_register_cols(F.col("shingle"))
    return (
        items.select(register.alias("register"), rank.alias("rank"))
        .groupBy("register")
        .agg(F.max("rank").alias("m"))
    )


def stage_documents(spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 4) -> str:
    """Stage the documents table as a multi-file stream source so
    ``maxFilesPerTrigger`` yields real micro-batch boundaries."""
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def run_distinct_once(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = 2,
    query_name: str | None = None,
) -> DataFrame:
    """Bounded replay (availableNow) of the staged document stream through
    the register aggregation; returns the final register table."""
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="stream_hll_ckpt_")
    query_name = query_name or f"stream_hll_{uuid.uuid4().hex[:8]}"
    static = spark.read.parquet(src_dir)
    reader = spark.readStream.schema(static.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    regs = hll_register_stream(reader.parquet(src_dir))
    q = (
        regs.writeStream.outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    # a False return means the bounded replay did NOT finish: the memory
    # sink would hold a partial register table, which must be an error,
    # never a silently under-merged estimate
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            f"streaming HLL replay '{query_name}' did not complete within 300s"
        )
    return spark.table(query_name)


def stream_distinct_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: stage → micro-batched replay → estimate row.

    Oracle = the batch HLL estimate SQL (no exact arm — the stream never
    holds the items to count); value equality proves the state-store
    merge reproduced the batch register table bit-for-bit.
    """
    # per-run unique staging dir: a shared fixed path races concurrent
    # runs (overwrite-while-streaming) and aliases distinct corpora that
    # share a basename
    src = os.path.join(
        tempfile.gettempdir(), f"stream_hll_src_{uuid.uuid4().hex[:12]}"
    )
    stage_documents(spark, sf_dir, src)
    try:
        regs = run_distinct_once(spark, src)
    finally:
        # the memory sink holds the result; the staged source is dead
        shutil.rmtree(src, ignore_errors=True)
    return hll_estimate(regs)


STREAM_DISTINCT_SQL = f"""
WITH items AS ({_SHINGLES_DISTINCT_SQL}),
regs AS (
  SELECT CAST(('0x' || substr(md5(item), 1, 2)) AS INT) AS register,
         MAX(CASE WHEN CAST(('0x' || substr(md5(item), 3, 8)) AS BIGINT) = 0
                  THEN 33
                  ELSE 33 - length(bin(CAST(('0x' || substr(md5(item), 3, 8)) AS BIGINT)))
             END) AS m
  FROM items GROUP BY register
),
agg AS (
  SELECT COUNT(*) AS present, SUM(power(2.0, -m)) AS s_present FROM regs
)
SELECT {_HLL_ALPHA_M2} / (s_present + ({HLL_M} - present)) AS hll_raw_estimate,
       ({HLL_M} - present) AS zero_registers
FROM agg
"""


# ---------------------------------------------------------------------------
# streaming Count-Min: additive counters as streaming state
# ---------------------------------------------------------------------------


def cms_cell_stream(docs_stream: DataFrame) -> DataFrame:
    """documents stream → live (depth, bucket, cnt) Count-Min counters.

    The HLL above demonstrates max-merge state; this is the ADDITIVE
    sketch family — streaming aggregation state of DEPTH×WIDTH int64
    counters, merged by plain summation across micro-batches (the same
    property that makes CMS map-side combinable in batch). The stream
    sketches the RAW token stream (count per cell), which is the
    production shape — no vocabulary arm exists on a stream.
    """
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    from ed_twitter_spark.functions.hashing import toks_col
    from ed_twitter_spark.operators.sketches import CMS_DEPTH, _cms_bucket_col

    toks = docs_stream.select(F.explode(toks_col()).alias("token"))
    cells = toks.select(
        F.posexplode(
            F.array(*[_cms_bucket_col(d) for d in range(CMS_DEPTH)])
        ).alias("depth", "bucket")
    )
    return cells.groupBy("depth", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def run_cms_once(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = 2,
    query_name: str | None = None,
) -> DataFrame:
    """Bounded replay of the staged document stream through the counter
    aggregation; returns the final (depth, bucket, cnt) table."""
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="stream_cms_ckpt_")
    query_name = query_name or f"stream_cms_{uuid.uuid4().hex[:8]}"
    static = spark.read.parquet(src_dir)
    reader = spark.readStream.schema(static.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    cells = cms_cell_stream(reader.parquet(src_dir))
    q = (
        cells.writeStream.outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            f"streaming CMS replay '{query_name}' did not complete within 300s"
        )
    return spark.table(query_name)


def stream_heavy_hitters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the streamed counter table joined with the batch
    vocabulary lookup — output identical to ``heavy_hitters_cms`` (the
    estimate arm comes from streaming state; the exact arm stays the
    batch verification side), proving counter state merged across
    micro-batches equals the batch sketch.
    """
    from pyspark.sql import functions as F  # noqa: F811

    from ed_twitter_spark.operators.sketches import (
        CMS_DEPTH,
        _cms_bucket_col,
        _tokens,
    )

    src = os.path.join(
        tempfile.gettempdir(), f"stream_cms_src_{uuid.uuid4().hex[:12]}"
    )
    stage_documents(spark, sf_dir, src)
    try:
        sketch = run_cms_once(spark, src)
    finally:
        shutil.rmtree(src, ignore_errors=True)
    vocab = (
        _tokens(spark, sf_dir)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    lookup = vocab.select(
        "token",
        "exact_count",
        F.posexplode(
            F.array(*[_cms_bucket_col(d) for d in range(CMS_DEPTH)])
        ).alias("depth", "bucket"),
    )
    return (
        lookup.join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("cnt").alias("est_count"))
        .select("token", "est_count", "exact_count")
    )


# ---------------------------------------------------------------------------
# streaming exact dedup — the state-store twin of operators.dedup.dedup_exact
# ---------------------------------------------------------------------------


def dedup_state_stream(docs_stream: DataFrame) -> DataFrame:
    """documents stream → live (content_hash, n_docs, canonical_doc_id)
    aggregation. A stateful streaming GROUP BY, not ``dropDuplicates``:
    first-seen dedup depends on micro-batch arrival order, while
    (COUNT, MIN) state merges are order-independent — so the final state
    table is deterministic for ANY interleaving and equals the batch
    ``dedup_exact`` output exactly. State is one row per distinct
    content hash (the deduped corpus size), keyed by the same hash the
    batch operator groups on."""
    return (
        docs_stream.select(
            "doc_id", F.md5(F.lower("text")).alias("content_hash")
        )
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def run_dedup_once(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = 2,
    query_name: str | None = None,
) -> DataFrame:
    """Bounded replay (availableNow) of the staged document stream through
    the dedup state aggregation; returns the final state table."""
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="stream_dedup_ckpt_")
    query_name = query_name or f"stream_dedup_{uuid.uuid4().hex[:8]}"
    static = spark.read.parquet(src_dir)
    reader = spark.readStream.schema(static.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    state = dedup_state_stream(reader.parquet(src_dir))
    q = (
        state.writeStream.outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            f"streaming dedup replay '{query_name}' did not complete within 300s"
        )
    return spark.table(query_name)


def stream_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: stage → micro-batched replay → final dedup state.

    Oracle = the batch ``DEDUP_EXACT_SQL`` twin: value equality proves the
    state-store (COUNT, MIN) merges across micro-batches reproduce the
    batch group-by exactly — the property an always-on ingest dedup at
    10^12 turns rests on (state size = deduped corpus, not stream length;
    Spark shards the state store by the same hash key the shuffle uses).
    """
    src = os.path.join(
        tempfile.gettempdir(), f"stream_dedup_src_{uuid.uuid4().hex[:12]}"
    )
    stage_documents(spark, sf_dir, src)
    try:
        return run_dedup_once(spark, src)
    finally:
        shutil.rmtree(src, ignore_errors=True)
