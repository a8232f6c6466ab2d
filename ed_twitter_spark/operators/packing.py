"""Sequence assembly for LLM training: document chunking + greedy packing.

The two transforms every pretraining-data pipeline runs between "clean
corpus" and "training batches", missing from both the reference (which
stops at linked triples) and the rest of this repo's corpus ladder:

* ``chunk_documents`` — fixed-size token windows with overlap (the
  context-window shaping step for embedding / RAG ingestion). Pure JVM
  column algebra: the chunk starts are a ``sequence`` with stride
  CHUNK_N − CHUNK_OVERLAP, each chunk an ``array_join(slice(...))`` —
  one projection then one posexplode, no Python, and no shuffle in the
  operator itself (every row's chunks derive from that row alone, so
  the output inherits the scan's partitioning). Scales embarrassingly.

* ``dataset_pack`` — greedy sequential packing of documents into
  fixed-token-budget bins (the GPT-style "pack short docs into one
  sequence" step). The greedy recurrence (``cur + n > B → open a new
  bin``) is inherently sequential, so it CANNOT be a window cumsum; the
  distributed design is hierarchy: pack WITHIN each shard key —
  ``source`` here, date/shard in production — in deterministic doc_id
  order, parallel ACROSS shards via ``applyInPandas``. That is exactly
  how production packers shard the problem at 100 TB (per-file or
  per-shard packing; cross-shard bins would serialize the whole corpus
  through one ordering anyway). Each group's loop is a numpy pass over
  its token counts — Arrow in, Arrow out, no per-row Python boxing.
  Caveat the shard key carries: grouped-map semantics materialize each
  group's (doc_id, n_tokens) rows as ONE pandas frame per task, so the
  shard key must bound group size (a date/shard key in production; the
  recurrence state itself is two scalars). The DuckDB twin drives the
  same recurrence through a WITH RECURSIVE CTE that advances every
  source by one document per iteration.

Oversized documents (n > budget) get a bin of their own (the recurrence
opens a fresh bin and the NEXT doc opens another); real packers then
split them with ``chunk_documents`` first — composing the two queries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ed_twitter_spark.functions.hashing import TOKS_SQL, toks_col

CHUNK_N = 64  # tokens per chunk
CHUNK_OVERLAP = 16  # tokens shared between consecutive chunks
_STRIDE = CHUNK_N - CHUNK_OVERLAP
PACK_BUDGET = 256  # tokens per packed training sequence


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_idx, chunk_start, n_tokens, chunk_text) — overlapping
    CHUNK_N-token windows at stride CHUNK_N − CHUNK_OVERLAP (1-based
    starts; the last chunk is short; starts past the text emit nothing;
    every document emits ≥1 chunk, and consecutive chunks re-cover the
    trailing CHUNK_OVERLAP tokens of their predecessor)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = toks_col()
    # chunk index k runs 0..floor((len-1)/stride), so the last start
    # (k*stride + 1) never passes the text; floor() explicitly because
    # DuckDB CAST(double AS INT) rounds where Spark's truncates
    chunks = F.transform(
        F.sequence(F.lit(0), F.floor((F.size(t) - 1) / F.lit(_STRIDE)).cast("int")),
        lambda k: F.struct(
            (k * _STRIDE + 1).alias("chunk_start"),
            F.slice(t, k * _STRIDE + 1, CHUNK_N).alias("toks"),
        ),
    )
    return (
        docs.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "c"))
        .select(
            "doc_id",
            "chunk_idx",
            F.col("c.chunk_start").alias("chunk_start"),
            F.size("c.toks").alias("n_tokens"),
            F.array_join("c.toks", " ").alias("chunk_text"),
        )
    )


CHUNK_DOCUMENTS_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
starts AS (
  SELECT doc_id, t,
         unnest(range(0, CAST(floor((len(t) - 1) / {_STRIDE}) AS INT) + 1)) AS k
  FROM toks
)
SELECT doc_id,
       k AS chunk_idx,
       k * {_STRIDE} + 1 AS chunk_start,
       len(t[k * {_STRIDE} + 1 : k * {_STRIDE} + {CHUNK_N}]) AS n_tokens,
       array_to_string(t[k * {_STRIDE} + 1 : k * {_STRIDE} + {CHUNK_N}], ' ')
         AS chunk_text
FROM starts
ORDER BY doc_id, chunk_idx
"""


def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    n = pdf["n_tokens"].to_numpy(dtype=np.int64)
    bins = np.zeros(len(n), dtype=np.int64)
    cur = np.int64(0)
    b = np.int64(0)
    for i in range(len(n)):
        if i > 0 and cur + n[i] > PACK_BUDGET:
            b += 1
            cur = 0
        cur += n[i]
        bins[i] = b
    pdf["bin_idx"] = bins
    return pdf


def dataset_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, doc_id, n_tokens, bin_idx, bin_docs, bin_tokens) — greedy
    sequential packing of each source's documents (doc_id order) into
    PACK_BUDGET-token bins, plus the per-bin totals every assignment row
    carries (so fill ratio is read off any row of the bin).

    See module docstring for the shard-parallel design and the group-
    materialization caveat: the recurrence state is two scalars, but
    grouped-map loads each shard's count rows as one pandas frame, so
    the shard key is what bounds per-task memory.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = docs.select(
        "source", "doc_id", F.size(toks_col()).alias("n_tokens")
    )
    packed = counts.groupBy("source").applyInPandas(
        _pack_group, schema="source string, doc_id long, n_tokens int, bin_idx long"
    )
    totals = packed.groupBy("source", "bin_idx").agg(
        F.count(F.lit(1)).alias("bin_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )
    return packed.join(totals, ["source", "bin_idx"]).select(
        "source", "doc_id", "n_tokens", "bin_idx", "bin_docs", "bin_tokens"
    )


_PACK_CTES = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, source, len({TOKS_SQL}) AS n_tokens FROM documents
),
ord AS (
  SELECT doc_id, source, n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM toks
),
packed AS (
  SELECT doc_id, source, n_tokens, rn,
         CAST(0 AS BIGINT) AS bin_idx, n_tokens AS cur
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.doc_id, o.source, o.n_tokens, o.rn,
         CASE WHEN p.cur + o.n_tokens > {PACK_BUDGET}
              THEN p.bin_idx + 1 ELSE p.bin_idx END,
         CASE WHEN p.cur + o.n_tokens > {PACK_BUDGET}
              THEN o.n_tokens ELSE p.cur + o.n_tokens END
  FROM packed p JOIN ord o ON o.source = p.source AND o.rn = p.rn + 1
),
totals AS (
  SELECT source, bin_idx,
         COUNT(*) AS bin_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
  FROM packed GROUP BY source, bin_idx
)
"""

DATASET_PACK_SQL = (
    _PACK_CTES
    + """
SELECT p.source, p.doc_id, CAST(p.n_tokens AS INT) AS n_tokens,
       p.bin_idx, t.bin_docs, t.bin_tokens
FROM packed p JOIN totals t ON t.source = p.source AND t.bin_idx = p.bin_idx
"""
)


# ---------------------------------------------------------------------------
# deterministic global interleave of packed bins
# ---------------------------------------------------------------------------

_ILV_BUCKETS = 16  # one per first md5 hex digit of the ordering key


def dataset_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(global_idx, source, bin_idx, bin_tokens) — the packed training
    sequences in their final GLOBAL order: md5(source ':' bin_idx), i.e.
    a deterministic shuffle that interleaves sources (no RNG state, same
    order on every engine and every rerun — the reproducibility property
    training-data orders need for resumable jobs).

    The instructive part is HOW the global index is assigned at scale: a
    naive ``row_number() OVER (ORDER BY …)`` moves every row to ONE
    partition. Instead the ordering key's first hex digit splits the
    bins into 16 ordered buckets; each bucket numbers its rows locally
    (a partitioned window), and the bucket row-counts — 16 numbers —
    come to the driver once to compute cumulative offsets:
    global_idx = offset[bucket] + local rank. Same two-phase scheme as
    a range-partitioned sort; the only driver state is the 16-row count
    vector (the ``n = nodes.count()`` budget class).
    """
    from pyspark.sql import Window

    bins = (
        dataset_pack(spark, sf_dir)
        .select("source", "bin_idx", "bin_tokens")
        .distinct()
    )
    key = F.md5(F.concat_ws(":", "source", F.col("bin_idx").cast("string")))
    b = bins.withColumn("okey", key).withColumn(
        "bucket", F.conv(F.substring("okey", 1, 1), 16, 10).cast("int")
    )
    w = Window.partitionBy("bucket").orderBy("okey", "source", "bin_idx")
    ranked = b.withColumn("rn", F.row_number().over(w))
    counts = {
        r["bucket"]: r["n"]
        for r in b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for bucket in range(_ILV_BUCKETS):
        offsets[bucket] = acc
        acc += counts.get(bucket, 0)
    off = F.create_map(
        *[x for bucket, o in sorted(offsets.items()) for x in (F.lit(bucket), F.lit(o))]
    )
    return ranked.select(
        (off[F.col("bucket")] + F.col("rn")).cast("long").alias("global_idx"),
        "source",
        "bin_idx",
        "bin_tokens",
    )


DATASET_INTERLEAVE_SQL = (
    _PACK_CTES.rstrip()
    + """,
bins AS (
  SELECT DISTINCT p.source, p.bin_idx, t.bin_tokens
  FROM packed p JOIN totals t ON t.source = p.source AND t.bin_idx = p.bin_idx
)
SELECT row_number() OVER (
         ORDER BY md5(source || ':' || CAST(bin_idx AS VARCHAR)), source, bin_idx
       ) AS global_idx,
       source, bin_idx, bin_tokens
FROM bins
"""
)
