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


DATASET_PACK_SQL = f"""
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
SELECT p.source, p.doc_id, CAST(p.n_tokens AS INT) AS n_tokens,
       p.bin_idx, t.bin_docs, t.bin_tokens
FROM packed p JOIN totals t ON t.source = p.source AND t.bin_idx = p.bin_idx
"""
