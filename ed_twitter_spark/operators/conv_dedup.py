"""Conversation-level deduplication over the transcripts table.

The dedup ladder in operators/dedup.py works at document granularity; a
10^12-turn transcript corpus also needs dedup at *conversation*
granularity (re-ingested sessions, mirrored logs, repeated synthetic
rollouts). The fingerprint is the order-sensitive polynomial rolling
hash doc_fingerprint uses, lifted to turns:

    fp(conv) = Σ_turns (turn_idx + 1) · h32(text)  mod 2^61−1

Position-weighting makes the fingerprint sensitive to turn ORDER (two
conversations with the same turns shuffled differ) while the Σ itself is
commutative — so the whole thing is ONE map-side-combined aggregation
keyed conv_id, no sort, no collect_list, no shuffle of full turn text.
A second vertex-sized aggregation groups identical fingerprints into
duplicate sets (canonical = min conv_id, matching dedup_exact).

Per-turn text equality under stable (conv_id, turn_idx) ordering — the
north-rule row invariant — is exactly what makes this fingerprint a
sound equality witness across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ed_twitter_spark import synth
from ed_twitter_spark.functions.hashing import h32_col, h32_sql

_MOD = (1 << 61) - 1


def conv_fingerprints(transcripts_df: DataFrame) -> DataFrame:
    """(conv_id, n_turns, fingerprint) — one aggregation over the turn
    stream.

    Overflow discipline: each term (turn_idx+1)·h32 < 2^32·2^32 = 2^64
    would wrap a signed int64, so terms are reduced mod 2^61−1 BEFORE the
    sum; the sum of < 2^61 terms then rides a 128-bit accumulator on both
    engines (Spark: decimal(30,0) → decimal(38,0) sum; DuckDB:
    SUM(BIGINT) → HUGEINT) and only the final mod comes back to int64."""
    term = F.expr(f"CAST((turn_idx + 1) AS BIGINT) * h % {_MOD}")
    t = transcripts_df.select(
        "conv_id", "turn_idx", h32_col(F.col("text")).alias("h")
    )
    return t.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        (F.sum(term.cast("decimal(30,0)")) % _MOD)
        .cast("long")
        .alias("fingerprint"),
    )


def conv_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(fingerprint, n_turns, n_convs, canonical_conv) — duplicate
    conversation groups by order-sensitive content fingerprint."""
    fp = conv_fingerprints(synth.transcripts(spark, sf_dir))
    return fp.groupBy("fingerprint", "n_turns").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.min("conv_id").alias("canonical_conv"),
    )


CONV_DEDUP_SQL = f"""
WITH transcripts AS ({synth.TRANSCRIPTS_SQL}),
fp AS (
  SELECT conv_id,
         CAST(COUNT(*) AS BIGINT) AS n_turns,
         CAST(SUM((CAST(turn_idx + 1 AS BIGINT) * {h32_sql('text')}) % {_MOD})
              % {_MOD} AS BIGINT) AS fingerprint
  FROM transcripts GROUP BY conv_id
)
SELECT fingerprint, n_turns,
       CAST(COUNT(*) AS BIGINT) AS n_convs,
       MIN(conv_id) AS canonical_conv
FROM fp GROUP BY fingerprint, n_turns
"""
