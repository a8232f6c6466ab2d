"""Mergeable frequency/cardinality sketches for 100-TB corpus profiling.

Two classic sub-linear-state sketches a pretraining-data pipeline runs
before anything else — "what are the head tokens?" and "how big is the
vocabulary?" — expressed as pure DataFrame algebra with value-exact
DuckDB twins (every hash is md5-derived via ``functions/hashing.py``, so
both engines compute the identical sketch, not merely statistically
similar ones).

* ``heavy_hitters_cms`` — a Count-Min sketch (Cormode & Muthukrishnan
  2005) over the token stream: CMS_DEPTH independent md5-derived hash
  rows × CMS_WIDTH counters. The sketch build is ONE map-side-combined
  aggregation into ≤ DEPTH·WIDTH cells — constant state regardless of
  corpus size, and counter matrices merge by plain addition, so at
  10^12 turns each executor combines locally and ships DEPTH·WIDTH
  int64s. Estimates are min over depths; CMS guarantees
  est ≥ true (one-sided error ≤ 2N/WIDTH w.h.p.), which the gate output
  exhibits: the query emits (token, est_count, exact_count) so the
  overestimate property is directly checkable (the exact column is the
  gate's verification arm; at production scale you'd keep only the
  sketch side and a per-partition local-top-k candidate pass).
  WIDTH is deliberately SMALLER than the test vocabulary so collisions
  actually occur and the min-over-depths does real work.

* ``distinct_sketch`` — a HyperLogLog register table (Flajolet et al.
  2007) at p=8 (256 registers) over word-3-gram shingles: register =
  first 8 md5 bits, rank = leading-zero count of the next 32 bits + 1
  (computed exactly in both engines as 33 − length(bin(v)), since both
  ``bin()`` implementations drop leading zeros). The register build is
  one groupBy(register).max(rank) — 256 rows of state at any corpus
  size, mergeable by element-wise max, which is the whole point: a
  COUNT DISTINCT over 10^12 rows becomes a 2-KB commutative aggregate.
  The raw estimate α_m·m²/Σ2^(−M_j) is order-independent EXACT double
  arithmetic: each 2^(−r) term (r ≤ 33) is a dyadic rational and every
  partial sum of ≤256 such terms spans ≤41 mantissa bits < 53, so the
  float sum is exact in any order and the division is the same IEEE op
  in both engines. The small-range linear-counting correction
  m·ln(m/V) is NOT folded into the gated value (libm ln may differ by
  ulps across engines); the query emits the raw estimate plus the
  zero-register count so a caller can apply it.

Neither sketch exists in the reference (it holds all counters in one
process's dicts — e.g. the A1 (mention,entity) counts); these are the
scale path for the same profiling questions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ed_twitter_spark.caching import persist_tracked
from ed_twitter_spark.functions.hashing import TOKS_SQL, h32_col, h32_sql, toks_col
from ed_twitter_spark.operators.dedup import _shingles_raw

CMS_DEPTH = 4
CMS_WIDTH = 32  # < test vocabulary size on purpose: collisions exercised
HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
# alpha_256 * 256^2, embedded as one literal so both engines divide the
# same constant by the same exact register sum
_HLL_ALPHA_M2 = repr(0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M)

_TOKENS_SQL = f"SELECT unnest({TOKS_SQL}) AS token FROM documents"


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(F.explode(toks_col()).alias("token"))


# ---------------------------------------------------------------------------
# Count-Min sketch heavy hitters
# ---------------------------------------------------------------------------


def _cms_bucket_col(depth: int) -> F.Column:
    return h32_col(F.concat(F.lit(f"{depth}:"), F.col("token"))) % CMS_WIDTH


def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, est_count, exact_count) for every distinct token, with
    est_count the Count-Min estimate (min over CMS_DEPTH rows).

    Plan shape: one token scan feeds BOTH arms. The sketch arm fans each
    token to CMS_DEPTH (depth, bucket) cells via posexplode and
    aggregates into ≤ DEPTH·WIDTH rows (map-side combined — the shuffle
    carries at most DEPTH·WIDTH rows per task, not the token stream).
    The lookup arm is vocabulary-sized (sub-linear vs the corpus) and
    joins the tiny sketch broadcast. est ≥ exact always (CMS one-sided
    error) — a property test asserts it.
    """
    toks = _tokens(spark, sf_dir)
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_count"))
    # Build the sketch from the vocabulary counts the exact arm already
    # produced: counter(d, b) = Σ counts of tokens hashing to (d, b) —
    # identical to sketching the raw stream, at 4×|vocab| md5s instead of
    # 4×|tokens|. (A production run with no exact arm sketches the raw
    # stream directly: count instead of sum, same map-side combine.)
    # Persisted: lookup feeds BOTH the sketch aggregation and the join's
    # probe side — without it the corpus-wide token scan + vocabulary
    # aggregation would execute twice (released via release_caches).
    lookup = persist_tracked(
        vocab.select(
            "token",
            "exact_count",
            F.posexplode(
                F.array(*[_cms_bucket_col(d) for d in range(CMS_DEPTH)])
            ).alias("depth", "bucket"),
        )
    )
    sketch = lookup.groupBy("depth", "bucket").agg(
        F.sum("exact_count").alias("cnt")
    )
    return (
        lookup.join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("cnt").alias("est_count"))
        .select("token", "est_count", "exact_count")
    )


def heavy_hitters_sql() -> str:
    bucket = h32_sql("CAST(d AS VARCHAR) || ':' || token") + f" % {CMS_WIDTH}"
    depths = ", ".join(f"({d})" for d in range(CMS_DEPTH))
    return f"""
WITH toks AS ({_TOKENS_SQL}),
depths AS (SELECT * FROM (VALUES {depths}) AS dep(d)),
vocab AS (SELECT token, COUNT(*) AS exact_count FROM toks GROUP BY 1),
lookup AS (
  SELECT token, exact_count, d AS depth, {bucket} AS bucket
  FROM vocab CROSS JOIN depths
),
sketch AS (
  SELECT depth, bucket, CAST(SUM(exact_count) AS BIGINT) AS cnt
  FROM lookup GROUP BY 1, 2
)
SELECT token, MIN(cnt) AS est_count, exact_count
FROM lookup JOIN sketch USING (depth, bucket)
GROUP BY token, exact_count
ORDER BY token
"""


# ---------------------------------------------------------------------------
# HyperLogLog distinct-cardinality sketch
# ---------------------------------------------------------------------------

# items = the corpus's distinct word-3-gram shingles (same shingle
# definition the dedup ladder uses, so the estimate is of a quantity the
# pipeline actually materializes elsewhere)
_SHINGLES_DISTINCT_SQL = f"""
SELECT DISTINCT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS item
FROM (SELECT {TOKS_SQL} AS toks FROM documents),
     UNNEST(range(1, len(toks) - 1)) AS t(i)
WHERE len(toks) >= 3
"""


def _shingle_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _shingles_raw(spark, sf_dir).select(F.col("shingle").alias("item")).distinct()
    )


def hll_register_cols(item: F.Column) -> tuple[F.Column, F.Column]:
    """(register, rank) for one item — the per-row sketch contribution.

    Shared by the batch query and the streaming register maintenance
    (``streaming/sketch.py``): register = first 8 md5 bits, rank =
    leading-zero count of the next 32 bits + 1, computed exactly in both
    engines as 33 − length(bin(v))."""
    h = F.md5(item)
    v = F.conv(F.substring(h, 3, 8), 16, 10).cast("long")
    register = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    rank = F.when(v == 0, F.lit(33)).otherwise(33 - F.length(F.bin(v)))
    return register, rank


def hll_estimate(regs: DataFrame) -> DataFrame:
    """Register table (register, m) → one row
    (hll_raw_estimate, zero_registers). Exact double algebra — see module
    docstring."""
    agg = regs.agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("s_present"),
    )
    return agg.select(
        (
            F.lit(float(_HLL_ALPHA_M2))
            / (F.col("s_present") + (F.lit(HLL_M) - F.col("present")))
        ).alias("hll_raw_estimate"),
        (F.lit(HLL_M) - F.col("present")).alias("zero_registers"),
    )


def distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: (exact_distinct, hll_raw_estimate, zero_registers).

    The register table is the distributed object: groupBy(register)
    .max(rank) — commutative/associative, 256 rows of state at any
    scale. ``exact_distinct`` is the gate's verification arm (a real
    COUNT DISTINCT the sketch replaces in production — drop that arm and
    the whole job is one constant-state aggregation). The estimate is
    the raw HLL harmonic mean — exact double algebra (see module
    docstring), not rounded, because every term is dyadic. The plan's
    one BroadcastNestedLoopJoin is the 1-row × 1-row combine of the two
    scalar aggregates, not a data-sized cross product.
    """
    # persisted: items feeds the register table AND the exact arm —
    # without it the shingle explode + corpus-wide distinct runs twice
    items = persist_tracked(_shingle_items(spark, sf_dir))
    register, rank = hll_register_cols(F.col("item"))
    regs = (
        items.select(register.alias("register"), rank.alias("rank"))
        .groupBy("register")
        .agg(F.max("rank").alias("m"))
    )
    exact = items.agg(F.count(F.lit(1)).alias("exact_distinct"))
    return exact.crossJoin(hll_estimate(regs)).select(
        "exact_distinct", "hll_raw_estimate", "zero_registers"
    )


def distinct_sketch_sql() -> str:
    return f"""
WITH items AS ({_SHINGLES_DISTINCT_SQL}),
hashed AS (
  SELECT CAST(('0x' || substr(md5(item), 1, 2)) AS INT) AS register,
         CAST(('0x' || substr(md5(item), 3, 8)) AS BIGINT) AS v
  FROM items
),
regs AS (
  SELECT register,
         MAX(CASE WHEN v = 0 THEN 33 ELSE 33 - length(bin(v)) END) AS m
  FROM hashed GROUP BY register
),
agg AS (
  SELECT COUNT(*) AS present, SUM(power(2.0, -m)) AS s_present FROM regs
),
exact AS (SELECT COUNT(*) AS exact_distinct FROM items)
SELECT exact_distinct,
       {_HLL_ALPHA_M2} / (s_present + ({HLL_M} - present)) AS hll_raw_estimate,
       ({HLL_M} - present) AS zero_registers
FROM exact, agg
"""
