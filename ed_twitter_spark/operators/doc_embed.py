"""Embedding-cosine near-duplicate detection over ``documents``.

Completes the dedup ladder's embedding rung (dedup.py covers exact /
minhash / shingle-jaccard / simhash; similarity.py covers ANN over a
*given* embedding column). Here the embedding itself is derived from the
document text by feature hashing — the standard trick for computing
document vectors without a model at corpus scale — and near-duplicates
are found with signed-random-projection LSH (Charikar'02 simhash family,
but over the *feature vector*, not the token multiset):

1. **Feature hashing**: token → bucket ``h & 63`` (D = 64 buckets),
   signed ±1 by hash bit 6; per-doc sparse vector v[bucket] = Σ signs.
   Everything integer, so both engines agree bit-for-bit.
2. **Signatures**: 64 deterministic ±1 hyperplanes (weights hashed from
   the literal string ``hp_<plane>_<bucket>``); signature bit p =
   [⟨v, w_p⟩ ≥ 0]. Integer dot products — no float ordering hazards.
   Band keys are assembled directly per (doc, band) — the 64-bit packed
   fingerprint is never materialized, sidestepping the int64 sign bit.
3. **LSH banding**: 4 bands × 16 bits. A pair with cosine c collides on
   one band with probability (1 − θ/π)^16, θ = arccos(c) — exactly 1.0
   for identical-BoW duplicates (same vector ⇒ same signature), and
   < 2% per band for the moderate-cosine bulk (c ≤ 0.6), so the bucket
   self-join costs Σ bucket² over 65,536 key values per band, never n².
   16-bit bands trade recall for mid-similarity pairs (≈ 28% at c = 0.9
   when vectors differ) for selectivity — the right trade for a dedup
   candidate generator whose true positives sit at c ≈ 1.0. (8-bit bands
   admitted ~23% of all pairs on the synthetic corpus, whose 31-token
   vocabulary makes random documents collide at c ≈ 0.5-0.6.)
4. **Verify**: exact cosine from the sparse feature vectors (integer dot
   / integer norms), keep pairs ≥ EMB_COS_MIN.

At 10^12-doc scale every stage is a hash-partitioned aggregation or a
bucketed self-join; the feature table is ≤ 64 rows per doc and the
hyperplane table is a 2048-row broadcast constant.

Reference parity note: the reference has no embedding dedup — this is
part of the training-data-pipeline surface this engine adds on top
(SURVEY.md §2 addendum); the hashing conventions follow
functions/hashing.py so the DuckDB oracle is value-exact.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ed_twitter_spark.caching import persist_tracked
from ed_twitter_spark.functions.hashing import TOKS_SQL, h32_col, h32_sql, toks_col

DOC_EMBED_DIM = 64  # feature-hash buckets
N_PLANES = 64  # signature bits
EMB_BANDS = 4
EMB_BAND_BITS = N_PLANES // EMB_BANDS
EMB_COS_MIN = 0.9


def _plane_weight(p: int, bucket: int) -> int:
    """±1 hyperplane weight — Python twin of the h32 convention
    (first 8 md5 hex digits as int), so the broadcast constant matrix
    matches what the DuckDB oracle derives in SQL."""
    h = int(hashlib.md5(f"hp_{p}_{bucket}".encode()).hexdigest()[:8], 16)
    return 2 * (h & 1) - 1


def doc_features(docs: DataFrame) -> DataFrame:
    """(doc_id, bucket, v) sparse hashed-BoW vectors, integer-valued.

    One explode + one map-side-combined aggregation keyed (doc_id,
    bucket); the shuffle moves ≤ DOC_EMBED_DIM rows per document."""
    tok = docs.select("doc_id", F.explode(toks_col()).alias("tok")).select(
        "doc_id", h32_col(F.col("tok")).alias("h")
    )
    return (
        tok.groupBy(
            "doc_id", F.expr(f"h & {DOC_EMBED_DIM - 1}").alias("bucket")
        )
        .agg(F.sum(F.expr("2 * ((h >> 6) & 1) - 1")).alias("v"))
        .where(F.col("v") != 0)
    )


def dedup_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc1, doc2, cos) — embedding-cosine near-dup pairs via LSH."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = persist_tracked(doc_features(docs))

    planes = spark.createDataFrame(
        [(p, b, _plane_weight(p, b)) for p in range(N_PLANES) for b in range(DOC_EMBED_DIM)],
        "p INT, bucket BIGINT, w INT",
    )
    dots = (
        feats.join(F.broadcast(planes), on="bucket")
        .groupBy("doc_id", "p")
        .agg(F.sum(F.col("v") * F.col("w")).alias("s"))
    )
    bands = dots.groupBy(
        "doc_id", F.expr(f"p div {EMB_BAND_BITS}").alias("band")
    ).agg(
        F.sum(
            F.expr(f"CASE WHEN s >= 0 THEN shiftleft(1L, p % {EMB_BAND_BITS}) ELSE 0L END")
        ).alias("key")
    )
    a = bands.select(F.col("doc_id").alias("doc1"), "band", "key")
    b = bands.select(F.col("doc_id").alias("doc2"), "band", "key")
    cand = (
        a.join(b, on=["band", "key"])
        .where(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )

    norms = feats.groupBy("doc_id").agg(F.sum(F.col("v") * F.col("v")).alias("n2"))
    f1 = feats.select(F.col("doc_id").alias("doc1"), "bucket", F.col("v").alias("v1"))
    f2 = feats.select(F.col("doc_id").alias("doc2"), "bucket", F.col("v").alias("v2"))
    dot = (
        cand.join(f1, on="doc1")
        .join(f2, on=["doc2", "bucket"])
        .groupBy("doc1", "doc2")
        .agg(F.sum(F.col("v1") * F.col("v2")).alias("dot"))
    )
    n1 = norms.select(F.col("doc_id").alias("doc1"), F.col("n2").alias("m1"))
    n2 = norms.select(F.col("doc_id").alias("doc2"), F.col("n2").alias("m2"))
    return (
        dot.join(n1, on="doc1")
        .join(n2, on="doc2")
        .select(
            "doc1",
            "doc2",
            F.round(
                F.col("dot") / F.sqrt(F.col("m1").cast("double") * F.col("m2")), 4
            ).alias("cos"),
        )
        .where(F.col("cos") >= EMB_COS_MIN)
    )


_PLANE_W_SQL = h32_sql("'hp_' || CAST(p AS VARCHAR) || '_' || CAST(bucket AS VARCHAR)")

DEDUP_EMBED_SQL = f"""
WITH tok AS (
  SELECT doc_id, {h32_sql('tok')} AS h
  FROM (SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents)
),
feat AS (
  SELECT doc_id, h & {DOC_EMBED_DIM - 1} AS bucket,
         SUM(2 * ((h >> 6) & 1) - 1) AS v
  FROM tok GROUP BY doc_id, h & {DOC_EMBED_DIM - 1}
  HAVING SUM(2 * ((h >> 6) & 1) - 1) <> 0
),
plane AS (
  SELECT p, bucket, 2 * ({_PLANE_W_SQL} & 1) - 1 AS w
  FROM range(0, {N_PLANES}) t(p), range(0, {DOC_EMBED_DIM}) u(bucket)
),
dots AS (
  SELECT f.doc_id, pl.p, SUM(f.v * pl.w) AS s
  FROM feat f JOIN plane pl USING (bucket)
  GROUP BY f.doc_id, pl.p
),
bands AS (
  SELECT doc_id, p // {EMB_BAND_BITS} AS band,
         SUM(CASE WHEN s >= 0 THEN (1::BIGINT << (p % {EMB_BAND_BITS})) ELSE 0 END) AS key
  FROM dots GROUP BY doc_id, p // {EMB_BAND_BITS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
),
norms AS (SELECT doc_id, SUM(v * v) AS n2 FROM feat GROUP BY doc_id),
dot AS (
  SELECT c.doc1, c.doc2, SUM(f1.v * f2.v) AS dot
  FROM cand c
  JOIN feat f1 ON f1.doc_id = c.doc1
  JOIN feat f2 ON f2.doc_id = c.doc2 AND f2.bucket = f1.bucket
  GROUP BY c.doc1, c.doc2
)
SELECT d.doc1, d.doc2,
       ROUND(d.dot / sqrt(CAST(m1.n2 AS DOUBLE) * m2.n2), 4) AS cos
FROM dot d
JOIN norms m1 ON m1.doc_id = d.doc1
JOIN norms m2 ON m2.doc_id = d.doc2
WHERE ROUND(d.dot / sqrt(CAST(m1.n2 AS DOUBLE) * m2.n2), 4) >= {EMB_COS_MIN}
"""
