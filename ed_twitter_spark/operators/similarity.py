"""Similarity search + embedding near-dup over the ``embeddings`` table.

The two retrieval paths a training-data pipeline needs over an
``array<float>`` embedding column:

* ``ann_cosine_topk``  — brute-force cosine top-k: broadcast the (small)
  query set against the full corpus, cosine via JVM ``zip_with`` +
  ``aggregate`` folds (float64 accumulation, no Python), window top-k per
  query. This is the exactness baseline; at corpus scale its cost is
  |Q|·|corpus| — fine for |Q| ≪ corpus since the corpus side stays
  pipelined in one scan with no shuffle before the (tiny) top-k.
* ``ann_ivf_topk``     — the scale path: IVF-style partition pruning using
  the precomputed coarse-cluster ``label`` column (= IVF centroid
  assignment, nprobe=1). The probe joins on label, so each query scores
  only its cell — Σ|cell|·|Q|/cells work, and the join key co-locates the
  cell in one shuffle partition.
* ``embed_cosine_pairs`` — embedding near-duplicate pairs: label-blocked
  self-join (same IVF pruning) + cosine ≥ COS_MIN. Blocked all-pairs is
  the standard embedding-dedup design: cluster first, compare within
  cells. (COS_MIN tuned to the synthetic corpus's cosine distribution so
  the query exercises a non-empty result; a real corpus would use ~0.95.)

All cosines are rounded to 4 decimals *before* thresholding/ranking so
Spark and the DuckDB oracle order identically despite ulp-level float
association differences; ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_QUERIES = 8  # query set: vec_id < 8
TOP_K = 5
COS_MIN = 0.35


def _cos(e1, e2):
    dot = F.aggregate(
        F.zip_with(e1, e2, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    n1 = F.aggregate(e1, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
    n2 = F.aggregate(e2, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
    return F.round(dot / (F.sqrt(n1) * F.sqrt(n2)), 4)


# DuckDB twin: element-wise fold via UNNEST(range) with explicit double
# casts; both engines then ROUND(·, 4) before any comparison.
_COS_SQL = """
  ROUND((SELECT SUM(CAST(q.embedding[k] AS DOUBLE) * CAST(c.embedding[k] AS DOUBLE))
         FROM UNNEST(range(1, 65)) AS t(k))
        / (sqrt((SELECT SUM(CAST(q.embedding[k] AS DOUBLE) ** 2) FROM UNNEST(range(1, 65)) AS t(k)))
           * sqrt((SELECT SUM(CAST(c.embedding[k] AS DOUBLE) ** 2) FROM UNNEST(range(1, 65)) AS t(k)))), 4)
"""


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    joined = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id", "vec_id", _cos(F.col("qe"), F.col("embedding")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cos")
    )


ANN_COSINE_SQL = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, {_COS_SQL} AS cos
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank,
       vec_id, cos
FROM scored
QUALIFY rank <= {TOP_K}
"""


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("qlabel"),
    )
    joined = emb.join(
        F.broadcast(q),
        (F.col("label") == F.col("qlabel")) & (F.col("vec_id") != F.col("query_id")),
    ).select("query_id", "vec_id", _cos(F.col("qe"), F.col("embedding")).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cos")
    )


ANN_IVF_SQL = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, {_COS_SQL} AS cos
  FROM embeddings q JOIN embeddings c
    ON c.label = q.label AND c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank,
       vec_id, cos
FROM scored
QUALIFY rank <= {TOP_K}
"""


def embed_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.select(
        F.col("vec_id").alias("v1"), F.col("embedding").alias("e1"), "label"
    )
    b = emb.select(
        F.col("vec_id").alias("v2"), F.col("embedding").alias("e2"), F.col("label").alias("l2")
    )
    return (
        a.join(b, (F.col("label") == F.col("l2")) & (F.col("v1") < F.col("v2")))
        .select("v1", "v2", _cos(F.col("e1"), F.col("e2")).alias("cos"))
        .where(F.col("cos") >= COS_MIN)
    )


EMBED_PAIRS_SQL = f"""
SELECT q.vec_id AS v1, c.vec_id AS v2, {_COS_SQL} AS cos
FROM embeddings q JOIN embeddings c
  ON c.label = q.label AND q.vec_id < c.vec_id
WHERE {_COS_SQL} >= {COS_MIN}
"""
