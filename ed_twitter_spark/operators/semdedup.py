"""Semantic deduplication (SemDeDup) over the embedding corpus.

Implements the cluster-then-compare semantic dedup of Abbas et al. 2023
("SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", §3): embed the corpus, k-means it into K clusters,
compare pairs ONLY within a cluster, and inside every duplicate group
keep the example with the LOWEST cosine similarity to its cluster
centroid (the paper's best-performing keep rule — the most atypical
member survives, the redundant near-centroid copies go).

This completes the dedup ladder's semantic rung: ``dedup_embed_neardup``
finds high-cosine pairs via signed-random-projection LSH (recall decays
below c ≈ 0.9 by design), while SemDeDup targets the *moderate*-cosine
semantic duplicates LSH banding deliberately trades away — the k-means
cells give every vector a deterministic comparison scope at any
threshold. Both reuse the corpus infrastructure this engine already
certifies: the coarse quantizer is the SAME in-engine Lloyd k-means the
IVF index trains (one index build serves ANN search, cell stats, and
semantic dedup), and hot cells are sub-split with the same CELL_CAP
block scheme as ``embed_cosine_pairs`` so no join key degenerates toward
|cell|².

Deterministic keep rule (the paper samples a random survivor;
``dedup_clusters``-style determinism is what makes the DuckDB oracle
exact): a vector v is REMOVED iff some same-cell u has
``cos(u, v) ≥ SEMDEDUP_COS`` and (``c_sim(u) < c_sim(v)`` or equal
``c_sim`` with ``u.vec_id < v.vec_id``), where ``c_sim`` is the rounded
cosine to the shared cell centroid. One EXISTS semi-join — no iterative
group resolution — and exactly one survivor per totally-ordered
duplicate clique (the (c_sim, vec_id) minimum); chains that thresholded
pairwise similarity leaves open (a~b, b~c, a≁c) keep their local minima,
matching the paper's per-pair formulation rather than a transitive
closure (the closure variant is ``dedup_clusters``).

Scale shape at 10^12 vectors: the quantizer is a K-row broadcast
(K = √n via ``ivf_k`` in production; the pinned fixture K here keeps the
oracle stable); assignment is a broadcast cross-join + per-vector top-1;
the pair scan is Σ_blocks ≤ CELL_CAP² independent block tasks under a
forced shuffle-hash join (Catalyst's pre-explode size estimate would
broadcast-build the inflated side); the verdict join is one hash
semi-join on vec_id. No stage is quadratic in the corpus.

Reference parity: the reference repo has no corpus-selection stage at
all (its corpus is fixed exports, run_all.sh S1–S11) — this is part of
the beyond-reference LLM-training-data surface (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ed_twitter_spark.operators.similarity import (
    CELL_CAP,
    EMB_DIMS,
    _KMEANS_BODY,
    _KMEANS_FINAL,
    _SQD_SQL,
    _assign,
    _centroids_for,
    _cos,
    _emb_double,
)

# The paper dedups at ε ≈ 0.95 cosine on real model embeddings; the
# synthetic fixture embeddings are near-orthogonal draws (within-cell
# p50 ≈ 0.06, p99 ≈ 0.34, max ≈ 0.51 at sf0.01), so the fixture
# threshold sits at the p99 knee — the same value embed_cosine_pairs'
# COS_MIN pins for the same reason — to exercise a non-trivial removal
# set. A production corpus raises it back toward the paper's ε.
SEMDEDUP_COS = 0.35


def semantic_verdicts(
    spark: SparkSession, sf_dir: str, cell_cap: int = CELL_CAP
) -> DataFrame:
    """(vec_id, cid, c_sim, removed) — the full per-vector SemDeDup
    verdict table: cell assignment, centroid cosine, and whether a
    same-cell witness with cos ≥ SEMDEDUP_COS and a strictly smaller
    (c_sim, vec_id) key marks this vector redundant."""
    emb = _emb_double(spark, sf_dir)
    cents = _centroids_for(spark, sf_dir)
    asg = (
        _assign(emb, cents)
        .join(F.broadcast(cents), "cid")
        .select(
            "vec_id", "cid", "v", _cos(F.col("v"), F.col("cvec")).alias("c_sim")
        )
    )

    # CELL_CAP sub-split (same block partition of the within-cell pair set
    # as embed_cosine_pairs, keyed by the k-means cell): a cell of size m
    # fans out over g·(g+1)/2 block keys of ≤ ~cap² pairs each.
    sizes = asg.groupBy("cid").agg(
        F.ceil(F.count(F.lit(1)) / F.lit(float(cell_cap))).cast("int").alias("g")
    )
    grouped = asg.join(F.broadcast(sizes), "cid").select(
        "cid",
        "vec_id",
        "v",
        "c_sim",
        "g",
        F.pmod(F.crc32(F.col("vec_id").cast("string")), F.col("g"))
        .cast("int")
        .alias("grp"),
    )
    # pre-spread before the block explode so parquet split count does not
    # bound the fan-out parallelism (the sf1 skew-stress lesson).
    grouped = grouped.repartition(
        emb.sparkSession.sparkContext.defaultParallelism, "vec_id"
    )
    a = grouped.select(
        "cid",
        F.col("vec_id").alias("v1"),
        F.col("v").alias("e1"),
        F.col("c_sim").alias("c1"),
        F.col("grp").alias("bi"),
        F.explode(F.sequence(F.col("grp"), F.col("g") - 1)).alias("bj"),
    )
    b = grouped.select(
        F.col("cid").alias("cid2"),
        F.col("vec_id").alias("v2"),
        F.col("v").alias("e2"),
        F.col("c_sim").alias("c2"),
        F.explode(F.sequence(F.lit(0), F.col("grp"))).alias("bi2"),
        F.col("grp").alias("bj2"),
    )
    pairs = (
        a.hint("shuffle_hash")
        .join(
            b,
            (F.col("cid") == F.col("cid2"))
            & (F.col("bi") == F.col("bi2"))
            & (F.col("bj") == F.col("bj2"))
            & ((F.col("bi") < F.col("bj")) | (F.col("v1") < F.col("v2"))),
        )
        .where(_cos(F.col("e1"), F.col("e2")) >= SEMDEDUP_COS)
    )
    # each unordered pair appears once; its loser is the (c_sim, vec_id)
    # maximum — the member more typical of the cell (paper keep rule).
    removed = pairs.select(
        F.when(
            (F.col("c1") > F.col("c2"))
            | ((F.col("c1") == F.col("c2")) & (F.col("v1") > F.col("v2"))),
            F.col("v1"),
        )
        .otherwise(F.col("v2"))
        .alias("vec_id")
    ).distinct()
    return asg.join(
        removed.withColumn("_rm", F.lit(True)), "vec_id", "left"
    ).select(
        "vec_id",
        "cid",
        "c_sim",
        F.coalesce("_rm", F.lit(False)).alias("removed"),
    )


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: the verdict table, one row per corpus vector."""
    return semantic_verdicts(spark, sf_dir)


def _vcos_sql(x: str, y: str) -> str:
    """Rounded cosine between two DOUBLE-list columns (index fold in the
    same 1..EMB_DIMS order as the Spark zip_with)."""
    rng = f"UNNEST(range(1, {EMB_DIMS + 1})) AS t(k)"
    return (
        f"ROUND((SELECT SUM({x}[k] * {y}[k]) FROM {rng})"
        f" / (sqrt((SELECT SUM({x}[k] * {x}[k]) FROM {rng}))"
        f" * sqrt((SELECT SUM({y}[k] * {y}[k]) FROM {rng}))), 4)"
    )


DEDUP_SEMANTIC_SQL = f"""
WITH {_KMEANS_BODY},
assigned AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {_SQD_SQL}, c.cid) AS nn
    FROM emb e CROSS JOIN {_KMEANS_FINAL} c
  ) WHERE nn = 1
),
csim AS (
  SELECT a.vec_id, a.cid, a.v, {_vcos_sql('a.v', 'c.cvec')} AS c_sim
  FROM assigned a JOIN {_KMEANS_FINAL} c USING (cid)
),
pairs AS (
  SELECT x.vec_id AS v1, x.c_sim AS c1, y.vec_id AS v2, y.c_sim AS c2
  FROM csim x JOIN csim y
    ON x.cid = y.cid AND x.vec_id < y.vec_id
  WHERE {_vcos_sql('x.v', 'y.v')} >= {SEMDEDUP_COS}
),
removed AS (
  SELECT DISTINCT CASE
    WHEN c1 > c2 OR (c1 = c2 AND v1 > v2) THEN v1 ELSE v2
  END AS vec_id
  FROM pairs
)
SELECT c.vec_id, c.cid, c.c_sim, (r.vec_id IS NOT NULL) AS removed
FROM csim c LEFT JOIN removed r USING (vec_id)
"""
