"""Principal-component extraction over the embedding store — the
classical preprocessing step for embedding indexes (mean-centering +
dominant-direction removal a la Arora et al. 2017 "A Simple but
Tough-to-Beat Baseline", and the rotation input for OPQ-style
quantizers) — as integer-exact distributed covariance + an unrolled
power iteration.

Cross-engine exactness strategy, in two layers:

1. **The covariance moments are integers.** Each float32 component is
   quantized once as ``floor(e * 1024 + 0.5)`` (both engines promote
   float32 -> float64 exactly, so the BIGINT is identical), and the
   three moment families — the Gram matrix Σ q_i·q_j, the column sums
   Σ q_i, and the row count — are BIGINT sums: exact and order-free in
   any engine, any partitioning. The covariance
   ``C(i,j) = (sxy − sx·sy/n) / n`` is then the same double computed
   from the same integers by the same expression on both sides.

2. **The power iteration is fixed-count** (PCA_ITERS steps from the
   all-ones vector), max-|component| normalized each step — dividing by
   the SIGNED value of the largest-|.| component (ties -> lowest dim)
   both conditions the iteration and fixes the eigenvector's sign
   convention. The per-step matvec is a 64-term double sum per row
   (same shape as kg_eigencentrality's gated iteration); outputs are
   ROUND(,6)-pinned.

Plan shape at 10^12 vectors: ONE scan of the embedding table. The Gram
partials come from ``mapInPandas`` — each Arrow batch contributes one
int64 ``M.T @ M`` (a D² packet) plus column sums and a count, emitted as
(i, j, val) rows with sentinel keys (j = −1 for column sums, i = −1 for
the count), and a map-side-combined SUM merges the packets: constant
D²-sized state per task regardless of corpus size, the same
commutative-packet trick as the CMS/HLL sketches. Everything after the
scan is O(D²) — driver-free, shuffle is D² rows. The D×D eigensolve
stays distributed only because the oracle needs the dataflow pinned; at
production scale the 4096-row covariance is the classic
collect-to-driver/LAPACK boundary.

The reference has no PCA (its embeddings are fixture inputs); this is
corpus infrastructure the 100-TB pipeline needs before ANN indexing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ed_twitter_spark.caching import persist_tracked

Q_SCALE = 1024  # quantization step: floor(e * Q + 0.5)
# fixed-count so the oracle can unroll it; 24 steps is the convergence
# budget, not a convergence guarantee — the isotropic synthetic fixture is
# power iteration's adversarial floor (tiny eigengap, same caveat as the
# IVF recall fixtures), where 24 steps land within ~5% of λ_max; a real
# embedding corpus with anisotropic structure converges far faster
PCA_ITERS = 24

_PARTIAL_SCHEMA = "i INT, j INT, val LONG"


def _moment_packets(emb: DataFrame) -> DataFrame:
    """Per-batch integer moment packets: (i, j>=0, Σ q_i·q_j),
    (i, -1, Σ q_i), (-1, -1, n). groupBy(i, j).sum() merges them."""

    def gen(batches):
        import numpy as np

        S = None
        s = None
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.floor(
                np.stack(pdf["embedding"].to_numpy()).astype("float64") * Q_SCALE
                + 0.5
            ).astype("int64")
            g = M.T @ M  # int64-exact
            S = g if S is None else S + g
            cs = M.sum(axis=0)
            s = cs if s is None else s + cs
            n += M.shape[0]
        if n == 0:
            return
        import numpy as np

        d = S.shape[0]
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        yield pd.DataFrame(
            {
                "i": np.concatenate([ii.ravel(), np.arange(d), [-1]]),
                "j": np.concatenate([jj.ravel(), np.full(d, -1), [-1]]),
                "val": np.concatenate([S.ravel(), s, [n]]),
            }
        ).astype({"i": "int32", "j": "int32", "val": "int64"})

    return emb.select("embedding").mapInPandas(gen, schema=_PARTIAL_SCHEMA)


def _moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merged integer moment packets, persisted (ONE corpus scan)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return persist_tracked(
        _moment_packets(emb).groupBy("i", "j").agg(F.sum("val").alias("val"))
    )


def _covariance(packets: DataFrame) -> DataFrame:
    """(i, j, c) — population covariance as identical doubles on both
    engines (see module docstring)."""
    gram = packets.where((F.col("i") >= 0) & (F.col("j") >= 0)).select(
        "i", "j", F.col("val").alias("sxy")
    )
    sums = packets.where((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("si"), F.col("val").alias("sx")
    )
    n = packets.where(F.col("i") == -1).select(F.col("val").alias("n"))
    c = (
        gram.join(sums.withColumnRenamed("si", "i").withColumnRenamed("sx", "sx_i"), "i")
        .join(
            sums.withColumnRenamed("si", "j").withColumnRenamed("sx", "sx_j"), "j"
        )
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            (
                (
                    F.col("sxy").cast("double")
                    - F.col("sx_i").cast("double")
                    * F.col("sx_j").cast("double")
                    / F.col("n").cast("double")
                )
                / F.col("n").cast("double")
            ).alias("c"),
        )
    )
    return persist_tracked(c)


def _power_iterate(cov: DataFrame) -> tuple[DataFrame, DataFrame]:
    """PCA_ITERS max-normalized power-iteration steps; returns the final
    (unrounded) direction (v, x) and the 1-row (wstar,) eigenvalue frame."""
    x = cov.select(F.col("i").alias("v")).distinct().select(
        "v", F.lit(1.0).alias("x")
    )
    wstar = None
    for _ in range(PCA_ITERS):
        w = (
            cov.join(x.withColumnRenamed("v", "j"), "j")
            .groupBy(F.col("i").alias("v"))
            .agg(F.sum(F.col("c") * F.col("x")).alias("w"))
            # each step reads w twice (argmax + normalize): cut the plan
            # per round like the Lloyd/PQ/BPE loops, or it doubles per step
            .localCheckpoint()  # D doubles
        )
        wstar = w.orderBy(F.abs(F.col("w")).desc(), "v").limit(1).select(
            F.col("w").alias("wstar")
        )
        x = w.crossJoin(F.broadcast(wstar)).select(
            "v", (F.col("w") / F.col("wstar")).alias("x")
        )
    return x, wstar


def embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dim, loading, eigval) — the dominant principal direction of the
    (quantized) embedding distribution: loadings normalized so the
    largest-|.| component is exactly 1.0, eigval = that component's
    pre-normalization matvec value at the final step (the dominant
    eigenvalue under max-norm convergence)."""
    x, wstar = _power_iterate(_covariance(_moments(spark, sf_dir)))
    return x.crossJoin(F.broadcast(wstar)).select(
        F.col("v").alias("dim"),
        F.round("x", 6).alias("loading"),
        F.round("wstar", 6).alias("eigval"),
    )


def embed_pca_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, score) — every embedding projected onto the learned
    principal direction, mean-centered, back in embedding units
    (score = Σ_i (q_i − μ_i)·x_i / Q_SCALE). This is the consumer side
    of the PCA build: 1-D codes for dominant-direction removal (Arora
    et al. 2017) or coarse range partitioning of an ANN index.

    Plan: the direction (D rows) and the per-dim means (D rows) broadcast
    onto ONE posexplode of the embedding table — a single scan with a
    vec_id-keyed map-side-combined sum; no shuffle grows with D."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "e")
    ).select(
        "vec_id",
        "i",
        F.floor(F.col("e").cast("double") * Q_SCALE + 0.5).cast("long").alias("qv"),
    )
    packets = _moments(spark, sf_dir)
    x, _ = _power_iterate(_covariance(packets))
    sums = packets.where((F.col("i") >= 0) & (F.col("j") == -1)).select(
        "i", F.col("val").alias("sx")
    )
    n = packets.where(F.col("i") == -1).select(F.col("val").alias("n"))
    means = sums.crossJoin(F.broadcast(n))
    term = (
        F.col("qv") - F.col("sx") * F.lit(1.0) / F.col("n")
    ) * F.col("x")
    return (
        q.join(F.broadcast(means), "i")
        .join(F.broadcast(x.withColumnRenamed("v", "i")), "i")
        .groupBy("vec_id")
        .agg(F.round(F.sum(term) / F.lit(Q_SCALE), 6).alias("score"))
    )


def _pca_sql_ctes(iters: int) -> str:
    its = []
    prev = "x0"
    for k in range(1, iters + 1):
        its.append(
            f"""w{k} AS MATERIALIZED (
  SELECT c.i AS v, SUM(c.c * p.x) AS w
  FROM cov c JOIN {prev} p ON p.v = c.j GROUP BY c.i
),
s{k} AS MATERIALIZED (
  SELECT w AS wstar FROM w{k} ORDER BY abs(w) DESC, v LIMIT 1
),
x{k} AS MATERIALIZED (
  SELECT v, w / (SELECT wstar FROM s{k}) AS x FROM w{k}
)"""
        )
        prev = f"x{k}"
    chain = ",\n".join(its)
    return f"""q AS MATERIALIZED (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS i,
         CAST(floor(unnest(embedding) * {Q_SCALE} + 0.5) AS BIGINT) AS qv
  FROM embeddings
),
stats AS MATERIALIZED (
  SELECT i, CAST(SUM(qv) AS BIGINT) AS sx, CAST(COUNT(*) AS BIGINT) AS n
  FROM q GROUP BY i
),
gram AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, CAST(SUM(a.qv * b.qv) AS BIGINT) AS sxy
  FROM q a JOIN q b USING (vec_id) GROUP BY a.i, b.i
),
cov AS MATERIALIZED (
  SELECT g.i, g.j,
         (CAST(g.sxy AS DOUBLE)
          - CAST(si.sx AS DOUBLE) * CAST(sj.sx AS DOUBLE) / CAST(si.n AS DOUBLE))
         / CAST(si.n AS DOUBLE) AS c
  FROM gram g JOIN stats si ON si.i = g.i JOIN stats sj ON sj.i = g.j
),
x0 AS MATERIALIZED (SELECT DISTINCT i AS v, 1.0 AS x FROM cov),
{chain}"""


def embed_pca_oracle_sql(iters: int = PCA_ITERS) -> str:
    return f"""WITH {_pca_sql_ctes(iters)}
SELECT v AS dim, ROUND(x, 6) AS loading,
       ROUND((SELECT wstar FROM s{iters}), 6) AS eigval
FROM x{iters}
"""


def embed_pca_scores_oracle_sql(iters: int = PCA_ITERS) -> str:
    return f"""WITH {_pca_sql_ctes(iters)}
SELECT q.vec_id,
       ROUND(SUM((q.qv - s.sx * 1.0 / s.n) * p.x) / {Q_SCALE}, 6) AS score
FROM q
JOIN stats s ON s.i = q.i
JOIN x{iters} p ON p.v = q.i
GROUP BY q.vec_id
"""
