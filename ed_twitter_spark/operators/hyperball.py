"""HyperBall: the KG's neighborhood function via per-vertex HLL counters.

Boldi & Vigna 2013 ("In-Core Computation of Geometric Centralities with
HyperBall"): estimate |B(v, t)| — the number of vertices within distance
t of v — for every v simultaneously, by giving each vertex a HyperLogLog
counter and iterating "my ball at t = union of my neighbours' balls at
t−1 (plus mine)". Union of HLL sketches is register-wise max, so each
iteration is ONE edge join + ONE (vertex, register) max-aggregation —
constant state per vertex (HLL_M = 256 registers), no frontier sets, no
visited tables. This is how web-scale engines compute effective
diameter / average distance on 10¹¹-edge graphs: the exact alternative
(`kg_bfs_hops`-style per-source BFS from every vertex) is O(n·m).

The sketch primitives are shared with the corpus HLL
(`operators/sketches.py`): register = first 8 md5 bits of the vertex id,
rank = 33 − bitlength of the next 32 bits, estimate = the raw harmonic
mean α·m²/Σ2^(−M_j). Every term is dyadic, so per-vertex estimates are
EXACT double algebra cross-engine; only the final sum over vertices is
rounded (4 dp).

Gate query ``kg_hyperball``: (t, nf) for t = 0..HB_ITERS, where
nf(t) = Σ_v estimate|B(v, t)| — the neighborhood function whose growth
curve gives the effective diameter. The DuckDB twin unrolls the
register recurrence per level, so the gate pins the register-wise max
propagation itself, not just the endpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ed_twitter_spark.operators.sketches import _HLL_ALPHA_M2, HLL_M, hll_register_cols

HB_ITERS = 3  # ball radius bound, matching BFS_MAX_HOPS


def _nf_row(regs: DataFrame, t: int) -> DataFrame:
    """Σ_v raw-HLL estimate of v's current ball, as one (t, nf) row."""
    per_v = regs.groupBy("v").agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("s_present"),
    )
    return per_v.agg(
        F.round(
            F.sum(
                F.lit(float(_HLL_ALPHA_M2))
                / (F.col("s_present") + (F.lit(HLL_M) - F.col("present")))
            ),
            4,
        ).alias("nf")
    ).select(F.lit(t).alias("t"), "nf")


def hyperball_nf(edges: DataFrame, iters: int = HB_ITERS) -> DataFrame:
    """(t, nf) for t = 0..iters over the entity co-occurrence graph.

    regs(0) = each vertex's own (register, rank); regs(t) =
    (regs(t−1) ∪ neighbour-propagated regs(t−1)) max-merged per
    (vertex, register). The register table is localCheckpoint-ed per
    level — at cluster scale it would persist hash-partitioned by
    vertex and the edge join would reuse that partitioning every level
    (the table never exceeds n·256 rows regardless of graph density).
    """
    from ed_twitter_spark.caching import persist_tracked
    from ed_twitter_spark.operators.graph import cooccurrence_edges

    e = persist_tracked(cooccurrence_edges(edges))
    nodes = e.select(F.col("src").alias("v")).distinct()
    register, rank = hll_register_cols(F.col("v"))
    regs = nodes.select("v", register.alias("register"), rank.alias("m")).localCheckpoint()

    rows = [_nf_row(regs, 0)]
    for t in range(1, iters + 1):
        prop = (
            e.join(regs.withColumnRenamed("v", "src"), on="src")
            .select(F.col("dst").alias("v"), "register", "m")
        )
        regs = (
            regs.unionByName(prop)
            .groupBy("v", "register")
            .agg(F.max("m").alias("m"))
            .localCheckpoint()
        )
        rows.append(_nf_row(regs, t))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.select(F.col("t").cast("int").alias("t"), "nf")


def kg_hyperball(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ed_twitter_spark.operators.graph import q_kg_edges

    return hyperball_nf(q_kg_edges(spark, sf_dir))


def kg_hyperball_oracle_sql(iters: int = HB_ITERS) -> str:
    from ed_twitter_spark.operators.graph import _COEDGES_SQL, _kg_edges_named_sql

    blocks = [
        """
regs0 AS MATERIALIZED (
  SELECT v,
         CAST(('0x' || substr(md5(v), 1, 2)) AS INT) AS register,
         CASE WHEN CAST(('0x' || substr(md5(v), 3, 8)) AS BIGINT) = 0 THEN 33
              ELSE 33 - length(bin(CAST(('0x' || substr(md5(v), 3, 8)) AS BIGINT)))
         END AS m
  FROM (SELECT DISTINCT src AS v FROM coedges)
)"""
    ]
    for t in range(1, iters + 1):
        blocks.append(
            f"""
regs{t} AS MATERIALIZED (
  SELECT v, register, MAX(m) AS m FROM (
    SELECT v, register, m FROM regs{t - 1}
    UNION ALL
    SELECT e.dst AS v, r.register, r.m
    FROM coedges e JOIN regs{t - 1} r ON r.v = e.src
  ) GROUP BY v, register
)"""
        )
    nf = " UNION ALL ".join(
        f"""SELECT {t} AS t, ROUND(SUM({_HLL_ALPHA_M2} / (s_present + ({HLL_M} - present))), 4) AS nf
FROM (SELECT v, COUNT(*) AS present, SUM(power(2.0, -m)) AS s_present
      FROM regs{t} GROUP BY v)"""
        for t in range(0, iters + 1)
    )
    return (
        _kg_edges_named_sql()
        + ",\n"
        + _COEDGES_SQL.lstrip()
        + ","
        + ",".join(blocks)
        + f"\nSELECT CAST(t AS INTEGER) AS t, nf FROM ({nf}) curve\n"
    )


EFF_DIAMETER_FRACTION = 0.9


def kg_effective_diameter(nf: DataFrame, fraction: float = EFF_DIAMETER_FRACTION) -> DataFrame:
    """One-row (nf_max, threshold, eff_diameter): the ANF/HyperANF
    effective diameter — the (linearly interpolated) smallest t at which
    the neighborhood function reaches ``fraction`` of its plateau (Palmer
    et al. 2002; Boldi & Vigna 2013 §5). THE one-number answer to "how many
    hops apart is this KG", and the classic consumer of the HyperBall
    curve. Input is the (t, nf) frame from :func:`hyperball_nf` — 4 rows,
    so the unpartitioned window is a non-issue; both engines interpolate
    the identical register-exact curve, so the output is value-exact."""
    from pyspark.sql import Window

    w = Window.orderBy("t")
    m = nf.agg(F.max("nf").alias("nf_max"))
    j = nf.withColumn("prev_nf", F.lag("nf").over(w)).crossJoin(m)
    first = (
        j.where(F.col("nf") >= F.lit(fraction) * F.col("nf_max"))
        .orderBy("t")
        .limit(1)
    )
    thr = F.lit(fraction) * F.col("nf_max")
    return first.select(
        "nf_max",
        F.round(thr, 4).alias("threshold"),
        F.round(
            F.when(F.col("t") == 0, F.lit(0.0)).otherwise(
                F.col("t")
                - 1
                + (thr - F.col("prev_nf")) / (F.col("nf") - F.col("prev_nf"))
            ),
            4,
        ).alias("eff_diameter"),
    )


def q_kg_effective_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kg_effective_diameter(kg_hyperball(spark, sf_dir))


def kg_effective_diameter_oracle_sql(
    iters: int = HB_ITERS, fraction: float = EFF_DIAMETER_FRACTION
) -> str:
    return f"""
WITH nfq AS ({kg_hyperball_oracle_sql(iters)}),
mx AS (SELECT MAX(nf) AS nf_max FROM nfq),
lagged AS (SELECT t, nf, LAG(nf) OVER (ORDER BY t) AS prev_nf FROM nfq),
hit AS (
  SELECT lagged.*, mx.nf_max FROM lagged, mx
  WHERE nf >= {fraction} * mx.nf_max
  ORDER BY t LIMIT 1
)
SELECT nf_max,
       ROUND({fraction} * nf_max, 4) AS threshold,
       ROUND(CASE WHEN t = 0 THEN 0.0
                  ELSE t - 1 + ({fraction} * nf_max - prev_nf) / (nf - prev_nf)
             END, 4) AS eff_diameter
FROM hit
"""
