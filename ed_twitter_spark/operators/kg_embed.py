"""TransE knowledge-graph embedding training over the constructed KG.

The reference trains *word/entity text* embeddings (`deep-ed-pytorch/
entities/learn_e2v/learn_a.py`) but has no graph-structure embedding; a
KG-construction engine that materializes typed entity-entity relations
owes its users the standard next step — train (h, r, t) translation
embeddings over those edges (Bordes et al. 2013, TransE) so downstream
link prediction / clustering can consume the graph geometrically. This
module is that trainer, built deterministic and oracle-twinned like the
rest of the training family (`operators/training.py`).

Training data: the typed co-mention relation. From the typed edge set
(`kg_typed_edges`), each conversation contributes (e1, ch1~ch2, e2) for
every entity pair e1 < e2 it mentions, where ch* is the acquisition
channel (user / assistant / search) — a multi-relational entity graph
with |channels|² relation types.

Spark-first design decisions, chosen for the 100-TB shape:

- **Long format, not arrays.** Vectors live as (ent, d, val) rows.
  Every TransE step is then pure relational algebra — equi-joins on
  (entity, dim) and map-side-combinable aggregations — which both
  Catalyst and the DuckDB oracle twin execute natively. Array kernels
  would need a Python stage; long format keeps the whole epoch inside
  whole-stage codegen, and a 10⁹-entity × 64-dim table is just a bigger
  shuffle, not a new algorithm.
- **L1 distance → integer-exact gradients.** With d(h,r,t) = Σ|h+r-t|,
  per-dim gradients are sign() values, so per-(entity, dim) gradient
  sums are small-integer sums — EXACT across engines, no float-order
  nondeterminism in the update direction. The only cross-engine float
  risk left is the unordered 8-term distance / norm sums, handled by
  the repo's rounding discipline (distances 6 dp, stored vals 4 dp).
- **Deterministic everything**: init = md5-hash uniform (same
  `md5[:6] → int` trick as `training._wvid`), negatives = md5-hash
  index into a densely-enumerated entity table (fresh salt per step,
  mirroring per-epoch resampling), margin γ = 1, lr = 0.01, entities
  re-normalized to the unit L2 ball after every step (the TransE
  constraint), relations normalized at init only — all per the
  original algorithm.
- **Dense entity index without a global window**: the two-phase
  bucket/offset enumeration from `packing.dataset_interleave` (16
  md5 buckets, per-bucket ranks, 16 offsets to the driver). The DuckDB
  twin is a plain ROW_NUMBER ORDER BY (md5(ent), ent) — identical
  total order, since bucket-as-int sorts the same as md5's first hex
  char.

Gate queries: ``kg_embed_transe`` (per-step n_active + summed hinge
loss — the training curve) and ``kg_embed_transe_vectors`` (the final
entity vectors, component-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TRANSE_DIM = 8  # embedding width for the gate fixture (k in the paper)
TRANSE_STEPS = 2  # unrolled full-batch steps (reference epochs, bounded for the oracle)
TRANSE_LR = 0.01
TRANSE_MARGIN = 1.0
_IDX_BUCKETS = 16


def _hex6(col) -> F.Column:
    """First 6 md5 hex chars as a bigint (training._wvid's hash)."""
    return F.conv(F.substring(F.md5(col), 1, 6), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# training triples
# ---------------------------------------------------------------------------


def transe_edges(typed_edges: DataFrame) -> DataFrame:
    """(h, r, t) DISTINCT — the typed co-mention multigraph.

    One distinct on (conv, entity, channel) collapses mention-level
    duplicates BEFORE the per-conversation pair join, so the join fans
    out over distinct entities per conversation, not raw mentions —
    the same bounded-cell shape as the co-mention CONSTRUCT query.
    """
    cm = (
        typed_edges.where(F.col("obj_vertex").isNotNull())
        .select(
            "conv_id",
            F.col("obj_vertex").alias("e"),
            F.regexp_replace("pred", "mentioned_(by|in)_", "").alias("ch"),
        )
        .distinct()
    )
    a, b = cm.alias("a"), cm.alias("b")
    return (
        a.join(
            b,
            (F.col("b.conv_id") == F.col("a.conv_id"))
            & (F.col("a.e") < F.col("b.e")),
        )
        .select(
            F.col("a.e").alias("h"),
            F.concat(F.col("a.ch"), F.lit("~"), F.col("b.ch")).alias("r"),
            F.col("b.e").alias("t"),
        )
        .distinct()
    )


def _ent_index(ents: DataFrame) -> DataFrame:
    """(ent, idx) — dense 0-based enumeration in (md5(ent), ent) order via
    the two-phase bucket/offset scheme (no single-partition window)."""
    b = ents.select(
        "ent",
        F.md5("ent").alias("okey"),
    ).withColumn(
        "bucket", F.conv(F.substring("okey", 1, 1), 16, 10).cast("int")
    )
    w = Window.partitionBy("bucket").orderBy("okey", "ent")
    b = b.withColumn("rn", F.row_number().over(w) - 1)
    counts = {
        r["bucket"]: r["n"]
        for r in b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for bucket in range(_IDX_BUCKETS):
        offsets[bucket] = acc
        acc += counts.get(bucket, 0)
    off = F.create_map(
        *[x for bucket, o in sorted(offsets.items()) for x in (F.lit(bucket), F.lit(o))]
    )
    return b.select(
        "ent", (off[F.col("bucket")] + F.col("rn")).cast("long").alias("idx")
    )


# ---------------------------------------------------------------------------
# vectors
# ---------------------------------------------------------------------------


def _init_vecs(spark: SparkSession, keys: DataFrame, keycol: str, salt: str) -> DataFrame:
    """(key, d, val) hash-uniform init in [-0.5, 0.5), 4 dp by construction:
    val = (md5(key#salt d) % 10000)/10000 - 0.5."""
    dims = spark.range(TRANSE_DIM).select(F.col("id").cast("int").alias("d"))
    return keys.crossJoin(F.broadcast(dims)).select(
        keycol,
        "d",
        (
            (_hex6(F.concat(F.col(keycol), F.lit(salt), F.col("d"))) % 10000)
            / 10000.0
            - 0.5
        ).alias("val"),
    )


def _l2_normalize(vec: DataFrame, keycol: str) -> DataFrame:
    """Project each vector to the unit L2 ball, 4-dp stored components.
    The squared norm (an unordered 8-term float sum) is rounded to 12 dp
    before the sqrt so both engines divide by the same scalar."""
    nrm = vec.groupBy(keycol).agg(
        F.sqrt(F.greatest(F.round(F.sum(F.col("val") * F.col("val")), 12), F.lit(1e-12))).alias(
            "nn"
        )
    )
    return vec.join(nrm, on=keycol).select(
        keycol, "d", F.round(F.col("val") / F.col("nn"), 4).alias("val")
    )


# ---------------------------------------------------------------------------
# the training loop
# ---------------------------------------------------------------------------


def run_transe(
    spark: SparkSession, sf_dir: str, steps: int = TRANSE_STEPS
) -> tuple[DataFrame, DataFrame]:
    """Run ``steps`` full-batch TransE steps; return
    (curve, final_ev, final_rv, edges).

    curve: (step, n_active, loss) per step — n_active = triples with a
    violated margin, loss = Σ active hinge values (4 dp).
    final_ev: (ent, d, val) after the last update + re-normalization.

    Per step: ONE join stack (edges ⋈ 4 vector slices on dim), one
    6-dp-rounded distance aggregate per triple, integer sign-gradient
    aggregates per (entity, dim) / (relation, dim), the lr-scaled
    update, and the unit-ball projection. Every aggregate is keyed and
    map-side combinable. Lineage control: the edge table and each
    step's vector tables are eagerly localCheckpoint-ed — the iterate
    frames reference the upstream KG-pipeline plan at several leaves
    per step, so without truncation Catalyst re-analyzes an
    exponentially growing plan each action (the cluster equivalent:
    each epoch's vectors land in an Iceberg stage table, exactly like
    `training.run_train_epochs`).
    """
    from ed_twitter_spark.caching import persist_tracked
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators import graph as graph_ops

    typed = graph_ops.kg_typed_edges(
        graph_ops.q_kg_edges(spark, sf_dir), synth.transcripts(spark, sf_dir)
    )
    edges = transe_edges(typed).localCheckpoint()
    ents = (
        edges.select(F.col("h").alias("ent"))
        .unionByName(edges.select(F.col("t").alias("ent")))
        .distinct()
    )
    eidx = _ent_index(ents).localCheckpoint()
    n_ent = eidx.count()
    rels = edges.select("r").distinct()

    ev = _l2_normalize(
        _init_vecs(spark, eidx.select("ent"), "ent", "#e"), "ent"
    ).localCheckpoint()
    rv = _l2_normalize(_init_vecs(spark, rels, "r", "#r"), "r").localCheckpoint()

    curve_rows: list[DataFrame] = []
    for k in range(1, steps + 1):
        tneg = edges.withColumn(
            "nidx",
            _hex6(
                F.concat(
                    F.col("h"), F.lit("|"), F.col("r"), F.lit("|"), F.col("t"),
                    F.lit(f"#neg{k}"),
                )
            )
            % n_ent,
        ).join(
            eidx.select(F.col("ent").alias("tneg"), F.col("idx").alias("nidx")),
            on="nidx",
        ).select("h", "r", "t", "tneg")

        diff = (
            tneg.join(
                ev.select(F.col("ent").alias("h"), "d", F.col("val").alias("hv")),
                on="h",
            )
            .join(
                ev.select(F.col("ent").alias("t"), "d", F.col("val").alias("tv")),
                on=["t", "d"],
            )
            .join(
                ev.select(
                    F.col("ent").alias("tneg"), "d", F.col("val").alias("nv")
                ),
                on=["tneg", "d"],
            )
            .join(rv.select("r", "d", F.col("val").alias("rvv")), on=["r", "d"])
            .select(
                "h",
                "r",
                "t",
                "tneg",
                "d",
                F.signum(F.col("hv") + F.col("rvv") - F.col("tv")).alias("sp"),
                F.signum(F.col("hv") + F.col("rvv") - F.col("nv")).alias("sn"),
                F.abs(F.col("hv") + F.col("rvv") - F.col("tv")).alias("ap"),
                F.abs(F.col("hv") + F.col("rvv") - F.col("nv")).alias("an"),
            )
        )
        diff = persist_tracked(diff)  # read by dist and the gradient union

        dist = diff.groupBy("h", "r", "t", "tneg").agg(
            F.round(F.sum("ap"), 6).alias("dp"),
            F.round(F.sum("an"), 6).alias("dn"),
        )
        act = dist.where(
            F.lit(TRANSE_MARGIN) + F.col("dp") - F.col("dn") > 0
        ).localCheckpoint()
        curve_rows.append(
            act.agg(
                F.count(F.lit(1)).cast("long").alias("n_active"),
                F.round(
                    F.sum(F.lit(TRANSE_MARGIN) + F.col("dp") - F.col("dn")), 4
                ).alias("loss"),
            ).select(F.lit(k).alias("step"), "n_active", "loss")
        )

        adiff = diff.join(
            act.select("h", "r", "t", "tneg"), on=["h", "r", "t", "tneg"]
        )
        # sign gradients: h gets (sp - sn), t gets -sp, t' gets +sn —
        # integer contributions, summed exactly.
        g_ent = (
            adiff.select(F.col("h").alias("ent"), "d", (F.col("sp") - F.col("sn")).alias("g"))
            .unionByName(
                adiff.select(F.col("t").alias("ent"), "d", (-F.col("sp")).alias("g"))
            )
            .unionByName(
                adiff.select(F.col("tneg").alias("ent"), "d", F.col("sn").alias("g"))
            )
            .groupBy("ent", "d")
            .agg(F.sum("g").alias("g"))
        )
        g_rel = adiff.groupBy("r", "d").agg(F.sum(F.col("sp") - F.col("sn")).alias("g"))

        ev = _l2_normalize(
            ev.join(g_ent, on=["ent", "d"], how="left").select(
                "ent",
                "d",
                (
                    F.col("val")
                    - F.lit(TRANSE_LR) * F.coalesce(F.col("g"), F.lit(0.0))
                ).alias("val"),
            ),
            "ent",
        ).localCheckpoint()
        rv = rv.join(g_rel, on=["r", "d"], how="left").select(
            "r",
            "d",
            F.round(
                F.col("val")
                - F.lit(TRANSE_LR) * F.coalesce(F.col("g"), F.lit(0.0)),
                4,
            ).alias("val"),
        ).localCheckpoint()

    curve = curve_rows[0]
    for c in curve_rows[1:]:
        curve = curve.unionByName(c)
    return curve, ev, rv, edges


def kg_embed_transe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: the TransE training curve (step, n_active, loss)."""
    curve, _, _, _ = run_transe(spark, sf_dir)
    return curve


def kg_embed_transe_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: the trained entity vectors (ent, d, val), 4 dp."""
    _, ev, _, _ = run_transe(spark, sf_dir)
    return ev.select("ent", F.col("d").cast("int").alias("d"), "val")


# ---------------------------------------------------------------------------
# DuckDB oracle twins (unrolled per-step CTE chain)
# ---------------------------------------------------------------------------

_HEX6_SQL = "CAST(('0x' || substr(md5({x}), 1, 6)) AS BIGINT)"


def _transe_prefix_sql() -> str:
    """Edges, entity index, dims, and the normalized init vectors."""
    from ed_twitter_spark.operators.bgp import _trip_sql

    dims_rows = ", ".join(f"({d})" for d in range(TRANSE_DIM))
    ehash = _HEX6_SQL.format(x="x.ent || '#e' || d.d")
    rhash = _HEX6_SQL.format(x="x.r || '#r' || d.d")
    return (
        _trip_sql()
        + f""",
cm AS (
  SELECT DISTINCT conv_id, obj_vertex AS e,
         regexp_replace(pred, 'mentioned_(by|in)_', '') AS ch
  FROM typed
),
tedges AS MATERIALIZED (
  SELECT DISTINCT a.e AS h, a.ch || '~' || b.ch AS r, b.e AS t
  FROM cm a JOIN cm b ON b.conv_id = a.conv_id AND a.e < b.e
),
ents AS (SELECT DISTINCT ent FROM (SELECT h AS ent FROM tedges UNION ALL SELECT t FROM tedges)),
eidx AS MATERIALIZED (
  SELECT ent, ROW_NUMBER() OVER (ORDER BY md5(ent), ent) - 1 AS idx FROM ents
),
nent AS (SELECT COUNT(*) AS n FROM ents),
dims(d) AS (VALUES {dims_rows}),
rels AS (SELECT DISTINCT r FROM tedges),
ev0r AS (
  SELECT x.ent, d.d,
         ({ehash} % 10000) / 10000.0 - 0.5 AS val
  FROM ents x CROSS JOIN dims d
),
ev0n AS (
  SELECT ent, sqrt(GREATEST(ROUND(SUM(val * val), 12), 1e-12)) AS nn
  FROM ev0r GROUP BY ent
),
ev0 AS MATERIALIZED (
  SELECT v.ent, v.d, ROUND(v.val / n.nn, 4) AS val
  FROM ev0r v JOIN ev0n n ON n.ent = v.ent
),
rv0r AS (
  SELECT x.r, d.d,
         ({rhash} % 10000) / 10000.0 - 0.5 AS val
  FROM rels x CROSS JOIN dims d
),
rv0n AS (
  SELECT r, sqrt(GREATEST(ROUND(SUM(val * val), 12), 1e-12)) AS nn
  FROM rv0r GROUP BY r
),
rv0 AS MATERIALIZED (
  SELECT v.r, v.d, ROUND(v.val / n.nn, 4) AS val
  FROM rv0r v JOIN rv0n n ON n.r = v.r
)"""
    )


def _transe_step_sql(k: int) -> str:
    """One unrolled step: negatives, diffs, distances, active set,
    integer gradients, update + projection."""
    p = k - 1
    neghash = _HEX6_SQL.format(x=f"e.h || '|' || e.r || '|' || e.t || '#neg{k}'")
    return f""",
tneg{k} AS MATERIALIZED (
  SELECT e.h, e.r, e.t, x.ent AS tneg
  FROM tedges e
  JOIN eidx x ON x.idx = {neghash} % (SELECT n FROM nent)
),
diff{k} AS MATERIALIZED (
  SELECT tn.h, tn.r, tn.t, tn.tneg, eh.d,
         sign(eh.val + rv.val - et.val) AS sp,
         sign(eh.val + rv.val - en.val) AS sn,
         abs(eh.val + rv.val - et.val) AS ap,
         abs(eh.val + rv.val - en.val) AS an
  FROM tneg{k} tn
  JOIN ev{p} eh ON eh.ent = tn.h
  JOIN ev{p} et ON et.ent = tn.t AND et.d = eh.d
  JOIN ev{p} en ON en.ent = tn.tneg AND en.d = eh.d
  JOIN rv{p} rv ON rv.r = tn.r AND rv.d = eh.d
),
act{k} AS MATERIALIZED (
  SELECT h, r, t, tneg,
         {TRANSE_MARGIN} + ROUND(SUM(ap), 6) - ROUND(SUM(an), 6) AS hinge
  FROM diff{k} GROUP BY h, r, t, tneg
  HAVING {TRANSE_MARGIN} + ROUND(SUM(ap), 6) - ROUND(SUM(an), 6) > 0
),
gent{k} AS (
  SELECT ent, d, SUM(g) AS g FROM (
    SELECT dd.h AS ent, dd.d, dd.sp - dd.sn AS g
    FROM diff{k} dd JOIN act{k} a ON a.h = dd.h AND a.r = dd.r AND a.t = dd.t AND a.tneg = dd.tneg
    UNION ALL
    SELECT dd.t AS ent, dd.d, -dd.sp AS g
    FROM diff{k} dd JOIN act{k} a ON a.h = dd.h AND a.r = dd.r AND a.t = dd.t AND a.tneg = dd.tneg
    UNION ALL
    SELECT dd.tneg AS ent, dd.d, dd.sn AS g
    FROM diff{k} dd JOIN act{k} a ON a.h = dd.h AND a.r = dd.r AND a.t = dd.t AND a.tneg = dd.tneg
  ) GROUP BY ent, d
),
grel{k} AS (
  SELECT dd.r, dd.d, SUM(dd.sp - dd.sn) AS g
  FROM diff{k} dd JOIN act{k} a ON a.h = dd.h AND a.r = dd.r AND a.t = dd.t AND a.tneg = dd.tneg
  GROUP BY dd.r, dd.d
),
evu{k} AS (
  SELECT v.ent, v.d, v.val - {TRANSE_LR} * COALESCE(g.g, 0) AS val
  FROM ev{p} v LEFT JOIN gent{k} g ON g.ent = v.ent AND g.d = v.d
),
evn{k} AS (
  SELECT ent, sqrt(GREATEST(ROUND(SUM(val * val), 12), 1e-12)) AS nn
  FROM evu{k} GROUP BY ent
),
ev{k} AS MATERIALIZED (
  SELECT v.ent, v.d, ROUND(v.val / n.nn, 4) AS val
  FROM evu{k} v JOIN evn{k} n ON n.ent = v.ent
),
rv{k} AS MATERIALIZED (
  SELECT v.r, v.d, ROUND(v.val - {TRANSE_LR} * COALESCE(g.g, 0), 4) AS val
  FROM rv{p} v LEFT JOIN grel{k} g ON g.r = v.r AND g.d = v.d
)"""


def kg_embed_transe_oracle_sql(steps: int = TRANSE_STEPS) -> str:
    body = _transe_prefix_sql() + "".join(
        _transe_step_sql(k) for k in range(1, steps + 1)
    )
    unions = " UNION ALL ".join(
        f"SELECT {k} AS step, CAST(COUNT(*) AS BIGINT) AS n_active, "
        f"ROUND(SUM(hinge), 4) AS loss FROM act{k}"
        for k in range(1, steps + 1)
    )
    return body + f"\n{unions}\n"


def kg_embed_transe_vectors_oracle_sql(steps: int = TRANSE_STEPS) -> str:
    body = _transe_prefix_sql() + "".join(
        _transe_step_sql(k) for k in range(1, steps + 1)
    )
    return body + f"\nSELECT ent, CAST(d AS INTEGER) AS d, val FROM ev{steps}\n"


# ---------------------------------------------------------------------------
# link-prediction evaluation (mean rank / hits@k, raw setting)
# ---------------------------------------------------------------------------


def transe_rank_eval(edges: DataFrame, ev: DataFrame, rv: DataFrame) -> DataFrame:
    """One row: (n_triples, mean_rank, hits_at_1, hits_at_3) — the TransE
    paper's evaluation protocol in its *raw* setting: for every training
    triple (h, r, t), score EVERY entity e as a candidate tail by
    d(h, r, e) = Σ|h+r-e| (6 dp) and take the rank of the true tail,
    ties broken by candidate name so both engines rank identically.

    Scale note: scoring all entities per triple is the paper's protocol
    and is O(|triples|·|entities|) — correct as the exactness baseline
    (same role as `ann_cosine_topk`), while a 10⁹-entity deployment
    prunes candidates with the IVF path (`operators/similarity.py`)
    before ranking. Evaluated on the training triples (no held-out
    split at fixture scale — stated, like `rank_train_steps`' train-as-
    dev substitution).
    """
    ents = ev.select("ent").distinct()
    scored = (
        edges.crossJoin(F.broadcast(ents.select(F.col("ent").alias("cand"))))
        .join(ev.select(F.col("ent").alias("h"), "d", F.col("val").alias("hv")), on="h")
        .join(
            ev.select(F.col("ent").alias("cand"), "d", F.col("val").alias("cv")),
            on=["cand", "d"],
        )
        .join(rv.select("r", "d", F.col("val").alias("rvv")), on=["r", "d"])
        .groupBy("h", "r", "t", "cand")
        .agg(F.round(F.sum(F.abs(F.col("hv") + F.col("rvv") - F.col("cv"))), 6).alias("dc"))
    )
    dtrue = scored.where(F.col("cand") == F.col("t")).select(
        "h", "r", "t", F.col("dc").alias("dt")
    )
    ranks = (
        scored.join(dtrue, on=["h", "r", "t"])
        .groupBy("h", "r", "t")
        .agg(
            (
                F.lit(1)
                + F.sum(
                    F.when(
                        (F.col("dc") < F.col("dt"))
                        | ((F.col("dc") == F.col("dt")) & (F.col("cand") < F.col("t"))),
                        1,
                    ).otherwise(0)
                )
            ).alias("rnk")
        )
    )
    return ranks.agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.round(F.avg("rnk"), 4).alias("mean_rank"),
        F.round(F.avg(F.when(F.col("rnk") <= 1, 1.0).otherwise(0.0)), 4).alias(
            "hits_at_1"
        ),
        F.round(F.avg(F.when(F.col("rnk") <= 3, 1.0).otherwise(0.0)), 4).alias(
            "hits_at_3"
        ),
    )


def kg_embed_transe_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: link-prediction quality of the trained vectors."""
    _, ev, rv, edges = run_transe(spark, sf_dir)
    return transe_rank_eval(edges, ev, rv)


def kg_embed_transe_eval_oracle_sql(steps: int = TRANSE_STEPS) -> str:
    body = _transe_prefix_sql() + "".join(
        _transe_step_sql(k) for k in range(1, steps + 1)
    )
    return (
        body
        + f""",
scored AS MATERIALIZED (
  SELECT e.h, e.r, e.t, c.ent AS cand,
         ROUND(SUM(abs(eh.val + rv.val - ec.val)), 6) AS dc
  FROM tedges e
  CROSS JOIN ents c
  JOIN ev{steps} eh ON eh.ent = e.h
  JOIN ev{steps} ec ON ec.ent = c.ent AND ec.d = eh.d
  JOIN rv{steps} rv ON rv.r = e.r AND rv.d = eh.d
  GROUP BY e.h, e.r, e.t, c.ent
),
dtrue AS (SELECT h, r, t, dc AS dt FROM scored WHERE cand = t),
ranks AS (
  SELECT s.h, s.r, s.t,
         1 + SUM(CASE WHEN s.dc < d.dt OR (s.dc = d.dt AND s.cand < s.t)
                      THEN 1 ELSE 0 END) AS rnk
  FROM scored s JOIN dtrue d ON d.h = s.h AND d.r = s.r AND d.t = s.t
  GROUP BY s.h, s.r, s.t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triples,
       ROUND(AVG(rnk), 4) AS mean_rank,
       ROUND(AVG(CASE WHEN rnk <= 1 THEN 1.0 ELSE 0.0 END), 4) AS hits_at_1,
       ROUND(AVG(CASE WHEN rnk <= 3 THEN 1.0 ELSE 0.0 END), 4) AS hits_at_3
FROM ranks
"""
    )
