"""KG data-quality operators: shape validation and temporal edge churn.

Neither exists in the reference (it emits links and stops); both are
table-stakes for operating a constructed KG:

* ``kg_shacl_validate`` — SHACL-style shape conformance over the triple
  store: per predicate family, check the subject/object node-id shapes
  (sh:pattern on focus/value nodes) and a max-cardinality constraint
  (sh:maxCount). The validator is ONE pass over the triples: a 3-row
  broadcast shapes table fans each triple to its matching shape, then
  per-shape counting aggregates — no shuffle beyond the final tiny
  group-by, so it runs at ingest cadence on a 100-TB store.
* ``kg_edge_churn`` — within-conversation KG drift: split every
  conversation at its midpoint turn and classify each (conv, vertex)
  edge as ``added`` (second half only), ``removed`` (first half only)
  or ``stable`` (both) — the snapshot-diff primitive for monitoring how
  the graph a conversation induces changes as the conversation runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (shape_id, predicate pattern, subject pattern, object pattern, max count
# of matching triples per subject — None = unbounded)
SHACL_SHAPES: list[tuple[str, str, str, str, int | None]] = [
    (
        "mention-link",
        "^mentioned_(by|in)_[a-z]+$",
        "^conv_[0-9]+#[0-9]+#[0-9]+$",
        "^[em]:",
        1,
    ),
    (
        "mention-prov",
        "^in_conv$",
        "^conv_[0-9]+#[0-9]+#[0-9]+$",
        "^conv_[0-9]+$",
        1,
    ),
    ("conv-mentions", "^mentions$", "^conv_[0-9]+$", "^[em]:", None),
]


def shacl_validate(spark: SparkSession, triples: DataFrame) -> DataFrame:
    """Per shape: (shape_id, n_focus, n_subj_viol, n_obj_viol, n_card_viol).

    n_focus = triples whose predicate matches the shape; *_viol = focus
    triples whose subject/object fails its pattern; n_card_viol =
    subjects with more than max_count focus triples. A clean store
    reports zeros in the violation columns with non-zero n_focus — the
    counts arm keeps the report discriminating either way.
    """
    shapes = spark.createDataFrame(
        [(s, p, su, o, c) for s, p, su, o, c in SHACL_SHAPES],
        "shape_id string, pred_re string, subj_re string, obj_re string, max_count int",
    )
    focus = triples.crossJoin(F.broadcast(shapes)).where(
        F.expr("rlike(p, pred_re)")
    )
    per_shape = focus.groupBy("shape_id", "max_count").agg(
        F.count(F.lit(1)).cast("long").alias("n_focus"),
        F.sum(F.when(~F.expr("rlike(s, subj_re)"), 1).otherwise(0))
        .cast("long")
        .alias("n_subj_viol"),
        F.sum(F.when(~F.expr("rlike(o, obj_re)"), 1).otherwise(0))
        .cast("long")
        .alias("n_obj_viol"),
    )
    card = (
        focus.groupBy("shape_id", "s")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(shapes.select("shape_id", "max_count")), on="shape_id")
        .where(F.col("max_count").isNotNull() & (F.col("n") > F.col("max_count")))
        .groupBy("shape_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_card_viol"))
    )
    return (
        per_shape.join(card, on="shape_id", how="left")
        .select(
            "shape_id",
            "n_focus",
            "n_subj_viol",
            "n_obj_viol",
            F.coalesce("n_card_viol", F.lit(0)).cast("long").alias("n_card_viol"),
        )
    )


def kg_shacl_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ed_twitter_spark.operators.bgp import _gate_triples

    return shacl_validate(spark, _gate_triples(spark, sf_dir))


def kg_shacl_validate_oracle_sql() -> str:
    from ed_twitter_spark.operators.bgp import _trip_sql

    shape_rows = ", ".join(
        f"('{s}', '{p}', '{su}', '{o}', {c if c is not None else 'NULL'})"
        for s, p, su, o, c in SHACL_SHAPES
    )
    return (
        _trip_sql()
        + f""",
shapes(shape_id, pred_re, subj_re, obj_re, max_count) AS (VALUES {shape_rows}),
focus AS MATERIALIZED (
  SELECT sh.shape_id, sh.subj_re, sh.obj_re, sh.max_count, t.s, t.o
  FROM trip t JOIN shapes sh ON regexp_matches(t.p, sh.pred_re)
),
per_shape AS (
  SELECT shape_id, max_count,
         CAST(COUNT(*) AS BIGINT) AS n_focus,
         CAST(SUM(CASE WHEN NOT regexp_matches(s, subj_re) THEN 1 ELSE 0 END) AS BIGINT) AS n_subj_viol,
         CAST(SUM(CASE WHEN NOT regexp_matches(o, obj_re) THEN 1 ELSE 0 END) AS BIGINT) AS n_obj_viol
  FROM focus GROUP BY shape_id, max_count
),
card AS (
  SELECT shape_id, CAST(COUNT(*) AS BIGINT) AS n_card_viol FROM (
    SELECT shape_id, s, MAX(max_count) AS mc, COUNT(*) AS n
    FROM focus GROUP BY shape_id, s
  ) WHERE mc IS NOT NULL AND n > mc GROUP BY shape_id
)
SELECT p.shape_id, p.n_focus, p.n_subj_viol, p.n_obj_viol,
       CAST(COALESCE(c.n_card_viol, 0) AS BIGINT) AS n_card_viol
FROM per_shape p LEFT JOIN card c ON c.shape_id = p.shape_id
"""
    )


# ---------------------------------------------------------------------------
# temporal churn
# ---------------------------------------------------------------------------


def edge_churn(edges: DataFrame) -> DataFrame:
    """(status, n_edges) — each distinct (conv, vertex) edge classified by
    which half of its conversation's turns it appears in: ``stable``
    (both halves), ``removed`` (first only), ``added`` (second only).

    The midpoint is floor(max(turn_idx)/2) per conversation; halves are
    turn_idx ≤ mid vs > mid. Two keyed aggregations (per-conv max, then
    per-edge half flags) — co-partitioned by conv_id at scale.
    """
    e = edges.where(F.col("obj_vertex").isNotNull()).select(
        "conv_id", "turn_idx", "obj_vertex"
    )
    mid = e.groupBy("conv_id").agg((F.floor(F.max("turn_idx") / 2)).alias("mid"))
    flags = (
        e.join(mid, on="conv_id")
        .groupBy("conv_id", "obj_vertex")
        .agg(
            F.max(F.when(F.col("turn_idx") <= F.col("mid"), 1).otherwise(0)).alias(
                "in_first"
            ),
            F.max(F.when(F.col("turn_idx") > F.col("mid"), 1).otherwise(0)).alias(
                "in_second"
            ),
        )
    )
    status = (
        F.when((F.col("in_first") == 1) & (F.col("in_second") == 1), "stable")
        .when(F.col("in_first") == 1, "removed")
        .otherwise("added")
    )
    return flags.groupBy(status.alias("status")).agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    )


def kg_edge_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ed_twitter_spark.operators.graph import q_kg_edges

    return edge_churn(q_kg_edges(spark, sf_dir))


def kg_edge_churn_oracle_sql() -> str:
    from ed_twitter_spark.operators.graph import _kg_edges_named_sql

    return (
        _kg_edges_named_sql()
        + """,
e AS (SELECT conv_id, turn_idx, obj_vertex FROM kge WHERE obj_vertex IS NOT NULL),
mid AS (SELECT conv_id, CAST(FLOOR(MAX(turn_idx) / 2) AS BIGINT) AS mid FROM e GROUP BY conv_id),
flags AS (
  SELECT e.conv_id, e.obj_vertex,
         MAX(CASE WHEN e.turn_idx <= m.mid THEN 1 ELSE 0 END) AS in_first,
         MAX(CASE WHEN e.turn_idx > m.mid THEN 1 ELSE 0 END) AS in_second
  FROM e JOIN mid m ON m.conv_id = e.conv_id
  GROUP BY e.conv_id, e.obj_vertex
)
SELECT CASE WHEN in_first = 1 AND in_second = 1 THEN 'stable'
            WHEN in_first = 1 THEN 'removed' ELSE 'added' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n_edges
FROM flags
GROUP BY 1
"""
    )
