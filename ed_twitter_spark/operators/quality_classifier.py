"""In-engine quality-classifier training — the fastText-style "does this
look like curated text?" filter of the GPT-3 / CCNet data pipelines
(Brown et al. 2020 App. A; Wenzek et al. 2020 §4.4), trained HERE as
full-batch logistic-regression gradient descent in pure DataFrame
algebra with an unrolled-CTE DuckDB twin.

No labeled negatives exist in a raw corpus, so the standard trick is
noise-contrastive: positives are the real documents, negatives are
deterministic corrupted twins — here "templated spam" (the document's
first token repeated to the same length), whose quality features are
CLOSED-FORM from the positive's aggregates (type-token ratio -> 1/n,
repetition -> 1.0, avg token length -> len(first token)), so the
negative class costs no second corpus pass and no RNG.

Features per document (all derived from integer token aggregates, so
both engines compute identical doubles):

    x0 = 1 (bias)          x1 = ln(1 + n_tokens)
    x2 = type-token ratio  x3 = max-token-frequency ratio (repetition)
    x4 = mean token length

Training: GD_STEPS full-batch steps at LR on the logistic loss, w = 0
start. Each step is ONE map-side-combined aggregation over the feature
frame (6 running sums: the loss and five gradient components — the
classic "logistic regression is one AVG per step" distributed
formulation); the 1-row weight frame rides a broadcast cross join, and
the per-step lineage is cut with localCheckpoint like every other
training loop here. At 10^12 documents each step is one scan of a
5-column feature table — embarrassingly parallel, no shuffle beyond
the scalar aggregate.

Determinism: feature doubles are identical by construction; the
per-step sums are unordered float AVGs (the kg_eigencentrality /
train_loss_variants precedent — ln/exp agree at the ROUND(,6) pin);
outputs are rounded to 6 dp on both sides.

``quality_classifier_train`` emits (step, loss, w0..w4) — loss is
evaluated at the step's INCOMING weights, w is the updated vector.
``quality_classifier_score`` applies the final weights back to the real
documents: (doc_id, score, keep).

The reference has no quality filtering (its corpus is pre-curated
fixture data); this is the operator a 100-TB raw-crawl pipeline runs
before anything else in SURVEY §2's dedup ladder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ed_twitter_spark.functions.hashing import TOKS_SQL, toks_col

GD_STEPS = 8
LR = 0.2
_NF = 5  # x0..x4


def _doc_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tok, n_distinct, maxfreq, sum_len, flen) — the integer
    token aggregates both classes' features derive from. One corpus scan."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = docs.select("doc_id", F.explode(toks_col()).alias("tok"))
    ptok = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    agg = ptok.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tok"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("c").cast("long").alias("maxfreq"),
        F.sum(F.length("tok") * F.col("c")).cast("long").alias("sum_len"),
    )
    first = docs.select(
        "doc_id", F.length(F.element_at(toks_col(), 1)).cast("long").alias("flen")
    )
    return agg.join(first, "doc_id")


def _feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, x0..x4) — positives (real docs) + closed-form
    templated-spam negatives."""
    base = _doc_aggregates(spark, sf_dir)
    f1 = F.log(F.lit(1) + F.col("n_tok"))
    pos = base.select(
        "doc_id",
        F.lit(1.0).alias("y"),
        F.lit(1.0).alias("x0"),
        f1.alias("x1"),
        (F.col("n_distinct") * F.lit(1.0) / F.col("n_tok")).alias("x2"),
        (F.col("maxfreq") * F.lit(1.0) / F.col("n_tok")).alias("x3"),
        (F.col("sum_len") * F.lit(1.0) / F.col("n_tok")).alias("x4"),
    )
    neg = base.select(
        "doc_id",
        F.lit(0.0).alias("y"),
        F.lit(1.0).alias("x0"),
        f1.alias("x1"),
        (F.lit(1.0) / F.col("n_tok")).alias("x2"),
        F.lit(1.0).alias("x3"),
        (F.col("flen") * F.lit(1.0)).alias("x4"),
    )
    return pos.unionByName(neg)


def _z(prefix: str = "") -> F.Column:
    z = F.lit(0.0)
    for j in range(_NF):
        z = z + F.col(f"x{j}") * F.col(f"{prefix}w{j}")
    return z


def quality_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(step, loss, w0..w4) — GD_STEPS full-batch logistic GD steps."""
    from ed_twitter_spark.caching import persist_tracked

    feats = persist_tracked(_feature_frame(spark, sf_dir))
    w = spark.createDataFrame(
        [tuple(0.0 for _ in range(_NF))], [f"w{j}" for j in range(_NF)]
    )
    rows: list[DataFrame] = []
    for k in range(1, GD_STEPS + 1):
        scored = feats.crossJoin(F.broadcast(w))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z()))
        stat = scored.select(
            "y", p.alias("p"), *[f"x{j}" for j in range(_NF)]
        ).agg(
            F.avg(
                -(
                    F.col("y") * F.log("p")
                    + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - F.col("p"))
                )
            ).alias("loss"),
            *[
                F.avg((F.col("p") - F.col("y")) * F.col(f"x{j}")).alias(f"g{j}")
                for j in range(_NF)
            ],
        )
        row = (
            stat.crossJoin(F.broadcast(w))
            .select(
                F.lit(k).alias("step"),
                "loss",
                *[
                    (F.col(f"w{j}") - F.lit(LR) * F.col(f"g{j}")).alias(f"w{j}")
                    for j in range(_NF)
                ],
            )
            .localCheckpoint()  # 1 row; cut the per-step lineage
        )
        rows.append(
            row.select(
                "step",
                F.round("loss", 6).alias("loss"),
                *[
                    # + 0.0 normalizes -0.0 → 0.0, as the SQL twin does
                    (F.round(f"w{j}", 6) + F.lit(0.0)).alias(f"w{j}")
                    for j in range(_NF)
                ],
            )
        )
        w = row.select(*[f"w{j}" for j in range(_NF)])
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def _trained_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final 1-row unrounded weight frame (re-runs the loop; the per-step
    frames are localCheckpoint-ed so this is the same chain, not a rerun
    per step)."""
    from ed_twitter_spark.caching import persist_tracked

    feats = persist_tracked(_feature_frame(spark, sf_dir))
    w = spark.createDataFrame(
        [tuple(0.0 for _ in range(_NF))], [f"w{j}" for j in range(_NF)]
    )
    for _ in range(GD_STEPS):
        scored = feats.crossJoin(F.broadcast(w))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z()))
        stat = scored.select(
            "y", p.alias("p"), *[f"x{j}" for j in range(_NF)]
        ).agg(
            *[
                F.avg((F.col("p") - F.col("y")) * F.col(f"x{j}")).alias(f"g{j}")
                for j in range(_NF)
            ],
        )
        w = (
            stat.crossJoin(F.broadcast(w))
            .select(
                *[
                    (F.col(f"w{j}") - F.lit(LR) * F.col(f"g{j}")).alias(f"w{j}")
                    for j in range(_NF)
                ]
            )
            .localCheckpoint()
        )
    return w


def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score, keep) — the trained filter applied to the real
    corpus: score = σ(w·x), keep = score ≥ 0.5. One broadcast of the
    5-double weight row onto the positive feature scan."""
    w = _trained_weights(spark, sf_dir)
    pos = _feature_frame(spark, sf_dir).where(F.col("y") == 1.0)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z()))
    return pos.crossJoin(F.broadcast(w)).select(
        "doc_id",
        F.round(p, 6).alias("score"),
        (F.round(p, 6) >= F.lit(0.5)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

_XS = ", ".join(f"x{j}" for j in range(_NF))


def _feats_sql() -> str:
    return f"""tok AS (
  SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents
),
ptok AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
agg AS MATERIALIZED (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT)             AS n_tok,
         CAST(COUNT(*) AS BIGINT)           AS n_distinct,
         CAST(MAX(c) AS BIGINT)             AS maxfreq,
         CAST(SUM(length(tok) * c) AS BIGINT) AS sum_len
  FROM ptok GROUP BY doc_id
),
fst AS (
  SELECT doc_id,
         CAST(length(({TOKS_SQL})[1]) AS BIGINT) AS flen
  FROM documents
),
feats AS MATERIALIZED (
  SELECT a.doc_id, 1.0 AS y, 1.0 AS x0, ln(1 + n_tok) AS x1,
         n_distinct * 1.0 / n_tok AS x2,
         maxfreq * 1.0 / n_tok    AS x3,
         sum_len * 1.0 / n_tok    AS x4
  FROM agg a JOIN fst f ON f.doc_id = a.doc_id
  UNION ALL
  SELECT a.doc_id, 0.0 AS y, 1.0 AS x0, ln(1 + n_tok) AS x1,
         1.0 / n_tok AS x2,
         1.0         AS x3,
         flen * 1.0  AS x4
  FROM agg a JOIN fst f ON f.doc_id = a.doc_id
)"""


def _gd_ctes(steps: int) -> str:
    zexpr = " + ".join(f"x{j} * w{j}" for j in range(_NF))
    parts = [
        _feats_sql(),
        "w0_ AS (SELECT "
        + ", ".join(f"0.0 AS w{j}" for j in range(_NF))
        + ")",
    ]
    prev = "w0_"
    for k in range(1, steps + 1):
        gs = ", ".join(f"AVG((p - y) * x{j}) AS g{j}" for j in range(_NF))
        ws = ", ".join(f"w{j} - {LR} * g{j} AS w{j}" for j in range(_NF))
        parts.append(
            f"""p{k} AS (
  SELECT y, {_XS}, 1.0 / (1.0 + exp(-(0.0 + {zexpr}))) AS p
  FROM feats, {prev}
),
g{k} AS MATERIALIZED (
  SELECT AVG(-(y * ln(p) + (1.0 - y) * ln(1.0 - p))) AS loss, {gs}
  FROM p{k}
),
w{k} AS MATERIALIZED (SELECT {ws} FROM g{k}, {prev})"""
        )
        prev = f"w{k}"
    return ",\n".join(parts)


def quality_classifier_train_oracle_sql(steps: int = GD_STEPS) -> str:
    rws = ", ".join(f"ROUND(w{j}, 6) + 0.0 AS w{j}" for j in range(_NF))
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS INTEGER) AS step, ROUND((SELECT loss FROM g{k}), 6)"
        f" AS loss, {rws} FROM w{k}"
        for k in range(1, steps + 1)
    )
    return f"WITH {_gd_ctes(steps)}\n{union}"


def quality_classifier_score_oracle_sql(steps: int = GD_STEPS) -> str:
    zexpr = " + ".join(f"x{j} * w{j}" for j in range(_NF))
    return f"""WITH {_gd_ctes(steps)}
SELECT doc_id,
       ROUND(1.0 / (1.0 + exp(-(0.0 + {zexpr}))), 6) AS score,
       ROUND(1.0 / (1.0 + exp(-(0.0 + {zexpr}))), 6) >= 0.5 AS keep
FROM feats, w{steps}
WHERE y = 1.0
"""


# ---------------------------------------------------------------------------
# classifier evaluation — exact AUC + accuracy on the contrastive frame
# ---------------------------------------------------------------------------
#
# The number that justifies deploying the filter: ROC-AUC of the trained
# scorer over the positive/negative frame it was trained against, plus
# threshold-0.5 accuracy. AUC is computed EXACTLY as the normalized
# Mann–Whitney rank sum with midrank tie handling, all in integers:
# group rows by their 6-dp score, order ascending, and accumulate
# pos_s · (2·cum_neg_below + neg_s) — twice the pair-win count with ties
# worth one — then divide once by 2·n_pos·n_neg. The ordering window is
# bounded BY CONSTRUCTION at 10⁶+1 rows (scores are 6-dp values in
# [0, 1]), so the per-score frame never inherits the corpus's scale; the
# pair-win sums ride DECIMAL(38,0) so 10^12-row classes cannot overflow.


def quality_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n_pos, n_neg, auc, acc) for the trained quality filter."""
    w = _trained_weights(spark, sf_dir)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z()))
    scored = (
        _feature_frame(spark, sf_dir)
        .crossJoin(F.broadcast(w))
        .select("y", F.round(p, 6).alias("s"))
    )
    per_s = scored.groupBy("s").agg(
        F.sum(F.col("y").cast("long")).alias("pos"),
        F.sum(F.lit(1) - F.col("y").cast("long")).alias("neg"),
    )
    win = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_s.withColumn(
        "cum_neg_below", F.coalesce(F.sum("neg").over(win), F.lit(0))
    )
    return ranked.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum(
            (
                F.col("pos")
                * (F.lit(2) * F.col("cum_neg_below") + F.col("neg"))
            ).cast("decimal(38,0)")
        ).alias("win2"),
        F.sum(
            F.when((F.col("s") >= 0.5), F.col("pos")).otherwise(0)
            + F.when(F.col("s") < 0.5, F.col("neg")).otherwise(0)
        )
        .cast("long")
        .alias("n_correct"),
    ).select(
        "n_pos",
        "n_neg",
        F.round(
            F.col("win2").cast("double")
            / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
        F.round(F.col("n_correct") / (F.col("n_pos") + F.col("n_neg")), 6).alias(
            "acc"
        ),
    )


def quality_classifier_eval_oracle_sql(steps: int = GD_STEPS) -> str:
    zexpr = " + ".join(f"x{j} * w{j}" for j in range(_NF))
    return f"""WITH {_gd_ctes(steps)},
scored AS (
  SELECT y, ROUND(1.0 / (1.0 + exp(-(0.0 + {zexpr}))), 6) AS s
  FROM feats, w{steps}
),
per_s AS (
  SELECT s, CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         CAST(SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS neg
  FROM scored GROUP BY s
),
ranked AS (
  SELECT s, pos, neg,
         COALESCE(SUM(neg) OVER (ORDER BY s
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS cum_neg_below
  FROM per_s
),
evagg AS (
  SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(neg) AS BIGINT) AS n_neg,
         SUM(CAST(pos * (2 * cum_neg_below + neg) AS DECIMAL(38,0))) AS win2,
         CAST(SUM(CASE WHEN s >= 0.5 THEN pos ELSE 0 END
                  + CASE WHEN s < 0.5 THEN neg ELSE 0 END) AS BIGINT)
           AS n_correct
  FROM ranked
)
SELECT n_pos, n_neg,
       ROUND(CAST(win2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6) AS auc,
       ROUND(n_correct * 1.0 / (n_pos + n_neg), 6) AS acc
FROM evagg
"""
