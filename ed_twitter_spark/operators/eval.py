"""Micro P/R/F1 evaluation (reference `mulrel-nel/nel/dataset.py:220-236`).

true_pos counts rows where pred == gold and pred != 'NIL';
precision = tp / #(pred != 'NIL'); recall = tp / #gold. Implemented as a
single aggregation over the pred⋈gold join (J7: equi-join on the mention
occurrence key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def micro_prf(pred_df: DataFrame, gold_df: DataFrame, key: str = "subj") -> DataFrame:
    """pred_df: (key, obj); gold_df: (key, gold_obj) → one metrics row."""
    joined = gold_df.join(pred_df, on=key, how="left")
    agg = joined.agg(
        F.sum(
            F.when(
                (F.col("obj") == F.col("gold_obj")) & (F.col("obj") != "NIL"), 1
            ).otherwise(0)
        ).alias("true_pos"),
        F.sum(F.when(F.col("obj") != "NIL", 1).otherwise(0)).alias("n_pred"),
        F.count(F.lit(1)).alias("n_gold"),
    )
    return agg.select(
        "true_pos",
        "n_pred",
        "n_gold",
        F.round(F.col("true_pos") / F.col("n_pred"), 6).alias("precision"),
        F.round(F.col("true_pos") / F.col("n_gold"), 6).alias("recall"),
        F.round(
            2.0
            * (F.col("true_pos") / F.col("n_pred"))
            * (F.col("true_pos") / F.col("n_gold"))
            / ((F.col("true_pos") / F.col("n_pred")) + (F.col("true_pos") / F.col("n_gold"))),
            6,
        ).alias("f1"),
    )


def link_calibration(pred_df: DataFrame, gold_df: DataFrame) -> DataFrame:
    """(bucket, n, n_correct, accuracy, avg_score) — the reliability
    diagram of a scored linker: predictions bucketed into 10 equal-width
    score bins between the corpus min and max score, per-bin link
    accuracy vs gold alongside the bin's mean score. A well-calibrated
    scorer shows accuracy rising with the bin index; a flat profile means
    the score carries no confidence signal and downstream triple
    consumers should not threshold on it.

    pred_df: (subj, obj, score_r4); gold_df: (subj, gold_obj).

    Scale shape: bucketing is equal-WIDTH, not equal-count — the bin edge
    is a closed-form function of two scalar aggregates (min, max) that
    broadcast back, so there is no global rank/ntile window (an ntile
    reliability diagram funnels 10^12 rows through ONE partition; the
    fixed-width variant is the one that survives, and is the standard
    presentation for calibration anyway). Scores are 4-dp decimals on
    both engines, so bin arithmetic and the exact-decimal score sums are
    engine-invariant; only the final two ratios run in double.
    """
    j = gold_df.join(pred_df, on="subj", how="inner")
    rng = j.agg(
        F.min("score_r4").alias("smin"), F.max("score_r4").alias("smax")
    )
    b = j.crossJoin(F.broadcast(rng)).withColumn(
        "bucket",
        F.when(F.col("smax") == F.col("smin"), F.lit(0)).otherwise(
            F.least(
                F.lit(9),
                F.floor(
                    (F.col("score_r4") - F.col("smin"))
                    / (F.col("smax") - F.col("smin"))
                    * 10
                ).cast("int"),
            )
        ),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("obj") == F.col("gold_obj"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
        F.round(
            F.sum(F.when(F.col("obj") == F.col("gold_obj"), 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("accuracy"),
        F.round(
            F.sum(F.col("score_r4").cast("decimal(28,4)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_score"),
    )


# ---------------------------------------------------------------------------
# bootstrap confidence interval on micro-F1 — error bars for the gate
# ---------------------------------------------------------------------------
#
# A single micro-F1 number says nothing about its stability; the
# standard answer is the Poisson(1) bootstrap (each example enters each
# replicate with an independent Poisson(1) multiplicity — the
# with-replacement bootstrap's streaming-friendly limit, the form used
# at corpus scale precisely because it needs NO global resample pass:
# one deterministic weight per (example, replicate), all aggregations
# stay map-side-combined). Determinized cross-engine: the multiplicity
# is an inverse-CDF lookup on a 48-bit integer slice of
# md5(subj # replicate), compared against INTEGER thresholds
# floor(cdf_k · 2^48) — no float compare anywhere in the draw.

_POISSON1_T = [
    103548857136060,   # P(X<=0)=e^-1
    207097714272121,   # P(X<=1)
    258872142840152,   # P(X<=2)
    276130285696162,   # P(X<=3)
    280444821410164,   # P(X<=4)
    281307728552965,   # P(X<=5); remainder -> 6
]
BOOTSTRAP_REPS = 32


def eval_bootstrap_ci(pred_df: DataFrame, gold_df: DataFrame) -> DataFrame:
    """One row (n_reps, point_f1, f1_mean, f1_p05, f1_p95) — the
    micro-F1 point estimate with Poisson-bootstrap 5th/95th percentile
    error bars over BOOTSTRAP_REPS deterministic replicates.

    pred_df: (subj, obj); gold_df: (subj, gold_obj). Replicate F1s are
    6-dp; their mean uses an exact DECIMAL sum and the percentiles are
    Spark ``percentile`` ≡ DuckDB ``quantile_cont`` type-7 interpolation
    over identical value lists, so the CI is engine-invariant.
    """
    j = gold_df.join(pred_df, on="subj", how="left")
    correct = ((F.col("obj") == F.col("gold_obj")) & (F.col("obj") != "NIL")).cast(
        "int"
    )
    predicted = (F.col("obj") != "NIL").cast("int")
    base = j.select("subj", correct.alias("c"), predicted.alias("p"))

    point = base.agg(
        F.round(
            2.0
            * (F.sum("c") / F.sum("p"))
            * (F.sum("c") / F.count(F.lit(1)))
            / ((F.sum("c") / F.sum("p")) + (F.sum("c") / F.count(F.lit(1)))),
            6,
        ).alias("point_f1")
    )

    u = F.conv(
        F.substring(F.md5(F.concat_ws("#", F.col("subj"), F.col("b"))), 1, 12),
        16,
        10,
    ).cast("long")
    w = F.when(u < _POISSON1_T[0], 0)
    for k in range(1, 6):
        w = w.when(u < _POISSON1_T[k], k)
    w = w.otherwise(6)

    reps = base.select(
        "subj", "c", "p", F.explode(F.sequence(F.lit(0), F.lit(BOOTSTRAP_REPS - 1))).alias("b")
    ).select("b", "c", "p", w.alias("w"))
    per_rep = (
        reps.groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("c")).alias("tp"),
            F.sum(F.col("w") * F.col("p")).alias("np"),
            F.sum("w").alias("ng"),
        )
        .where((F.col("np") > 0) & (F.col("ng") > 0))
        .select(
            F.round(
                2.0
                * (F.col("tp") / F.col("np"))
                * (F.col("tp") / F.col("ng"))
                / ((F.col("tp") / F.col("np")) + (F.col("tp") / F.col("ng"))),
                6,
            ).alias("f1")
        )
    )
    per_rep = per_rep.where(F.col("f1").isNotNull())  # tp=0 degenerate reps
    summary = per_rep.agg(
        F.count(F.lit(1)).cast("int").alias("n_reps"),
        F.round(
            F.sum(F.col("f1").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("f1_mean"),
        F.round(F.expr("percentile(f1, 0.05)"), 6).alias("f1_p05"),
        F.round(F.expr("percentile(f1, 0.95)"), 6).alias("f1_p95"),
    )
    return summary.crossJoin(F.broadcast(point)).select(
        "n_reps", "point_f1", "f1_mean", "f1_p05", "f1_p95"
    )
