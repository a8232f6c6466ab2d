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
