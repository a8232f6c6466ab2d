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
