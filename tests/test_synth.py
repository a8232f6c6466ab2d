"""Invariants of the synthetic derivations (FIXTURES.md §1-2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_twitter_spark import synth
from tests.conftest import SF_SMOKE


def test_per_turn_text_equality(spark):
    """BASELINE.json per-row invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering — every document's text must appear exactly
    once, unmodified, and ordering must be dense per conversation."""
    t = synth.transcripts(spark, SF_SMOKE).cache()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")

    assert t.count() == docs.count()
    # text round-trip by doc_id
    joined = t.join(docs, on="doc_id", how="inner")
    assert joined.where(t["text"] != docs["text"]).count() == 0
    # dense 0-based turn_idx per conv
    agg = t.groupBy("conv_id").agg(
        F.min("turn_idx").alias("lo"),
        F.max("turn_idx").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    bad = agg.where((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
    assert bad.count() == 0
    # ts monotone in turn_idx within conv (ts ordered by doc_id, row_number too)
    w_bad = (
        t.alias("a")
        .join(t.alias("b"), on="conv_id")
        .where(
            (F.col("a.turn_idx") < F.col("b.turn_idx"))
            & (F.col("a.ts") >= F.col("b.ts"))
        )
    )
    assert w_bad.count() == 0


def test_kb_alias_priors(spark):
    kb = synth.kb_alias(spark, SF_SMOKE).cache()
    # priors per mention sum to ~1 and each mention has exactly 2 candidates
    agg = kb.groupBy("mention").agg(
        F.sum("prior").alias("psum"), F.count(F.lit(1)).alias("n")
    )
    rows = agg.collect()
    assert rows
    for r in rows:
        assert abs(r["psum"] - 1.0) < 1e-4, r
        assert 1 <= r["n"] <= 2, r
    # rank 1 = higher count; E0 should dominate (4-in-5 rule)
    top = kb.where(F.col("rank") == 1)
    assert top.where(~F.col("ent_name").startswith("E0_")).count() == 0


def test_conv_context_budget_by_hand(spark):
    """Suffix-fit semantics: with budget 512, a conversation of turns sized
    [500, 10, 10] (oldest→newest) fits only the last two (20 ≤ 512 but
    520 > 512); one oversized single turn yields fit_turns 0."""
    from ed_twitter_spark.operators.transcript_stats import (
        conv_context_budget_df,
    )

    def turn(conv, idx, n):
        return (conv, idx, "user", " ".join(["w"] * n), None, None)

    t = spark.createDataFrame(
        [turn("c1", 0, 500), turn("c1", 1, 10), turn("c1", 2, 10),
         turn("c2", 0, 600)],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    got = {r["conv_id"]: (r["n_turns"], r["total_tokens"], r["fit_turns"],
                          r["fit_tokens"], r["truncated"])
           for r in conv_context_budget_df(t).collect()}
    assert got["c1"] == (3, 520, 2, 20, True)
    assert got["c2"] == (1, 600, 0, 0, True)
