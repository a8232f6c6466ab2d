"""SemDeDup (dedup_semantic) correctness pins.

The DuckDB twin certifies the value surface at the gate SF; these tests
pin the pieces the oracle can't see: the cap is plan-only, every removal
has an in-cell witness under the deterministic (c_sim, vec_id) keep
rule, and every duplicate clique keeps at least its key-minimal member.
"""

import pytest
from conftest import SF_CORRECT, SF_SMOKE

from pyspark.sql import functions as F

from ed_twitter_spark.operators.semdedup import (
    SEMDEDUP_COS,
    semantic_verdicts,
)


def test_semdedup_cap_is_plan_only(spark):
    """A tiny cell cap must emit the exact same verdict table as the
    unblocked g=1 join — CELL_CAP bounds join-key width, not semantics."""
    capped = semantic_verdicts(spark, SF_SMOKE, cell_cap=8)
    uncapped = semantic_verdicts(spark, SF_SMOKE, cell_cap=10**9)
    got = {tuple(r) for r in capped.collect()}
    want = {tuple(r) for r in uncapped.collect()}
    assert got == want
    assert len(want) == spark.read.parquet(
        f"{SF_SMOKE}/embeddings.parquet"
    ).count()


def test_semdedup_removals_have_witnesses(spark):
    """Every removed vector has a same-cell neighbor with cos ≥ τ and a
    strictly smaller (c_sim, vec_id) key; every kept vector has none.
    Recomputed from first principles with an unblocked pair join."""
    from ed_twitter_spark.operators.similarity import (
        _assign,
        _centroids_for,
        _cos,
        _emb_double,
    )

    sf = SF_CORRECT
    verdicts = {r["vec_id"]: r for r in semantic_verdicts(spark, sf).collect()}
    removed = {v for v, r in verdicts.items() if r["removed"]}
    assert removed, "fixture threshold should remove a non-trivial set"
    assert len(removed) < len(verdicts), "must keep survivors"

    emb = _emb_double(spark, sf)
    cents = _centroids_for(spark, sf)
    asg = _assign(emb, cents).join(F.broadcast(cents), "cid").select(
        "cid", "vec_id", "v", _cos(F.col("v"), F.col("cvec")).alias("c_sim")
    )
    a = asg.select(
        "cid",
        F.col("vec_id").alias("v1"),
        F.col("v").alias("e1"),
        F.col("c_sim").alias("c1"),
    )
    b = asg.select(
        F.col("cid").alias("c2"),
        F.col("vec_id").alias("v2"),
        F.col("v").alias("e2"),
        F.col("c_sim").alias("c2s"),
    )
    pairs = (
        a.join(b, (a.cid == b.c2) & (a.v1 != b.v2))
        .where(_cos(F.col("e1"), F.col("e2")) >= SEMDEDUP_COS)
        .select("v1", "c1", "v2", "c2s")
        .collect()
    )
    # v2 is removed iff some neighbor v1 has a smaller (c_sim, vec_id) key
    want_removed = {
        p["v2"]
        for p in pairs
        if (p["c1"], p["v1"]) < (p["c2s"], p["v2"])
    }
    assert removed == want_removed


def test_semdedup_c_sim_matches_centroid_cosine(spark):
    """c_sim is the cosine to the vector's OWN cell centroid (rounded 4dp,
    in [-1, 1])."""
    rows = semantic_verdicts(spark, SF_SMOKE).collect()
    assert all(-1.0 <= r["c_sim"] <= 1.0 for r in rows)
    # cells are the IVF quantizer's — every cid within [0, K)
    from ed_twitter_spark.operators.similarity import K_CENTROIDS

    assert all(0 <= r["cid"] < K_CENTROIDS for r in rows)


def test_semdedup_plan_no_cartesian_and_shuffle_hash(spark):
    """The pair scan must run as a shuffle-hash join on the (cid, block)
    key — never a broadcast of the exploded side or a cartesian."""
    plan = semantic_verdicts(spark, SF_CORRECT)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "ShuffledHashJoin" in plan
