"""Checkpoint/resume pipeline: lineage fingerprints, metrics rows, resume."""

from __future__ import annotations

from conftest import SF_SMOKE

from ed_twitter_spark import io as kgio
from ed_twitter_spark.plans.pipeline import STAGES, run_pipeline


def test_pipeline_runs_resumes_and_invalidates(spark, tmp_path):
    root = str(tmp_path / "ckpt")

    # cold run: every stage executes and lands a checkpoint
    r1 = run_pipeline(spark, SF_SMOKE, root)
    assert set(r1) == {s.name for s in STAGES}
    assert all(not rec["skipped"] for rec in r1.values())
    assert all(rec["rows"] > 0 for rec in r1.values())

    # warm run: identical fingerprints → everything skipped
    r2 = run_pipeline(spark, SF_SMOKE, root)
    assert all(rec["skipped"] for rec in r2.values())
    assert {n: rec["rows"] for n, rec in r2.items()} == {
        n: rec["rows"] for n, rec in r1.items()
    }

    # force mid-pipeline: the named stage and every descendant re-run
    # (a distrusted checkpoint invalidates everything built from it);
    # ancestors stay skipped
    r3 = run_pipeline(spark, SF_SMOKE, root, force=("candidates",))
    assert r3["transcripts"]["skipped"] and r3["kb_alias"]["skipped"]
    assert r3["windows"]["skipped"]
    for st in ("candidates", "triples", "components", "vertices", "edges"):
        assert not r3[st]["skipped"], st
        assert r3[st]["rows"] == r1[st]["rows"], st


def test_metrics_per_partition_sum_to_total(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    run_pipeline(spark, SF_SMOKE, root)
    m = kgio.read_metrics(spark, root, "triples").collect()
    total = next(r for r in m if r["partition_id"] == -1)
    parts = [r for r in m if r["partition_id"] >= 0]
    assert len(parts) >= 1
    assert sum(r["rows"] for r in parts) == total["rows"]
    lineage = kgio.read_lineage(spark, root, "triples")
    assert lineage["rows"] == total["rows"]
    assert lineage["deps"] == '["candidates"]'


def test_write_stage_empty_output(spark, tmp_path):
    """A stage that legitimately produces zero rows still checkpoints: the
    (stage, -1, 0) totals row exists and lineage records rows=0 — an empty
    stage is complete, not broken."""
    import time

    root = str(tmp_path / "ckpt_empty")
    empty = spark.range(0).selectExpr("id AS x")
    rec = kgio.write_stage(empty, root, "nothing", fp="f0", deps=[], started_at=time.time())
    assert rec["rows"] == 0
    m = kgio.read_metrics(spark, root, "nothing").collect()
    totals = [r for r in m if r["partition_id"] == -1]
    assert len(totals) == 1 and totals[0]["rows"] == 0
    assert kgio.read_lineage(spark, root, "nothing")["rows"] == 0


def test_graph_tables_consistent(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    run_pipeline(spark, SF_SMOKE, root)
    v = kgio.read_stage(spark, root, "vertices")
    e = kgio.read_stage(spark, root, "edges")
    t = kgio.read_stage(spark, root, "triples")
    # every non-NIL triple becomes exactly one edge with a resolved vertex
    n_non_nil = t.where(t.obj != "NIL").count()
    assert e.count() == n_non_nil
    assert e.where(e.obj_vertex.isNull()).count() == 0
    # edge vertices ⊆ vertex table ids; every vertex has a canonical name
    ids = {r.vertex_id for r in v.select("vertex_id").collect()}
    used = {r.obj_vertex for r in e.select("obj_vertex").distinct().collect()}
    assert used <= ids
    assert v.where(v.canonical_name.isNull()).count() == 0
