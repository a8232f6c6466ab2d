"""Streaming linker: the stateless stream-static plan must reproduce the
batch triples exactly across micro-batch splits, and an incremental
restart from the checkpoint must link only newly-landed turns."""

from __future__ import annotations

from conftest import SF_SMOKE

from ed_twitter_spark import synth
from ed_twitter_spark.operators import candidates as cand_ops
from ed_twitter_spark.operators import mentions as mention_ops
from ed_twitter_spark.streaming import link as slink


def _batch_triples(spark, src):
    turns = spark.read.parquet(src)
    kb = synth.kb_alias(spark, SF_SMOKE)
    return cand_ops.link_prior_argmax(
        cand_ops.gen_candidates(mention_ops.detect_mentions(turns), kb)
    )


def test_stream_link_matches_batch_across_microbatches(spark, tmp_path):
    src = slink.stage_transcripts(spark, SF_SMOKE, str(tmp_path / "src"))
    streamed = slink.run_link_once(
        spark,
        src,
        SF_SMOKE,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=2,  # several micro-batches, not one big one
        query_name="t_stream_link",
    )
    batch = _batch_triples(spark, src)
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_stream_link_incremental_restart(spark, tmp_path):
    """New files + same checkpoint → only the new turns are linked
    (exactly-once append through the durable parquet sink)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    turns = synth.transcripts(spark, SF_SMOKE)
    first = turns.where("doc_id % 2 = 0")
    second = turns.where("doc_id % 2 = 1")
    first.write.mode("overwrite").parquet(src)
    out1 = slink.run_link_once(
        spark, src, SF_SMOKE, checkpoint_dir=ckpt, out_dir=out
    )
    assert out1.count() == _batch_triples(spark, src).count()

    # land the second half; resume from the same checkpoint — the sink
    # gains exactly the second half's triples, nothing re-emitted
    second.write.mode("append").parquet(src)
    out2 = slink.run_link_once(
        spark, src, SF_SMOKE, checkpoint_dir=ckpt, out_dir=out
    )
    full = _batch_triples(spark, src)
    assert out2.count() == full.count()
    assert out2.exceptAll(full).count() == 0
    assert full.exceptAll(out2).count() == 0


def test_stream_kg_edges_incremental_restart(spark, tmp_path):
    """The full KG-edge stream (linker + canonical re-pointing) resumed
    from a checkpoint after new turns land emits exactly the batch
    kg_edges table for the union — no re-emission, no gaps."""
    from ed_twitter_spark.operators import graph as graph_ops
    from ed_twitter_spark.operators.canonicalize import components_for

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    turns = synth.transcripts(spark, SF_SMOKE)
    kb = synth.kb_alias(spark, SF_SMOKE)
    components = components_for(spark, SF_SMOKE)
    plan = lambda s: slink.kg_edge_stream(s, kb, components)  # noqa: E731

    turns.where("doc_id % 2 = 0").write.mode("overwrite").parquet(src)
    slink.run_link_once(
        spark, src, SF_SMOKE, checkpoint_dir=ckpt, out_dir=out, plan=plan
    )
    turns.where("doc_id % 2 = 1").write.mode("append").parquet(src)
    out2 = slink.run_link_once(
        spark, src, SF_SMOKE, checkpoint_dir=ckpt, out_dir=out, plan=plan
    )
    batch = graph_ops.kg_edges(_batch_triples(spark, src), components)
    assert out2.count() == batch.count()
    assert out2.exceptAll(batch).count() == 0
    assert batch.exceptAll(out2).count() == 0
