"""Bucketed co-located joins: shuffle-free *repeated* joins at fact scale.

The mention→KB candidate join (J1) recurs in every linking stage — prior
argmax, cosine rerank, embedding LBP — and `operators/candidates.py`
already selects between a broadcast hash join (dim-sized KB) and a salted
shuffle-hash join (fact-sized, skewed KB). Both re-pay their cost on every
execution: the broadcast re-ships the KB per stage, the shuffle re-shuffles
the full mention stream per stage.

At 100 TB the scale-optimal layout for a *recurring* equi-join is bucketed
storage: write both sides hash-partitioned into the same number of buckets
on the join key (``df.write.bucketBy(n, key).sortBy(key)``). Spark records
the bucket spec in the table catalog; every subsequent join on that key
reads co-located buckets and the physical plan carries **zero Exchange on
either side** — the shuffle was paid once at write time and amortizes over
all downstream stages (and all future runs: the checkpoint tables in
``io.py`` land in the same catalog). Bucket-pruning on point lookups
(``mention = 'x'`` touches 1/n of the files) comes free with the layout.

The reference has no analog — its `ent_p_e_m_index` dict rebuild
(`mulrel-nel/nel/yago_crosswikis_wiki.py:15-36`) IS the per-run re-pay this
layout removes. Bucket count is a fixed engine constant: both sides must
agree on it for co-location, and at cluster scale it is chosen once per
table family (≈ total-size / target-file-size), not per query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ed_twitter_spark.operators import candidates as cand_ops

# Bucket count for the mention-keyed table family. Both tables of a
# co-located join MUST share it; changing it re-buckets the family.
N_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = N_BUCKETS,
    location: str | None = None,
) -> DataFrame:
    """Materialize ``df`` as a bucketed catalog table; return its scan.

    One shuffle-equivalent pass at write time (each writer task hashes rows
    to bucket files); every later equi-join between tables bucketed on the
    same keys with the same count is Exchange-free. ``location`` keeps the
    data files out of the default warehouse dir (the catalog entry is
    session-scoped; the files persist for cross-run reuse).
    """
    spark = df.sparkSession
    # One writer task per bucket: repartition by the bucket keys uses the
    # same Murmur3 hash as the bucket spec, so each task emits exactly one
    # file per bucket — the layout stays one-sorted-file-per-bucket, which
    # keeps downstream sort-merge joins from re-sorting large buckets.
    writer = (
        df.repartition(n_buckets, *keys)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
    )
    if location is not None:
        writer = writer.option("path", os.path.join(location, table))
    writer.saveAsTable(table)
    return spark.table(table)


def bucketed_candidates(
    spark: SparkSession, sf_dir: str, scratch: str = "/tmp/ed_twitter_bucketed"
) -> DataFrame:
    """J1 via co-located bucketed tables — value-identical to
    `gen_candidates`, Exchange-free join plan.

    Writes mentions and the KB alias table bucketed by ``mention`` (the
    write pass is the amortized one-time cost), then joins the two catalog
    scans. The ``merge`` hint pins sort-merge — the strategy that consumes
    bucketed distribution — so the plan audit is deterministic regardless
    of the session's broadcast threshold.
    """
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators import mentions as mention_ops

    loc = os.path.join(scratch, os.path.basename(os.path.normpath(sf_dir)))
    m = mention_ops.detect_mentions(synth.transcripts(spark, sf_dir))
    kb = synth.kb_alias(spark, sf_dir)
    bm = write_bucketed(m, "bkt_mentions", ["mention"], location=loc)
    bkb = write_bucketed(kb, "bkt_kb_alias", ["mention"], location=loc)
    joined = bm.hint("merge").join(bkb, on="mention", how="left")
    return joined.select(*cand_ops._OUT_COLS)
