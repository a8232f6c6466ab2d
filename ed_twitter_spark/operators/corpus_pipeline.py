"""The composed training-data pipeline: one query, five stages, one oracle.

Every stage of the standard pretraining-data flow exists in this repo as
an individually-gated operator; this module composes them into the ONE
query a production run actually executes, with a single end-to-end
DuckDB twin — the demonstration that the operators compose (same
constants, same hashes, same semantics) rather than merely coexist:

  1. quality   — Gopher word-level rule bundle (`textstats.quality_gopher`)
  2. dedup     — exact content-hash keep-min-doc_id, recomputed over the
                 quality survivors (dedup AFTER filtering, the MassiveText
                 order)
  3. decontam  — drop survivors sharing an 8-gram with the eval holdout
                 (docs with doc_id % EVAL_MOD == 0, as in
                 `corpus_filters.decontaminate`)
  4. split     — deterministic 80/10/10 md5-bucket split
                 (`corpus_filters.dataset_split` rule)
  5. pack      — greedy PACK_BUDGET-token bins per source over the TRAIN
                 survivors (`packing.dataset_pack` recurrence)

Output: one row per document — (doc_id, source, status, bin_idx) with
status ∈ {eval_holdout, low_quality, duplicate, contaminated, val, test,
train} resolved in that precedence order, and bin_idx = the packed
training-sequence id for train docs, −1 otherwise.

Scale shape: stages 1–4 are the same plans their standalone operators
audit (one tokenization-wide scan, hash aggregations, a broadcast
semi-join against the holdout gram set, zero-shuffle split); stage 5 is
the shard-parallel pack. The multiply-consumed intermediates (base,
dedup survivors, the split table) carry tracked persists so the
document scan and the Gopher pass execute once, not once per consumer —
at 10^12 turns each arrow past them is one bounded exchange (in the
production DAG these are the checkpointed stage tables of
`plans/pipeline.py`). The composition is where stage-order bugs live (dedup before
vs after filtering changes survivors; contamination must not see
already-dropped docs), which is exactly what the end-to-end oracle pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ed_twitter_spark.caching import persist_tracked
from ed_twitter_spark.functions.hashing import TOKS_SQL, toks_col
from ed_twitter_spark.operators.corpus_filters import DECON_N, EVAL_MOD, _ngrams
from ed_twitter_spark.operators.packing import PACK_BUDGET, _pack_group
from ed_twitter_spark.operators.textstats import QUALITY_GOPHER_SQL, quality_gopher


def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    keep = quality_gopher(spark, sf_dir).select("doc_id", "keep")
    # base / surv_d / splitc each feed multiple downstream consumers;
    # without tracked persists Spark would re-execute the document scan
    # and Gopher pass once per reference (released via release_caches)
    base = persist_tracked(
        docs.join(keep, "doc_id").withColumn(
            "holdout", (F.col("doc_id") % EVAL_MOD) == 0
        )
    )

    # 2. exact dedup over quality survivors (non-holdout)
    surv_q = base.where(~F.col("holdout") & F.col("keep"))
    canon = (
        surv_q.groupBy(F.md5(F.lower("text")).alias("h"))
        .agg(F.min("doc_id").alias("cid"))
    )
    surv_d = persist_tracked(
        surv_q.withColumn("h", F.md5(F.lower("text")))
        .join(canon, "h")
        .where(F.col("doc_id") == F.col("cid"))
        .drop("h", "cid")
    )

    # 3. decontamination of dedup survivors vs the holdout's gram set
    ev_grams = _ngrams(docs.where((F.col("doc_id") % EVAL_MOD) == 0), DECON_N).select(
        "gram"
    ).distinct()
    contaminated = (
        _ngrams(surv_d.select("doc_id", "text"), DECON_N)
        .join(F.broadcast(ev_grams), "gram")
        .select("doc_id")
        .distinct()
    )
    surv_c = surv_d.join(contaminated, "doc_id", "left_anti")

    # 4. split (the dataset_split bucket rule)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    splitc = persist_tracked(
        surv_c.select(
            "doc_id",
            "source",
            split.alias("split"),
            F.size(toks_col()).alias("n_tokens"),
        )
    )

    # 5. pack the train survivors per source
    packed = (
        splitc.where(F.col("split") == "train")
        .select("source", "doc_id", "n_tokens")
        .groupBy("source")
        .applyInPandas(
            _pack_group, schema="source string, doc_id long, n_tokens int, bin_idx long"
        )
        .select("doc_id", "bin_idx")
    )

    status = (
        F.when(F.col("holdout"), "eval_holdout")
        .when(~F.col("keep"), "low_quality")
        .when(F.col("dedup_ok").isNull(), "duplicate")
        .when(F.col("contam").isNotNull(), "contaminated")
        .otherwise(F.col("split"))
    )
    return (
        base.join(
            surv_d.select("doc_id", F.lit(True).alias("dedup_ok")), "doc_id", "left"
        )
        .join(contaminated.withColumn("contam", F.lit(True)), "doc_id", "left")
        .join(splitc.select("doc_id", "split"), "doc_id", "left")
        .join(packed, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            status.alias("status"),
            F.coalesce("bin_idx", F.lit(-1)).alias("bin_idx"),
        )
    )


CORPUS_PIPELINE_SQL = f"""
WITH RECURSIVE
base AS (
  SELECT d.doc_id, d.source, d.text, q.keep,
         (d.doc_id % {EVAL_MOD} = 0) AS holdout
  FROM documents d JOIN ({QUALITY_GOPHER_SQL}) q USING (doc_id)
),
survq AS (SELECT * FROM base WHERE NOT holdout AND keep),
canon AS (
  SELECT md5(lower(text)) AS h, MIN(doc_id) AS cid FROM survq GROUP BY 1
),
survd AS (
  SELECT s.doc_id, s.source, s.text
  FROM survq s JOIN canon c ON md5(lower(s.text)) = c.h AND s.doc_id = c.cid
),
evg AS (
  SELECT DISTINCT array_to_string(toks[i+1 : i+{DECON_N}], ' ') AS gram
  FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents
        WHERE doc_id % {EVAL_MOD} = 0),
       UNNEST(range(0, len(toks) - {DECON_N} + 1)) AS t(i)
  WHERE len(toks) >= {DECON_N}
),
contam AS (
  SELECT DISTINCT g.doc_id
  FROM (
    SELECT DISTINCT doc_id,
           array_to_string(toks[i+1 : i+{DECON_N}], ' ') AS gram
    FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM survd),
         UNNEST(range(0, len(toks) - {DECON_N} + 1)) AS t(i)
    WHERE len(toks) >= {DECON_N}
  ) g JOIN evg USING (gram)
),
survc AS (
  SELECT * FROM survd WHERE doc_id NOT IN (SELECT doc_id FROM contam)
),
splitc AS (
  SELECT doc_id, source,
         CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % 100 < 80 THEN 'train'
              WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % 100 < 90 THEN 'val'
              ELSE 'test' END AS split,
         len({TOKS_SQL}) AS n_tokens
  FROM survc
),
ord AS (
  SELECT doc_id, source, n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM splitc WHERE split = 'train'
),
packed AS (
  SELECT doc_id, source, n_tokens, rn,
         CAST(0 AS BIGINT) AS bin_idx, n_tokens AS cur
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.doc_id, o.source, o.n_tokens, o.rn,
         CASE WHEN p.cur + o.n_tokens > {PACK_BUDGET}
              THEN p.bin_idx + 1 ELSE p.bin_idx END,
         CASE WHEN p.cur + o.n_tokens > {PACK_BUDGET}
              THEN o.n_tokens ELSE p.cur + o.n_tokens END
  FROM packed p JOIN ord o ON o.source = p.source AND o.rn = p.rn + 1
)
SELECT b.doc_id, b.source,
       CASE WHEN b.holdout THEN 'eval_holdout'
            WHEN NOT b.keep THEN 'low_quality'
            WHEN sd.doc_id IS NULL THEN 'duplicate'
            WHEN ct.doc_id IS NOT NULL THEN 'contaminated'
            ELSE sp.split END AS status,
       COALESCE(pk.bin_idx, -1) AS bin_idx
FROM base b
LEFT JOIN (SELECT doc_id FROM survd) sd USING (doc_id)
LEFT JOIN contam ct USING (doc_id)
LEFT JOIN (SELECT doc_id, split FROM splitc) sp USING (doc_id)
LEFT JOIN (SELECT doc_id, bin_idx FROM packed) pk USING (doc_id)
ORDER BY b.doc_id
"""
