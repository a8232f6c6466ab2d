"""Data Selection with Importance Resampling (DSIR) over the documents table.

Implements the hashed-n-gram importance estimator of Xie et al. 2023
("Data Selection for Language Models via Importance Resampling",
NeurIPS 2023 §3): every document is featurized as a bag of unigrams and
bigrams hashed into ``N_BUCKETS`` buckets; a TARGET domain (here: the
``source = 'src0'`` slice of the corpus — in production the user's
high-quality seed set, e.g. Wikipedia + books) and the RAW corpus each
induce a smoothed categorical distribution over buckets, and a document's
importance is

    log w(x) = sum over hashed-feature occurrences f in x of
               [ ln p_target(f) - ln p_raw(f) ]

(the paper's eq. 3 with add-1 smoothing). Selection keeps the top-K
documents; the paper samples with Gumbel noise to avoid near-duplicate
pile-up, which the deterministic rank here replaces (this repo's dedup
ladder handles near-duplicates explicitly, and a deterministic order is
what makes the DuckDB oracle exact — the Gumbel variant is one
``h64``-seeded noise column away, same trick as dataset_sample_temperature).

Scale shape (the reason DSIR beats classifier scoring at 100 TB): the
model is just two bucket-count tables of at most ``N_BUCKETS`` rows — two
map-side-combined aggregations over the token stream, never a shuffle of
the documents themselves. Scoring joins the per-(doc, bucket) counts
(pre-aggregated, so the join input is ≤ docs × distinct-buckets-per-doc
rows) against the BROADCAST log-ratio table, then one groupBy(doc_id).
The only full ordering is over the final per-doc score table (one row per
document); at 10^12 docs the exact ORDER BY ... LIMIT K is TakeOrdered
(per-partition top-K + driver merge of K·P rows), no global sort.

Feature hashing uses the repo's cross-engine md5 bridge
(functions/hashing.h32) so Spark and the DuckDB oracle agree bucket for
bucket. Reference anchor: the reference repo has no corpus-selection
stage at all (its corpus is fixed exports, run_all.sh S1-S11); this is
part of the beyond-reference LLM-data-pipeline surface (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ed_twitter_spark.functions.hashing import TOKS_SQL, h32_col, h32_sql, toks_col

N_BUCKETS = 1024
TARGET_SOURCE = "src0"
TOP_K = 50


def _hashed_feature_occurrences(docs: DataFrame) -> DataFrame:
    """(doc_id, source, b) — one row per unigram/bigram OCCURRENCE, with
    the feature hashed into [0, N_BUCKETS). Bigrams via one JVM zip_with
    over the token array: no self-join, no Python."""
    return docs.select("doc_id", "source", toks_col().alias("tk")).select(
        "doc_id",
        "source",
        F.explode(
            F.concat(
                F.col("tk"),
                F.when(
                    F.size("tk") >= 2,
                    F.expr(
                        "zip_with(slice(tk, 1, size(tk)-1),"
                        " slice(tk, 2, size(tk)-1),"
                        " (a, b) -> concat(a, ' ', b))"
                    ),
                ).otherwise(F.array().cast("array<string>")),
            )
        ).alias("f"),
    ).select(
        "doc_id", "source", F.pmod(h32_col(F.col("f")), F.lit(N_BUCKETS)).alias("b")
    )


def dsir_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, n_feats, dsir_logw) — per-document DSIR log importance.

    Both bucket distributions (raw corpus, target slice) come from the
    same single pass over the hashed-occurrence stream; the log-ratio
    table (≤ N_BUCKETS rows) is broadcast into the per-(doc, bucket)
    count table, so the document axis never shuffles on a feature key.
    """
    occ = _hashed_feature_occurrences(docs)
    db = occ.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    raw = occ.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (
        occ.where(F.col("source") == TARGET_SOURCE)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    totals = occ.agg(
        F.count(F.lit(1)).cast("double").alias("nr"),
        F.sum(
            F.when(F.col("source") == TARGET_SOURCE, F.lit(1)).otherwise(F.lit(0))
        )
        .cast("double")
        .alias("nt"),
    )
    # every bucket seen in any document is present in `raw`; ct defaults 0
    lr = (
        raw.join(tgt, on="b", how="left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce("ct", F.lit(0)) + F.lit(1.0))
                    / (F.col("nt") + F.lit(float(N_BUCKETS)))
                )
                - F.log(
                    (F.col("cr") + F.lit(1.0))
                    / (F.col("nr") + F.lit(float(N_BUCKETS)))
                )
            ).alias("lr"),
        )
    )
    return (
        db.join(F.broadcast(lr), on="b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.round(F.sum(F.col("c") * F.col("lr")), 6).alias("dsir_logw"),
        )
    )


def q_dataset_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K DSIR selection: (doc_id, n_feats, dsir_logw, rank).

    Two-phase top-K: a per-partition row_number prunes each of the P
    shuffle partitions to its local K survivors first, so the final
    unpartitioned ranking window (which Spark executes on a single
    partition) sorts at most K·P rows — never the full per-document
    score table. The global result is identical for any partitioning:
    the true top-K by (dsir_logw desc, doc_id asc) is a subset of the
    union of per-partition top-Ks.
    """
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = dsir_weights(docs).withColumn("_p", F.spark_partition_id())
    key = [F.col("dsir_logw").desc(), F.col("doc_id").asc()]
    local = Window.partitionBy("_p").orderBy(*key)
    survivors = (
        w.withColumn("_r", F.row_number().over(local))
        .where(F.col("_r") <= TOP_K)
        .drop("_p", "_r")
    )
    order = Window.orderBy(*key)
    return (
        survivors.withColumn("rank", F.row_number().over(order).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select("doc_id", "n_feats", "dsir_logw", "rank")
    )


DATASET_DSIR_SQL = f"""
WITH d AS (SELECT doc_id, source, {TOKS_SQL} AS tk FROM documents),
feats AS (
  SELECT doc_id, source,
         list_concat(
           tk,
           list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1])
         ) AS fs
  FROM d
),
occ AS (
  SELECT doc_id, source, {h32_sql('f')} % {N_BUCKETS} AS b
  FROM feats, UNNEST(fs) AS t(f)
),
db AS (SELECT doc_id, b, COUNT(*) AS c FROM occ GROUP BY doc_id, b),
raw AS (SELECT b, COUNT(*) AS cr FROM occ GROUP BY b),
tgt AS (SELECT b, COUNT(*) AS ct FROM occ WHERE source = '{TARGET_SOURCE}' GROUP BY b),
totals AS (
  SELECT COUNT(*) * 1.0 AS nr,
         SUM(CASE WHEN source = '{TARGET_SOURCE}' THEN 1 ELSE 0 END) * 1.0 AS nt
  FROM occ
),
lr AS (
  SELECT raw.b,
         ln((COALESCE(tgt.ct, 0) + 1.0) / (totals.nt + {N_BUCKETS}))
         - ln((raw.cr + 1.0) / (totals.nr + {N_BUCKETS})) AS lr
  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN totals
),
wts AS (
  SELECT db.doc_id,
         CAST(SUM(db.c) AS BIGINT) AS n_feats,
         ROUND(SUM(db.c * lr.lr), 6) AS dsir_logw
  FROM db JOIN lr USING (b)
  GROUP BY db.doc_id
),
ranked AS (
  SELECT doc_id, n_feats, dsir_logw,
         CAST(ROW_NUMBER() OVER (ORDER BY dsir_logw DESC, doc_id ASC) AS BIGINT)
           AS rank
  FROM wts
)
SELECT doc_id, n_feats, dsir_logw, rank FROM ranked WHERE rank <= {TOP_K}
"""
