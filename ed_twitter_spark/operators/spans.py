"""W6 — B/I span merge (CoNLL-style contiguous-mention assembly).

The reference assembles multi-token mentions from per-token B/I tags with
a stateful accumulation loop (`mulrel-nel/nel/dataset.py:64-74`,
`conll_from_tweets.py:96-111`). Distributed, that loop is the classic
gaps-and-islands pattern: a ``lag``-based new-segment flag cumulative-
summed into span ids, then one groupBy per span — two window passes and
one aggregation, all JVM-side, partitioned by document.

The tag stream here is synthesized deterministically from ``documents``
(B at pos%7==0, I at pos%7∈{1,2}, O otherwise), standing in for a real
tagger's output with the same downstream algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ed_twitter_spark.functions.hashing import TOKS_SQL, toks_col


def _tagged_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = docs.select("doc_id", F.posexplode(toks_col()).alias("pos", "tok"))
    tag = (
        F.when(F.col("pos") % 7 == 0, "B")
        .when(F.col("pos") % 7 <= 2, "I")
        .otherwise("O")
    )
    return t.withColumn("tag", tag)


def bio_span_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, span_id, mention, start_pos, n_toks) — one row per merged
    B/I span, mention = space-joined tokens in position order."""
    t = _tagged_tokens(spark, sf_dir).where(F.col("tag") != "O")
    w = Window.partitionBy("doc_id").orderBy("pos")
    # new span at a B tag, or at an I whose predecessor token is absent
    # (dataset.py:64-74 starts a fresh mention in both cases)
    new_span = (
        (F.col("tag") == "B") | (F.lag("pos").over(w) != F.col("pos") - 1)
    ).cast("int")
    t = t.withColumn("new_span", F.coalesce(new_span, F.lit(1)))
    t = t.withColumn("span_id", F.sum("new_span").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        t.groupBy("doc_id", "span_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("mention"),
            F.min("pos").cast("int").alias("start_pos"),
            F.count(F.lit(1)).alias("n_toks"),
        )
    )


BIO_SPAN_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest({TOKS_SQL}) AS tok,
         CAST(unnest(range(len({TOKS_SQL}))) AS INTEGER) AS pos
  FROM documents
),
tagged AS (
  SELECT *, CASE WHEN pos % 7 = 0 THEN 'B'
                 WHEN pos % 7 <= 2 THEN 'I'
                 ELSE 'O' END AS tag
  FROM tok
),
bi AS (SELECT * FROM tagged WHERE tag <> 'O'),
flagged AS (
  SELECT *, CASE WHEN tag = 'B'
                   OR COALESCE(LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos), -2)
                      <> pos - 1
                 THEN 1 ELSE 0 END AS new_span
  FROM bi
),
spans AS (
  SELECT *, SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS span_id
  FROM flagged
)
SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
       string_agg(tok, ' ' ORDER BY pos) AS mention,
       CAST(MIN(pos) AS INTEGER)         AS start_pos,
       CAST(COUNT(*) AS BIGINT)          AS n_toks
FROM spans GROUP BY doc_id, span_id
"""


# ---------------------------------------------------------------------------
# J6 — coref containment pairs over merged spans
# ---------------------------------------------------------------------------


def coref_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, short_span, long_span, short_mention, long_mention) — the
    reference's coref signal: a mention whose word sequence is contained,
    word-aligned, in a strictly longer mention of the same document
    (`mulrel-nel/nel/dataset.py:184-207` ``find_coref``; persons-only there,
    all spans here). The containment test is the padded-LIKE word-boundary
    match; the join is per-document (doc_id equi-key), so cluster-wide cost
    is Σ spans_per_doc², bounded by document size — never a global product.
    """
    s = bio_span_merge(spark, sf_dir)
    a = s.select(
        "doc_id",
        F.col("span_id").alias("short_span"),
        F.col("mention").alias("short_mention"),
        F.col("n_toks").alias("nt_short"),
    )
    b = s.select(
        "doc_id",
        F.col("span_id").alias("long_span"),
        F.col("mention").alias("long_mention"),
        F.col("n_toks").alias("nt_long"),
    )
    padded_long = F.concat(F.lit(" "), F.col("long_mention"), F.lit(" "))
    padded_short = F.concat(F.lit(" "), F.col("short_mention"), F.lit(" "))
    return (
        a.join(b, "doc_id")
        .where(
            (F.col("nt_short") < F.col("nt_long"))
            & padded_long.contains(padded_short)
        )
        .select("doc_id", "short_span", "long_span", "short_mention", "long_mention")
    )


COREF_SQL_TEMPLATE = """
WITH spans AS ({spans_sql})
SELECT a.doc_id, a.span_id AS short_span, b.span_id AS long_span,
       a.mention AS short_mention, b.mention AS long_mention
FROM spans a JOIN spans b
  ON a.doc_id = b.doc_id AND a.n_toks < b.n_toks
 AND strpos(' ' || b.mention || ' ', ' ' || a.mention || ' ') > 0
"""


def coref_containment_sql() -> str:
    return COREF_SQL_TEMPLATE.format(spans_sql=BIO_SPAN_SQL)
