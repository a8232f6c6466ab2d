"""S2 — anchor/hyperlink extraction from markup, plus JSON props parsing.

* ``anchor_parse`` — the literal analog of the reference's wiki-dump
  anchor extractor (`parse_wiki_dump_tools.py:6-97`): synthesize
  ``<a href="E">mention</a>`` markup from the documents (every 5th token
  becomes an anchor), then recover (doc_id, ent, mention, anchor_idx)
  with ``regexp_extract_all`` — pure JVM regex, no Python. Includes the
  reference's exclusion filters: list-page (`List of` prefix) and
  fragment (`#`) targets are dropped (`parse_wiki_dump_tools.py:57-74`).
* ``events_props`` — semi-structured column handling: the events table's
  JSON ``props`` column parsed with the engines' native JSON functions
  (``get_json_object`` / ``json_extract``), typed, and aggregated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ed_twitter_spark.functions.hashing import TOKS_SQL, toks_col

_MARKUP_SQL = f"""
SELECT doc_id,
       array_to_string(list_transform({TOKS_SQL}, (t, i) ->
         CASE WHEN (i - 1) % 5 = 0
              THEN '<a href="E_' || t || '">' || t || '</a>'
              ELSE t END), ' ') AS markup
FROM documents
"""

_ANCHOR_RE = '<a href="([^"#]*)">([^<]*)</a>'


def _markup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = toks_col()
    marked = F.transform(
        toks,
        lambda t, i: F.when(
            i % 5 == 0, F.concat(F.lit('<a href="E_'), t, F.lit('">'), t, F.lit("</a>"))
        ).otherwise(t),
    )
    return docs.select("doc_id", F.array_join(marked, " ").alias("markup"))


def anchor_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, anchor_idx, ent, mention) recovered from markup text."""
    m = _markup(spark, sf_dir)
    ents = F.regexp_extract_all("markup", F.lit(_ANCHOR_RE), 1)
    mentions = F.regexp_extract_all("markup", F.lit(_ANCHOR_RE), 2)
    pairs = F.arrays_zip(ents, mentions)
    return (
        m.select("doc_id", F.posexplode(pairs).alias("anchor_idx", "p"))
        .select(
            "doc_id",
            F.col("anchor_idx").cast("int").alias("anchor_idx"),
            F.col("p.0").alias("ent"),
            F.col("p.1").alias("mention"),
        )
        # reference exclusions: list pages and same-page fragments
        .where(~F.col("ent").startswith("List of") & ~F.col("ent").contains("#"))
    )


ANCHOR_PARSE_SQL = f"""
WITH m AS ({_MARKUP_SQL}),
hits AS (
  SELECT doc_id,
         regexp_extract_all(markup, '{_ANCHOR_RE}', 1) AS ents,
         regexp_extract_all(markup, '{_ANCHOR_RE}', 2) AS mentions
  FROM m
),
ex AS (
  SELECT doc_id,
         CAST(unnest(range(len(ents))) AS INTEGER) AS anchor_idx,
         unnest(ents) AS ent,
         unnest(mentions) AS mention
  FROM hits
)
SELECT doc_id, anchor_idx, ent, mention
FROM ex
WHERE ent NOT LIKE 'List of%' AND ent NOT LIKE '%#%'
"""


def events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event JSON field extraction + per-type aggregate of the typed
    value: (event_type, n, sum_k)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


EVENTS_PROPS_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT)                                   AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))     AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))     AS max_k
FROM events GROUP BY event_type
"""
