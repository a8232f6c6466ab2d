"""S2/S3 — anchor/hyperlink + doc-header extraction from markup, plus JSON
props parsing.

* ``anchor_parse`` — the literal analog of the reference's wiki-dump
  anchor extractor (`parse_wiki_dump_tools.py:6-97`): synthesize
  ``<a href="E">mention</a>`` markup from the documents (every 5th token
  becomes an anchor), then recover (doc_id, ent, mention, anchor_idx)
  with ``regexp_extract_all`` — pure JVM regex, no Python. Includes the
  reference's exclusion filters: list-page (`List of` prefix), fragment
  (`#`) targets (`parse_wiki_dump_tools.py:57-74`), and
  **disambiguation-page** targets — the reference excludes them by
  omission from the name↔id map (`ent_name_id.py:77`,
  ``wiki_disambiguation_pages_index``); here the disambiguation set is
  the deterministic md5 bucket ``h32(ent) % 17 == 0``.
* ``anchor_parse_marked`` — the ``mark_mentions=True`` mode
  (`parse_wiki_dump_tools.py:76-81`): the page text with every *valid*
  anchor wrapped as ``MMSTART{n} mention MMEND{n}`` under a running
  per-page mention counter (invalid anchors collapse to their bare
  mention). Token-stream form: single-space joined, where the reference
  concatenates with padding spaces — same word sequence either way.
* ``doc_titles`` — S3 doc-header extraction
  (`parse_wiki_dump_tools.py:124-143` ``extract_page_entity_title``):
  parse ``<doc id=.. title=..>``, re-resolve the id from the title
  through the engine's name→id mapping, and flag mismatches (the
  reference's "probably a disambiguation or list page" branch).
* ``events_props`` — semi-structured column handling: the events table's
  JSON ``props`` column parsed with the engines' native JSON functions
  (``get_json_object`` / ``json_extract``), typed, and aggregated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ed_twitter_spark.functions.hashing import TOKS_SQL, h32_col, h32_sql, toks_col

DISAMB_MOD = 17  # ent is a "disambiguation page" iff h32(ent) % 17 == 0

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
        # reference exclusions: list pages, same-page fragments, and
        # disambiguation-page targets (absent from the name↔id map)
        .where(
            ~F.col("ent").startswith("List of")
            & ~F.col("ent").contains("#")
            & (h32_col(F.col("ent")) % DISAMB_MOD != 0)
        )
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
  AND {h32_sql('ent')} % {DISAMB_MOD} <> 0
"""


def anchor_parse_marked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, marked) — the page word stream with valid anchors wrapped
    as ``MMSTART{{n}} mention MMEND{{n}}``, n = running valid-anchor count
    (1-based, per page). Per-page window + ordered re-join: one shuffle on
    doc_id, strings built in the JVM."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = docs.select("doc_id", F.posexplode(toks_col()).alias("pos", "t"))
    ent = F.concat(F.lit("E_"), F.col("t"))
    valid = (
        (F.col("pos") % 5 == 0)
        & ~ent.startswith("List of")
        & ~ent.contains("#")
        & (h32_col(ent) % DISAMB_MOD != 0)
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tok = tok.withColumn("v", valid.cast("int")).withColumn("n", F.sum("v").over(w))
    piece = F.when(
        F.col("v") == 1,
        F.format_string("MMSTART%d %s MMEND%d", "n", "t", "n"),
    ).otherwise(F.col("t"))
    return (
        tok.select("doc_id", "pos", piece.alias("piece"))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "piece"))),
                    lambda s: s["piece"],
                ),
                " ",
            ).alias("marked")
        )
    )


ANCHOR_MARKED_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest({TOKS_SQL}) AS t,
         CAST(unnest(range(len({TOKS_SQL}))) AS INTEGER) AS pos
  FROM documents
),
v AS (
  SELECT doc_id, pos, t,
         CASE WHEN pos % 5 = 0
                   AND ('E_' || t) NOT LIKE 'List of%'
                   AND ('E_' || t) NOT LIKE '%#%'
                   AND {h32_sql("'E_' || t")} % {DISAMB_MOD} <> 0
              THEN 1 ELSE 0 END AS valid
  FROM tok
),
n AS (
  SELECT doc_id, pos, t, valid,
         CAST(SUM(valid) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n
  FROM v
)
SELECT doc_id,
       string_agg(CASE WHEN valid = 1
                       THEN 'MMSTART' || n || ' ' || t || ' MMEND' || n
                       ELSE t END, ' ' ORDER BY pos) AS marked
FROM n GROUP BY doc_id
"""


# --- S3: doc-header title extraction ---------------------------------------

_HEADER_SQL = f"""
SELECT doc_id,
       '<doc id="' ||
         CAST(CASE WHEN doc_id % 7 = 0 THEN doc_id
                   ELSE {{ent_id_title}} END AS VARCHAR) ||
         '" url="http://x/?curid=' || CAST(doc_id AS VARCHAR) ||
         '" title="T' || CAST(doc_id AS VARCHAR) || '">' AS header
FROM documents
"""


def doc_titles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, ent_wikiid, title, missing) — parse the synthesized
    ``<doc id=..>`` headers (every 7th page carries a stale id, the
    reference's disambiguation/list mismatch case): extract id + title
    with regex, re-resolve the id from the title, flag mismatches and
    return the re-resolved id — exactly ``extract_page_entity_title``."""
    from ed_twitter_spark import synth

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    title = F.concat(F.lit("T"), F.col("doc_id").cast("string"))
    id_attr = F.when(F.col("doc_id") % 7 == 0, F.col("doc_id")).otherwise(
        synth.ent_id_col(title)
    )
    header = F.format_string(
        '<doc id="%s" url="http://x/?curid=%s" title="%s">',
        id_attr.cast("string"),
        F.col("doc_id").cast("string"),
        title,
    )
    h = docs.select("doc_id", header.alias("header"))
    parsed_id = F.regexp_extract("header", r'<doc id="(\d+)"', 1).cast("long")
    parsed_title = F.regexp_extract("header", r' title="([^"]*)">', 1)
    resolved = synth.ent_id_col(parsed_title)
    return h.select(
        "doc_id",
        resolved.alias("ent_wikiid"),
        parsed_title.alias("title"),
        (parsed_id != resolved).cast("int").alias("missing"),
    )


def doc_titles_sql() -> str:
    from ed_twitter_spark import synth

    header = _HEADER_SQL.format(
        ent_id_title=synth.ent_id_expr_sql("'T' || CAST(doc_id AS VARCHAR)")
    )
    return f"""
WITH h AS ({header}),
p AS (
  SELECT doc_id,
         CAST(regexp_extract(header, '<doc id="(\\d+)"', 1) AS BIGINT) AS parsed_id,
         regexp_extract(header, ' title="([^"]*)">', 1) AS title
  FROM h
)
SELECT doc_id,
       {synth.ent_id_expr_sql('title')} AS ent_wikiid,
       title,
       CASE WHEN parsed_id <> {synth.ent_id_expr_sql('title')} THEN 1 ELSE 0 END AS missing
FROM p
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
