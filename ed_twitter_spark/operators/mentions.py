"""Mention detection + context windows over transcripts.

Turn-local contexts follow the reference's tweets variant, which splits the
whole tweet around the mention into left/right context strings
(`deep-ed-pytorch/data_gen/gen_test_train_data/gen_from_tweets.py:156-168`);
a turn plays the role of a tweet. The ±100-token *conversation-level* window
(`gen_aida_train.py:113-127`) is built separately in the kernel path
(operators/windows.py) where token streams cross turn boundaries.

Everything here is pure DataFrame algebra — posexplode + slice — so Catalyst
prunes columns and pushes the length filter into the scan; no Python runs
per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ed_twitter_spark.synth import MENTION_MIN_LEN


def detect_mentions(transcripts_df: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, mention_idx, mention, lctx, rctx, doc_id).

    mention_idx is the 0-based token position within the turn (counting all
    tokens, like the reference's word offsets).
    """
    toks = transcripts_df.select(
        "conv_id",
        "turn_idx",
        "doc_id",
        F.split("text", r"\s+").alias("toks"),
    )
    exploded = toks.select(
        "conv_id",
        "turn_idx",
        "doc_id",
        "toks",
        F.posexplode("toks").alias("mention_idx", "mention"),
    ).where(F.length("mention") >= MENTION_MIN_LEN)
    return exploded.select(
        "conv_id",
        "turn_idx",
        F.col("mention_idx").cast("int").alias("mention_idx"),
        "mention",
        F.array_join(F.slice("toks", 1, F.col("mention_idx")), " ").alias("lctx"),
        F.array_join(
            F.slice(
                "toks",
                F.col("mention_idx") + 2,
                F.size("toks") - F.col("mention_idx") - 1,
            ),
            " ",
        ).alias("rctx"),
        "doc_id",
    )


MENTIONS_SQL_TEMPLATE = """
WITH transcripts AS ({transcripts_sql}),
tk AS (
  SELECT conv_id, turn_idx, doc_id,
         string_split_regex(text, '\\s+') AS toks
  FROM transcripts
),
m AS (
  SELECT conv_id, turn_idx, doc_id, toks,
         unnest(toks) AS mention,
         CAST(unnest(range(len(toks))) AS INTEGER) AS mention_idx
  FROM tk
)
SELECT conv_id, turn_idx, mention_idx, mention,
       COALESCE(array_to_string(list_slice(toks, 1, mention_idx), ' '), '')             AS lctx,
       COALESCE(array_to_string(list_slice(toks, mention_idx + 2, len(toks)), ' '), '') AS rctx,
       doc_id
FROM m
WHERE length(mention) >= {min_len}
"""


def mentions_sql() -> str:
    from ed_twitter_spark.synth import TRANSCRIPTS_SQL

    return MENTIONS_SQL_TEMPLATE.format(
        transcripts_sql=TRANSCRIPTS_SQL, min_len=MENTION_MIN_LEN
    )
