"""SFT-pair extraction and chat-template rendering over transcripts.

Neither exists in the reference (it links mentions and stops); both are
the first post-KG consumers a training-data pipeline bolts onto the
transcript table (input_hint schema: conv_id, turn_idx, role, text,
tool, ts):

* ``sft_pairs`` — (prompt, response) supervised-fine-tuning pairs: each
  ``user`` turn paired with the NEXT ``assistant`` turn in the same
  conversation (tool turns in between are skipped, exactly how agent
  traces are mined for SFT). One window pass computes the answer turn
  index; one self-join on (conv_id, turn_idx) attaches the response
  text. Both sides hash-partition on conv_id, so the join reuses the
  window's shuffle — at 10^12 turns this is one Exchange total.
* ``chat_render`` — per-conversation chat-template rendering truncated
  to the LAST ``RENDER_LAST_TURNS`` turns ("role: text" lines joined by
  newline) — the context-assembly step that turns a transcript table
  into model-ready training strings. Implemented as one bounded
  aggregation per conversation: row_number from the conversation tail
  caps the collected rows, so a viral million-turn conversation
  contributes at most RENDER_LAST_TURNS rows to the groupBy — the
  aggregation state is O(K), never O(conversation).

Cross-engine exactness: outputs are strings, ints and exact counts —
no floats anywhere, so the DuckDB twins hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ed_twitter_spark import synth

RENDER_LAST_TURNS = 8


def sft_pairs_df(t: DataFrame) -> DataFrame:
    """(conv_id, prompt_turn_idx, prompt, response_turn_idx, response,
    prompt_tokens, response_tokens) — one row per user turn that has a
    later assistant turn in its conversation."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    ans_idx = F.min(
        F.when(F.col("role") == "assistant", F.col("turn_idx"))
    ).over(w)
    prompts = (
        t.withColumn("response_turn_idx", ans_idx)
        .where((F.col("role") == "user") & F.col("response_turn_idx").isNotNull())
        .select(
            "conv_id",
            F.col("turn_idx").alias("prompt_turn_idx"),
            F.col("text").alias("prompt"),
            "response_turn_idx",
        )
    )
    answers = t.select(
        "conv_id",
        F.col("turn_idx").alias("response_turn_idx"),
        F.col("text").alias("response"),
    )
    return (
        prompts.join(answers, on=["conv_id", "response_turn_idx"])
        .select(
            "conv_id",
            "prompt_turn_idx",
            "prompt",
            "response_turn_idx",
            "response",
            F.size(F.split("prompt", r"\s+")).cast("long").alias("prompt_tokens"),
            F.size(F.split("response", r"\s+")).cast("long").alias("response_tokens"),
        )
    )


def sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sft_pairs_df(synth.transcripts(spark, sf_dir))


SFT_PAIRS_SQL = f"""
WITH t AS ({synth.TRANSCRIPTS_SQL}),
nxt AS (
  SELECT conv_id, turn_idx, role, text,
         MIN(CASE WHEN role = 'assistant' THEN turn_idx END)
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS response_turn_idx
  FROM t
)
SELECT u.conv_id,
       u.turn_idx                                    AS prompt_turn_idx,
       u.text                                        AS prompt,
       u.response_turn_idx,
       a.text                                        AS response,
       CAST(len(string_split_regex(u.text, '\\s+')) AS BIGINT) AS prompt_tokens,
       CAST(len(string_split_regex(a.text, '\\s+')) AS BIGINT) AS response_tokens
FROM nxt u
JOIN t a ON a.conv_id = u.conv_id AND a.turn_idx = u.response_turn_idx
WHERE u.role = 'user' AND u.response_turn_idx IS NOT NULL
"""


def chat_render_df(t: DataFrame, last_turns: int = RENDER_LAST_TURNS) -> DataFrame:
    """(conv_id, n_turns_total, n_turns_rendered, rendered, render_chars)
    — the last ``last_turns`` turns rendered as "role: text" lines.

    row_number DESC bounds the per-conversation aggregation state before
    the groupBy; sort_array on (turn_idx, line) restores turn order
    inside each group without a second shuffle (same conv_id hash
    partitioning carries from the window into the aggregation)."""
    w_desc = Window.partitionBy("conv_id").orderBy(F.col("turn_idx").desc())
    w_all = Window.partitionBy("conv_id")
    kept = (
        t.withColumn("rn_from_end", F.row_number().over(w_desc))
        .withColumn("n_turns_total", F.count(F.lit(1)).over(w_all))
        .where(F.col("rn_from_end") <= last_turns)
    )
    line = F.concat_ws(": ", "role", "text")
    return (
        kept.groupBy("conv_id", "n_turns_total")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns_rendered"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct(F.col("turn_idx"), line.alias("line")))),
                    lambda s: s.line,
                ),
                "\n",
            ).alias("rendered"),
        )
        .select(
            "conv_id",
            F.col("n_turns_total").cast("long").alias("n_turns_total"),
            "n_turns_rendered",
            "rendered",
            F.length("rendered").cast("long").alias("render_chars"),
        )
    )


def chat_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chat_render_df(synth.transcripts(spark, sf_dir))


CHAT_RENDER_SQL = f"""
WITH t AS ({synth.TRANSCRIPTS_SQL}),
k AS (
  SELECT conv_id, turn_idx, role || ': ' || text AS line,
         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx DESC)
           AS rn_from_end,
         COUNT(*) OVER (PARTITION BY conv_id) AS n_turns_total
  FROM t
)
SELECT conv_id,
       CAST(n_turns_total AS BIGINT)            AS n_turns_total,
       CAST(COUNT(*) AS BIGINT)                 AS n_turns_rendered,
       string_agg(line, chr(10) ORDER BY turn_idx) AS rendered,
       CAST(length(string_agg(line, chr(10) ORDER BY turn_idx)) AS BIGINT)
         AS render_chars
FROM k
WHERE rn_from_end <= {RENDER_LAST_TURNS}
GROUP BY conv_id, n_turns_total
"""
