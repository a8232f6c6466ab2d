"""Byte-pair-encoding tokenizer training over the corpus (Sennrich,
Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
Subword Units") — the canonical LLM-tokenizer learning loop, expressed
as deterministic DataFrame algebra with an unrolled-CTE DuckDB twin.

* ``bpe_train`` — N_MERGES rounds of: count adjacent symbol pairs over
  the WORD-FREQUENCY table (not the corpus: the classic Sennrich setup
  aggregates the corpus once into (word, freq) and trains on that —
  distinct words grow Heaps-sublinearly, so the iterated state is tiny
  relative to the token stream), pick the most frequent pair with a
  total (cnt DESC, a, b) tie-break, splice it into every word's symbol
  string, repeat. Emits one row per merge: (round, a, b, merged, cnt).

* ``bpe_encode`` — applies the learned merge table back to the corpus:
  per-document whitespace-token count vs BPE-token count and the
  tokens-per-word compression ratio (the number a tokenizer ablation
  actually reads).

Determinism across engines: pair counts are BIGINT sums of BIGINT word
frequencies (exact, order-free); the argmax tie-break is total; the
merge step is a literal (not regex) string replace, and both engines'
``replace`` scan left-to-right non-overlapping — which is exactly BPE's
greedy within-word merge order ("a a a" + merge (a,a) -> "aa a").
Symbols are stored bracket-wrapped ("low" -> "[l][o][w]") so a merge
pattern "[l][o]" can never match across token boundaries or inside a
multi-char symbol; the word filter ``^[a-z0-9]+$`` keeps the bracket
alphabet out of the symbol space (and is the usual pre-tokenizer
normalization).

Plan shape at 10^12 turns: ONE corpus scan (the word-count aggregation,
map-side combined); every round after that touches only the vocab
table — an explode of per-word symbol arrays into adjacent pairs, one
map-side-combined SUM, a 1-row TakeOrdered argmax broadcast back, and a
projection. Each round's vocab is localCheckpoint-ed so the chained
lineage (round k+1 reads round k twice: via the argmax and via the
splice) is materialized once and the plan tree stays flat. Nothing here is quadratic and the corpus
is never rescanned.

The reference has no tokenizer training (its vocab is a fixture input,
SURVEY §2.1); this is the scale path for producing that input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ed_twitter_spark.functions.hashing import TOKS_SQL, toks_col

N_MERGES = 8
# keeps '[' / ']' (the symbol delimiters) out of the symbol alphabet
_WORD_RE = "^[a-z0-9]+$"


def _word_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq, symstr) — the Sennrich word-frequency table with each
    word exploded to bracket-wrapped single-char symbols."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = docs.select(F.explode(toks_col()).alias("word")).where(
        F.col("word").rlike(_WORD_RE)
    )
    return (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("symstr", F.regexp_replace("word", "(.)", "[$1]"))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the symbol strings, weighted by word
    frequency (overlapping pairs counted, as in the reference algorithm)."""
    syms = F.split(F.expr("substring(symstr, 2, length(symstr) - 2)"), r"\]\[")
    v = vocab.select("freq", syms.alias("syms")).where(F.size("syms") >= 2)
    pairs = F.expr(
        "transform(sequence(0, size(syms) - 2),"
        " i -> named_struct('a', syms[i], 'b', syms[i + 1]))"
    )
    return (
        v.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def bpe_chain(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> tuple[DataFrame, DataFrame]:
    """Run the merge loop; returns (merge table, final vocab).

    merge table: (round, a, b, merged, cnt) — one row per round.
    final vocab: (word, freq, symstr) after all merges applied.
    """
    # each round reads the previous round's vocab TWICE (argmax + splice),
    # so the analyzed plan doubles per round without an eager cut —
    # localCheckpoint truncates the lineage like the Lloyd/PQ loops do
    vocab = _word_vocab(spark, sf_dir).localCheckpoint()
    rounds: list[DataFrame] = []
    for k in range(1, n_merges + 1):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .localCheckpoint()  # 1 row
        )
        rounds.append(
            best.select(
                F.lit(k).alias("round"),
                "a",
                "b",
                F.concat("a", "b").alias("merged"),
                "cnt",
            )
        )
        vocab = (
            vocab.crossJoin(F.broadcast(best.select("a", "b")))
            .select(
                "word",
                "freq",
                F.expr(
                    "replace(symstr, concat('[', a, '][', b, ']'),"
                    " concat('[', a, b, ']'))"
                ).alias("symstr"),
            )
            .localCheckpoint()
        )
    merges = rounds[0]
    for r in rounds[1:]:
        merges = merges.unionByName(r)
    return merges, vocab


def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = bpe_chain(spark, sf_dir)
    return merges


def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_words, n_bpe, tokens_per_word) — the learned merges
    applied back to the corpus. One corpus re-scan joined against the
    final (word -> symbol count) vocab; at 10^12 turns the vocab side is
    the broadcast candidate and AQE picks the strategy (same size
    selection question as the J1 KB join, candidates.py)."""
    _, vocab = bpe_chain(spark, sf_dir)
    n_sym = F.size(
        F.split(F.expr("substring(symstr, 2, length(symstr) - 2)"), r"\]\[")
    )
    vtab = vocab.select("word", n_sym.alias("n_sym"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = docs.select("doc_id", F.explode(toks_col()).alias("word")).where(
        F.col("word").rlike(_WORD_RE)
    )
    return (
        w.join(vtab, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_bpe"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_bpe",
            F.round(F.col("n_bpe") / F.col("n_words"), 6).alias("tokens_per_word"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB twins — the merge loop unrolled round by round (MATERIALIZED per
# stage: each round reads the previous twice, via the argmax and the splice)
# ---------------------------------------------------------------------------


def _chain_ctes(n_merges: int) -> str:
    parts = [
        f"""tok AS (
  SELECT unnest({TOKS_SQL}) AS word FROM documents
),
v0 AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
         regexp_replace(word, '(.)', '[\\1]', 'g') AS symstr
  FROM tok WHERE regexp_matches(word, '{_WORD_RE}')
  GROUP BY word
)"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f"""p{k} AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (
    SELECT freq,
           string_split_regex(substr(symstr, 2, length(symstr) - 2),
                              '\\]\\[') AS syms
    FROM v{k - 1}
  ) s, UNNEST(range(1, len(syms))) AS u(i)
  GROUP BY 1, 2
),
b{k} AS MATERIALIZED (SELECT a, b, cnt FROM p{k} ORDER BY cnt DESC, a, b LIMIT 1),
v{k} AS MATERIALIZED (
  SELECT word, freq,
         replace(symstr,
                 '[' || (SELECT a FROM b{k}) || '][' || (SELECT b FROM b{k}) || ']',
                 '[' || (SELECT a || b FROM b{k}) || ']') AS symstr
  FROM v{k - 1}
)"""
        )
    return ",\n".join(parts)


def bpe_train_oracle_sql(n_merges: int = N_MERGES) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS INTEGER) AS round, a, b, a || b AS merged, cnt FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    return f"WITH {_chain_ctes(n_merges)}\n{union}"


def bpe_encode_oracle_sql(n_merges: int = N_MERGES) -> str:
    return f"""WITH {_chain_ctes(n_merges)},
enc AS MATERIALIZED (
  SELECT word,
         len(string_split_regex(substr(symstr, 2, length(symstr) - 2),
                                '\\]\\[')) AS n_sym
  FROM v{n_merges}
),
dw AS (
  SELECT doc_id, unnest({TOKS_SQL}) AS word FROM documents
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT)   AS n_words,
       CAST(SUM(n_sym) AS BIGINT) AS n_bpe,
       ROUND(SUM(n_sym) * 1.0 / COUNT(*), 6) AS tokens_per_word
FROM dw JOIN enc USING (word)
WHERE regexp_matches(word, '{_WORD_RE}')
GROUP BY doc_id
"""


def bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(symbol, n_words, freq) — the trained tokenizer's symbol inventory:
    every post-merge symbol with the number of distinct words containing
    it and its corpus-weighted occurrence count. This is the artifact a
    tokenizer build actually ships (merges + vocab); one explode over the
    final vocab table, map-side combined."""
    _, vocab = bpe_chain(spark, sf_dir)
    syms = F.split(F.expr("substring(symstr, 2, length(symstr) - 2)"), r"\]\[")
    return (
        vocab.select("word", "freq", F.explode(syms).alias("symbol"))
        .groupBy("symbol")
        .agg(
            F.countDistinct("word").cast("long").alias("n_words"),
            F.sum("freq").cast("long").alias("freq"),
        )
    )


def bpe_vocab_oracle_sql(n_merges: int = N_MERGES) -> str:
    return f"""WITH {_chain_ctes(n_merges)}
SELECT symbol,
       CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words,
       CAST(SUM(freq) AS BIGINT)            AS freq
FROM (
  SELECT word, freq,
         unnest(string_split_regex(substr(symstr, 2, length(symstr) - 2),
                                   '\\]\\[')) AS symbol
  FROM v{n_merges}
)
GROUP BY symbol
"""
