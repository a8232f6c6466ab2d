"""Text-analysis operators for training-data pipelines over ``documents``.

Beyond the reference's own operator set: the per-document quality/selection
signals a large-scale pretraining-data pipeline computes before dedup and
filtering. All four are pure JVM column algebra (no Python in the hot
path), so they ride whole-stage codegen and scan-prune to exactly the
``text`` column at any scale:

* ``text_stats``    — token/char counts, stopword ratio, mean token length,
                      a monotone quality score, and n-gram-heuristic
                      language ID (stopword hit-rate over the English
                      function-word list the reference ships,
                      `mulrel-nel/nel/utils.py:7-41`).
* ``token_counts``  — whitespace tokens + a BPE-ish subword segmentation
                      count (`[a-z]{1,4}` chunks + digit runs + residue),
                      the standard proxy for tokenizer cost estimation.
* ``doc_fingerprint`` — order-sensitive polynomial rolling hash over token
                      hashes (position-weighted sum mod 2^61), the cheap
                      containment/identity fingerprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ed_twitter_spark.functions.hashing import TOKS_SQL, h32_col, h32_sql, toks_col
from ed_twitter_spark.functions.text import STOPWORDS

_MOD = (1 << 61) - 1
_BPE_RE = "[a-z]{1,4}|[0-9]+|[^a-z0-9]"

# SQL array literal of the stopword list (307 words — constant-folded by
# both engines)
_SW_SQL = "[" + ", ".join(f"'{w}'" for w in sorted(STOPWORDS)) + "]"


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token/char counts, ratios, and a monotone quality score.

    Ratio columns are integer-MICRO-UNIT derived: round-to-integer of
    ns·10⁶/n, then one division by the 10⁶ constant. Fractional
    ROUND(x, 6) is deliberately absent — Spark (BigDecimal HALF_UP) and
    DuckDB (std::round of x·10⁶) disagree when the value sits on a 6-dp
    midpoint, and the quality formula MANUFACTURES midpoints (a 6-dp
    pre-rounded ratio × 5 × a 2-dp saturation term lands on .xxx0015
    for e.g. an 85-token / 8-stopword doc — caught live by the sf0.1
    sweep). Round-to-INTEGER of the same shared double is engine-safe
    (no second scaling), and the quality score is then pure integer
    algebra over q_u = min(n,100)·(5·10⁵ + min(5·10⁵, 5·sr_u)) with one
    exact /10⁸ at the end; the language gate compares sr_u against the
    integer threshold 30000."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = toks_col()
    sw = F.lit(sorted(STOPWORDS)).cast("array<string>")
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    sum_len = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    avg_u = F.round(sum_len * F.lit(1000000.0) / n_tok).cast("long")
    sr_u = F.round(n_stop * F.lit(1000000.0) / n_tok).cast("long")
    q_u = F.least(n_tok, F.lit(100)).cast("long") * (
        F.lit(500000) + F.least(F.lit(500000), F.lit(5) * sr_u)
    )
    lang_pred = F.when(sr_u >= 30000, F.lit("en")).otherwise(F.lit("unk"))
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        (avg_u / F.lit(1000000.0)).alias("avg_token_len"),
        (sr_u / F.lit(1000000.0)).alias("stopword_ratio"),
        (q_u / F.lit(100000000.0)).alias("quality"),
        lang_pred.alias("lang_pred"),
    )


_NS_SQL = f"len(list_filter(toks, x -> list_contains({_SW_SQL}, lower(x))))"

TEXT_STATS_SQL = f"""
WITH t AS (SELECT doc_id, text, {TOKS_SQL} AS toks FROM documents),
u AS (
  SELECT doc_id, text, toks,
         CAST(ROUND(list_sum(list_transform(toks, x -> length(x)))
                    * 1000000.0 / len(toks)) AS BIGINT) AS avg_u,
         CAST(ROUND({_NS_SQL} * 1000000.0 / len(toks)) AS BIGINT) AS sr_u
  FROM t
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT)    AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       avg_u / 1000000.0            AS avg_token_len,
       sr_u / 1000000.0             AS stopword_ratio,
       (CAST(LEAST(len(toks), 100) AS BIGINT)
        * (500000 + LEAST(500000, 5 * sr_u))) / 100000000.0 AS quality,
       CASE WHEN sr_u >= 30000 THEN 'en' ELSE 'unk' END AS lang_pred
FROM u
"""


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.size(toks_col()).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_BPE_RE), 0))
        .cast("long")
        .alias("bpe_tokens"),
    )


TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
       CAST(len({TOKS_SQL}) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS BIGINT) AS bpe_tokens
FROM documents
"""


def corpus_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-count distribution: n_docs, p50/p90/p99, max.

    The quantile profile is what sizes the physical plan at scale —
    ``maxPartitionBytes`` and Arrow batch counts are chosen against p99
    document length, not the mean. Exact interpolated percentiles (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, both type-7), computed in
    one map-side-combined aggregation grouped by the language-ID signal.
    """
    stats = text_stats(spark, sf_dir)
    return stats.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.expr("percentile(n_tokens, 0.5)"), 6).alias("p50_tokens"),
        F.round(F.expr("percentile(n_tokens, 0.9)"), 6).alias("p90_tokens"),
        F.round(F.expr("percentile(n_tokens, 0.99)"), 6).alias("p99_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


CORPUS_QUANTILES_SQL = f"""
WITH ts AS ({TEXT_STATS_SQL})
SELECT lang_pred,
       CAST(COUNT(*) AS BIGINT)                 AS n_docs,
       ROUND(quantile_cont(n_tokens, 0.5), 6)   AS p50_tokens,
       ROUND(quantile_cont(n_tokens, 0.9), 6)   AS p90_tokens,
       ROUND(quantile_cont(n_tokens, 0.99), 6)  AS p99_tokens,
       MAX(n_tokens)                            AS max_tokens
FROM ts GROUP BY lang_pred
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # Modular fold over the token array: each (pos+1)*h32 term is reduced
    # mod 2^61-1 before accumulation and the accumulator is re-reduced per
    # step, so it stays < 2^62 and the int64 sum cannot wrap on long
    # documents (a plain SUM wraps past ~90k tokens while DuckDB's SUM
    # promotes to HUGEINT — a silent cross-engine divergence). Per-row
    # array algebra: no explode, no shuffle.
    mod = F.lit(_MOD)
    terms = F.transform(
        toks_col(),
        lambda t, i: ((i + 1).cast("long") * h32_col(t)) % mod,
    )
    fp = F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: (a + x) % mod)
    return docs.select("doc_id", fp.alias("fingerprint"))


DOC_FINGERPRINT_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest({TOKS_SQL}) AS tok,
         CAST(unnest(range(len({TOKS_SQL}))) AS BIGINT) AS pos
  FROM documents
)
SELECT doc_id,
       CAST(SUM((pos + 1) * {h32_sql('tok')} % {_MOD}) % {_MOD} AS BIGINT) AS fingerprint
FROM tok GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# repetition-based quality filter (the Gopher/MassiveText signals)
# ---------------------------------------------------------------------------

# keep thresholds (fraction of n-grams): documents above either bound are
# the "looping text" failure mode every pretraining pipeline drops —
# repetition signals of the MassiveText quality rules (Rae et al. 2021,
# "Scaling Language Models", table A1).
DUP_2GRAM_MAX = 0.20
DUP_3GRAM_MAX = 0.18


def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals: duplicate / most-frequent n-gram
    fractions for word 2-grams and 3-grams, plus the keep/drop decision.

    * ``dup_{n}gram_frac`` — 1 − distinct/total n-grams (mass lost to any
      repetition);
    * ``top_{n}gram_frac`` — occurrences of the single most frequent
      n-gram / total (the "same phrase looped" detector);
    * ``keep`` — both dup fractions within the MassiveText-style bounds.

    Each n-gram stream is explode → two-level aggregation: per (doc, gram)
    counts with map-side combine, then a per-doc rollup — the group key
    cardinality is the document's distinct-gram count, so state stays
    document-sized and the shuffle moves (doc, gram, count) triples, never
    raw text. Docs with < 3 tokens carry no 3-gram signal and are dropped
    in both engines.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select("doc_id", toks_col().alias("toks")).where(
        F.size("toks") >= 3
    )

    def gram_stats(n: int) -> DataFrame:
        parts = [f"toks[i+{j}]" for j in range(n)]
        gram = F.expr(
            f"transform(sequence(0, size(toks) - {n}), "
            f"i -> concat_ws(' ', {', '.join(parts)}))"
        )
        per_gram = (
            base.select("doc_id", F.explode(gram).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        return per_gram.groupBy("doc_id").agg(
            F.round(1.0 - F.count(F.lit(1)) / F.sum("c"), 6).alias(
                f"dup_{n}gram_frac"
            ),
            F.round(F.max("c") / F.sum("c"), 6).alias(f"top_{n}gram_frac"),
        )

    s2, s3 = gram_stats(2), gram_stats(3)
    return (
        s2.join(s3, on="doc_id")
        .select(
            "doc_id",
            "dup_2gram_frac",
            "top_2gram_frac",
            "dup_3gram_frac",
            "top_3gram_frac",
            (
                (F.col("dup_2gram_frac") <= DUP_2GRAM_MAX)
                & (F.col("dup_3gram_frac") <= DUP_3GRAM_MAX)
            ).alias("keep"),
        )
    )


def _gram_stats_sql(n: int) -> str:
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return f"""
  SELECT doc_id,
         ROUND(1.0 - COUNT(*) * 1.0 / SUM(c), 6) AS dup_{n}gram_frac,
         ROUND(MAX(c) * 1.0 / SUM(c), 6)         AS top_{n}gram_frac
  FROM (SELECT doc_id, g, COUNT(*) AS c
        FROM (SELECT doc_id, {parts} AS g
              FROM t, UNNEST(range(1, len(toks) - {n - 2})) AS s(i)) gg
        GROUP BY doc_id, g) pg
  GROUP BY doc_id
"""


QUALITY_REPETITION_SQL = f"""
WITH t AS (
  SELECT doc_id, {TOKS_SQL} AS toks FROM documents
  WHERE len({TOKS_SQL}) >= 3
),
s2 AS ({_gram_stats_sql(2)}),
s3 AS ({_gram_stats_sql(3)})
SELECT s2.doc_id, s2.dup_2gram_frac, s2.top_2gram_frac,
       s3.dup_3gram_frac, s3.top_3gram_frac,
       (s2.dup_2gram_frac <= {DUP_2GRAM_MAX}
        AND s3.dup_3gram_frac <= {DUP_3GRAM_MAX}) AS keep
FROM s2 JOIN s3 ON s3.doc_id = s2.doc_id
"""


# ---------------------------------------------------------------------------
# tf-idf top terms — the per-document keyword/selection signal
# ---------------------------------------------------------------------------

TFIDF_TOP_K = 5


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, rank, tok, score) — top-TFIDF_TOP_K terms per document by
    tf·ln(N/df), ties broken by token ascending.

    Two hash aggregations (tf keyed (doc, tok); df keyed tok — both
    map-side combined) and one vocab-sized join; the corpus count N rides
    a broadcast singleton, never a driver collect. Scores are rounded to
    6 decimals BEFORE ranking so the ordering is robust to last-ulp ln()
    differences across engines; equal rounded scores fall back to token
    order, a total order."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = docs.select("doc_id", F.explode(toks_col()).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, on="tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "rank", "tok", "score")
    )


TFIDF_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY tok),
scored AS (
  SELECT tf.doc_id, tf.tok,
         ROUND(tf.tf * ln((SELECT COUNT(*) FROM documents) * 1.0 / df.df), 6) AS score
  FROM tf JOIN df USING (tok)
)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS INTEGER) AS rank,
       tok, score
FROM scored
QUALIFY rank <= {TFIDF_TOP_K}
"""


# ---------------------------------------------------------------------------
# unigram-LM perplexity — the CCNet-style quality/selection signal
# ---------------------------------------------------------------------------


def quality_unigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, avg_neg_logp, ppl) — per-document perplexity
    under the corpus's own unigram distribution (the CCNet trick, with
    the corpus itself as the LM: no external model needed).

    ppl = exp(−1/n Σ ln p(tok)), p(tok) = corpus count / corpus total.
    Two map-side-combined aggregations (token counts; per-doc logp sums)
    joined through the vocab-sized count table — the same shape at any
    corpus size. Low ppl = templated/repetitive; high ppl = rare-token
    noise; both tails are what quality filters drop."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = docs.select("doc_id", F.explode(toks_col()).alias("tok"))
    cnt = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = tok.agg(F.count(F.lit(1)).alias("total"))
    scored = tok.join(cnt, on="tok").crossJoin(F.broadcast(total))
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(
            -F.sum(F.log(F.col("c") / F.col("total"))) / F.count(F.lit(1)), 6
        ).alias("avg_neg_logp"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "avg_neg_logp",
        F.round(F.exp(F.col("avg_neg_logp")), 4).alias("ppl"),
    )


QUALITY_PPL_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents
),
cnt AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
tot AS (SELECT COUNT(*) * 1.0 AS total FROM tok),
per_doc AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         ROUND(-SUM(ln(cnt.c / tot.total)) / COUNT(*), 6) AS avg_neg_logp
  FROM tok t JOIN cnt USING (tok) CROSS JOIN tot
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, avg_neg_logp, ROUND(exp(avg_neg_logp), 4) AS ppl
FROM per_doc
"""


# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets — head/middle/tail by LM-ppl terciles
# ---------------------------------------------------------------------------


def corpus_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, ppl, bucket) — CCNet's quality partition (Wenzek et al.
    2020 §4.3): rank every document by LM perplexity and split the corpus
    into equal-mass head / middle / tail buckets at the EXACT interpolated
    terciles (Spark ``percentile`` ≡ DuckDB ``quantile_cont``); head =
    lowest-ppl third. Downstream pipelines keep head, re-filter middle,
    drop tail.

    Plan shape: the unigram-ppl build (two map-side-combined aggregations
    + one vocab join) plus ONE scalar two-element percentile aggregate
    broadcast back — per-doc work after the scan is a pair of
    comparisons. The percentile over 10^12 doc scores is a single-pass
    exact aggregate; at that scale an approx-percentile with a fixed
    error budget is the drop-in (the bucket boundary moves by <ε mass),
    noted here because exactness is what the oracle pins.
    """
    ppl = quality_unigram_ppl(spark, sf_dir).select("doc_id", "ppl")
    cuts = ppl.agg(
        F.expr("percentile(ppl, 1.0/3)").alias("t1"),
        F.expr("percentile(ppl, 2.0/3)").alias("t2"),
    )
    return ppl.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "ppl",
        F.when(F.col("ppl") <= F.col("t1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


CORPUS_PPL_BUCKETS_SQL = f"""
WITH base AS ({QUALITY_PPL_SQL}),
cuts AS (
  SELECT quantile_cont(ppl, 1.0/3) AS t1, quantile_cont(ppl, 2.0/3) AS t2
  FROM base
)
SELECT doc_id, ppl,
       CASE WHEN ppl <= t1 THEN 'head'
            WHEN ppl <= t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM base CROSS JOIN cuts
"""


# ---------------------------------------------------------------------------
# interpolated Kneser–Ney bigram perplexity — the sequence-aware upgrade
# of the unigram signal (Kneser & Ney 1995; Chen & Goodman 1999 eq. 4.17)
# ---------------------------------------------------------------------------

KN_DISCOUNT = 0.75


def bigram_kn_ppl(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, avg_neg_logp, ppl) — per-document perplexity
    under an interpolated Kneser–Ney BIGRAM model trained on the corpus
    itself (the CCNet self-LM trick, one order up): where the unigram
    signal only sees token rarity, this one scores token ORDER — shuffled
    or templated word salad gets a high ppl even when every token is
    common.

    P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1)
             + D·N1+(w1,·)/c(w1) · N1+(·,w2)/N1+(··),  D = 0.75.

    Trained on itself every scored bigram has c ≥ 1, so no zero-prob
    backoff path is needed. Plan shape: bigrams are one JVM zip_with over
    the token array (no self-join, no Python); the model is three
    map-side-combined aggregations over the bigram-TYPE table (≪ token
    count); scoring is one hash join of the bigram stream against the
    type-keyed prob table — identical shape at any corpus size, and the
    prob table broadcasts while vocab² stays under the limit.

    Docs with < 2 tokens have no bigrams and are absent, as in the paper.
    """
    toks = toks_col()
    big = (
        docs.select("doc_id", toks.alias("tk"))
        .where(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(tk, 1, size(tk)-1), slice(tk, 2, size(tk)-1),"
                    " (a, b) -> named_struct('w1', a, 'w2', b))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = bc.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("fwd_types")
    )
    cont = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("back_types"))
    tot = bc.agg(F.count(F.lit(1)).cast("double").alias("n_types"))
    prob = (
        bc.join(ctx, on="w1")
        .join(cont, on="w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            (
                F.greatest(F.col("c12") - F.lit(KN_DISCOUNT), F.lit(0.0))
                / F.col("c1")
                + F.lit(KN_DISCOUNT)
                * F.col("fwd_types")
                / F.col("c1")
                * (F.col("back_types") / F.col("n_types"))
            ).alias("p"),
        )
    )
    per_doc = (
        big.join(prob, on=["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(-F.sum(F.log("p")) / F.count(F.lit(1)), 6).alias(
                "avg_neg_logp"
            ),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "avg_neg_logp",
        F.round(F.exp(F.col("avg_neg_logp")), 4).alias("ppl"),
    )


def quality_bigram_kn_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_kn_ppl(spark.read.parquet(f"{sf_dir}/documents.parquet"))


QUALITY_KN_PPL_SQL = f"""
WITH d0 AS (SELECT doc_id, {TOKS_SQL} AS tk FROM documents),
d AS (SELECT * FROM d0 WHERE len(tk) >= 2),
big AS (
  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
  FROM d, UNNEST(range(1, len(tk))) AS t(i)
),
bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
ctx AS (SELECT w1, SUM(c12) AS c1, COUNT(*) AS fwd_types FROM bc GROUP BY w1),
cont AS (SELECT w2, COUNT(*) AS back_types FROM bc GROUP BY w2),
tot AS (SELECT COUNT(*) * 1.0 AS n_types FROM bc),
prob AS (
  SELECT bc.w1, bc.w2,
         GREATEST(bc.c12 - 0.75, 0) / ctx.c1
         + 0.75 * ctx.fwd_types / ctx.c1 * (cont.back_types / tot.n_types) AS p
  FROM bc JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN tot
),
per_doc AS (
  SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         ROUND(-SUM(ln(p)) / COUNT(*), 6) AS avg_neg_logp
  FROM big b JOIN prob USING (w1, w2) GROUP BY b.doc_id
)
SELECT doc_id, n_bigrams, avg_neg_logp, ROUND(exp(avg_neg_logp), 4) AS ppl
FROM per_doc
"""


# ---------------------------------------------------------------------------
# Gopher word-level quality rules (Rae et al. 2021, table A1)
# ---------------------------------------------------------------------------

# the 8 function words Gopher requires a minimum number of
GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_RATIO = 0.8
# Gopher's published minimum is 2; the synthetic corpus is
# function-word-sparse (of the 8, only 'the' occurs), so the executable
# default is 1 — keeps the gate discriminative instead of vacuously false.
GOPHER_MIN_STOP_HITS = 1


def quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher rule bundle: the word-level quality gates every
    MassiveText-style pretraining pipeline applies before dedup.

    Signals (all pure JVM column algebra over one tokenization — no
    Python, no shuffle; the scan prunes to (doc_id, text)):

    * ``n_words``          — whitespace token count, gated to
                             [GOPHER_MIN_WORDS, GOPHER_MAX_WORDS];
    * ``mean_word_len``    — gated to [3, 10];
    * ``symbol_ratio``     — ('#' chars + '...' occurrences) / words,
                             gated <= 0.1;
    * ``alpha_word_ratio`` — words containing an ASCII letter / words,
                             gated >= 0.8;
    * ``n_stop_hits``      — how many of the 8 Gopher function words
                             appear at least once, gated >=
                             GOPHER_MIN_STOP_HITS (published default 2;
                             see the constant's comment for why this
                             corpus pins 1);
    * ``keep``             — AND of all five gates.

    Rule comparisons use the raw (unrounded) ratios; both engines compute
    them with identical int/int double division, so the keep bit cannot
    straddle a rounding boundary cross-engine.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = toks_col()
    toksl = F.transform(toks, F.lower)
    n_words = F.size(toks).cast("long")
    sum_len = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    mean_len = sum_len / n_words
    hash_cnt = F.length("text") - F.length(F.expr("replace(text, '#', '')"))
    ell_cnt = (F.length("text") - F.length(F.expr("replace(text, '...', '')"))) / 3
    symbol_ratio = (hash_cnt + ell_cnt) / n_words
    alpha_ratio = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / n_words
    hits = None
    for w in GOPHER_STOPS:
        term = F.array_contains(toksl, w).cast("long")
        hits = term if hits is None else hits + term
    keep = (
        (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS)
        & (mean_len >= GOPHER_MIN_MEAN_LEN)
        & (mean_len <= GOPHER_MAX_MEAN_LEN)
        & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
        & (alpha_ratio >= GOPHER_MIN_ALPHA_RATIO)
        & (hits >= GOPHER_MIN_STOP_HITS)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        hits.alias("n_stop_hits"),
        keep.alias("keep"),
    )


_GOPHER_HITS_SQL = " + ".join(
    f"(CASE WHEN list_contains(toksl, '{w}') THEN 1 ELSE 0 END)"
    for w in GOPHER_STOPS
)

QUALITY_GOPHER_SQL = f"""
WITH t AS (
  SELECT doc_id, text, {TOKS_SQL} AS toks,
         list_transform({TOKS_SQL}, x -> lower(x)) AS toksl
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks)
           AS mean_len,
         (length(text) - length(replace(text, '#', ''))
          + (length(text) - length(replace(text, '...', ''))) / 3.0)
           * 1.0 / len(toks) AS symbol_ratio,
         len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
           * 1.0 / len(toks) AS alpha_ratio,
         CAST({_GOPHER_HITS_SQL} AS BIGINT) AS n_stop_hits
  FROM t
)
SELECT doc_id, n_words,
       ROUND(mean_len, 6)     AS mean_word_len,
       ROUND(symbol_ratio, 6) AS symbol_ratio,
       ROUND(alpha_ratio, 6)  AS alpha_word_ratio,
       n_stop_hits,
       (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
        AND mean_len >= {GOPHER_MIN_MEAN_LEN} AND mean_len <= {GOPHER_MAX_MEAN_LEN}
        AND symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO}
        AND alpha_ratio >= {GOPHER_MIN_ALPHA_RATIO}
        AND n_stop_hits >= {GOPHER_MIN_STOP_HITS}) AS keep
FROM m
"""


# ---------------------------------------------------------------------------
# character-trigram language ID
# ---------------------------------------------------------------------------

# Distinctive function-word trigrams per language (space-padded, ASCII —
# the normalizer below strips everything outside [a-z ]). The classic
# Cavnar–Trenkle n-gram-profile idea reduced to a fixed profile: score =
# how many of the document's trigrams hit the language's profile. A tiny
# constant table → the whole classifier is column algebra (array_contains
# against a literal array), no join, no shuffle, no Python — it rides the
# parquet scan at any scale.
LANG_TRIGRAM_PROFILES: dict[str, list[str]] = {
    "de": [" de", "der", "er ", "ie ", "die", "und", " un", "ein", "ich",
           "sch", "ch ", "en ", "ung", "ber", "gen"],
    "en": [" th", "the", "he ", " an", "and", "nd ", "ing", " of", "of ",
           "ion", " to", "to ", "ed ", " in", "is "],
    "es": [" de", "de ", " la", "la ", "os ", " el", "el ", "que", " qu",
           "ado", "cio", "ent", "ien", "nte", "ar "],
    "fr": [" le", "le ", " de", "de ", "es ", " la", "la ", "ent", " et",
           "et ", "que", " qu", "eur", "ais", "ons"],
}


def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_trigrams, lang_pred, lang_score) — character-trigram
    language ID over ``documents``.

    Normalize to lowercase [a-z ] with collapsed separators, slice every
    char trigram, count hits against each language profile, and take the
    argmax (ties → lexicographically-first language; zero hits → 'unk').
    The trigram array is ~|text| elements but lives only inside one
    projection — nothing is exploded, so the operator stays one narrow
    whole-stage-codegen pass over the scan.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z]+", " "))
    tris = F.when(
        F.length(norm) >= 3,
        F.expr(
            "transform(sequence(1, length(trim(regexp_replace(lower(text),"
            " '[^a-z]+', ' '))) - 2),"
            " i -> substring(trim(regexp_replace(lower(text), '[^a-z]+', ' ')),"
            " i, 3))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = docs.select("doc_id", tris.alias("tris"))
    def _hits(prof):
        # nested closure: a default-arg lambda would grow a second parameter
        # and PySpark's filter() would bind it to the element *index*
        return lambda t: F.array_contains(F.lit(prof), t)

    counts = [
        F.size(F.filter("tris", _hits(prof))).alias(f"c_{lang}")
        for lang, prof in sorted(LANG_TRIGRAM_PROFILES.items())
    ]
    d = d.select("doc_id", F.size("tris").alias("n_tri"), *counts)
    best = F.greatest(*[F.col(f"c_{l}") for l in sorted(LANG_TRIGRAM_PROFILES)])
    pred = F.when(best == 0, F.lit("unk"))
    for lang in sorted(LANG_TRIGRAM_PROFILES):  # alphabetical tie-break
        pred = pred.when(F.col(f"c_{lang}") == best, F.lit(lang))
    return d.select(
        "doc_id",
        F.col("n_tri").cast("long").alias("n_trigrams"),
        pred.alias("lang_pred"),
        F.when(F.col("n_tri") > 0, F.round(best / F.col("n_tri"), 6))
        .otherwise(F.lit(0.0))
        .alias("lang_score"),
    )


def _lang_profile_sql(lang: str) -> str:
    return "[" + ", ".join(f"'{t}'" for t in LANG_TRIGRAM_PROFILES[lang]) + "]"


LANG_ID_NGRAM_SQL = (
    """
WITH n AS (
  SELECT doc_id,
         [substring(norm, i, 3) FOR i IN range(1, length(norm) - 1)] AS tris
  FROM (SELECT doc_id,
               trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS norm
        FROM documents)
),
c AS (
  SELECT doc_id, len(tris) AS n_tri,
"""
    + ",\n".join(
        f"         len(list_filter(tris, t -> list_contains("
        f"{_lang_profile_sql(lang)}, t))) AS c_{lang}"
        for lang in sorted(LANG_TRIGRAM_PROFILES)
    )
    + f"""
  FROM n
)
SELECT doc_id, CAST(n_tri AS BIGINT) AS n_trigrams,
       CASE WHEN GREATEST({", ".join("c_" + l for l in sorted(LANG_TRIGRAM_PROFILES))}) = 0 THEN 'unk'
"""
    + "\n".join(
        f"            WHEN c_{lang} = GREATEST("
        f"{', '.join('c_' + l for l in sorted(LANG_TRIGRAM_PROFILES))})"
        f" THEN '{lang}'"
        for lang in sorted(LANG_TRIGRAM_PROFILES)
    )
    + """
       END AS lang_pred,
       CASE WHEN n_tri > 0
            THEN ROUND(GREATEST("""
    + ", ".join("c_" + l for l in sorted(LANG_TRIGRAM_PROFILES))
    + """) * 1.0 / n_tri, 6)
            ELSE 0.0 END AS lang_score
FROM c
"""
)


# ---------------------------------------------------------------------------
# language-declaration audit — declared `lang` vs the n-gram prediction
# ---------------------------------------------------------------------------


def lang_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang_declared, lang_pred, lang_score) — documents whose
    DECLARED ``lang`` column disagrees with the character-trigram
    prediction (confident disagreements only: 'unk' predictions are not
    evidence of mislabeling). The metadata-quality audit every ingest
    pipeline runs before trusting upstream language tags for mixture
    weighting — a mislabeled-language doc poisons both the per-language
    sampling quotas and any per-language quality thresholds.

    Plan shape: the lang-ID pass (one narrow whole-stage-codegen
    projection, nothing exploded) plus ONE equi-join back to the
    documents scan keyed doc_id — co-partitioned with the scan that
    produced it, pruned to (doc_id, lang) on the right side.
    """
    pred = lang_id_ngram(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("lang").alias("lang_declared")
    )
    return (
        pred.join(docs, on="doc_id")
        .where(
            (F.col("lang_pred") != "unk")
            & (F.col("lang_pred") != F.col("lang_declared"))
        )
        .select("doc_id", "lang_declared", "lang_pred", "lang_score")
    )


LANG_AUDIT_SQL = f"""
WITH base AS ({LANG_ID_NGRAM_SQL})
SELECT b.doc_id, d.lang AS lang_declared, b.lang_pred, b.lang_score
FROM base b JOIN documents d USING (doc_id)
WHERE b.lang_pred <> 'unk' AND b.lang_pred <> d.lang
"""


# ---------------------------------------------------------------------------
# Zipf power-law fit — the corpus-health diagnostic for natural text
# ---------------------------------------------------------------------------
#
# Natural-language corpora follow freq(rank) ∝ rank^(-s) with s ≈ 1
# (Zipf's law); machine-generated spam, template boilerplate, and
# truncated crawls bend the log-log line. One scalar pair
# (slope, r²) per corpus is the standard datasheet row for "does this
# shard look like language?" — flat slopes (|s| « 1) flag synthetic or
# key-value text, low r² flags mixed registers.
#
# Fit: ordinary least squares of y = ln freq on x = ln rank over the
# whole type table (rank = row_number by freq desc, token asc — a total
# order both engines share). Cross-engine exactness: each log term is
# quantized ONCE to integer micro-units (round(ln(·)·10⁶) — positive, so
# Spark HALF_UP ≡ DuckDB round-half-away), and the five regression sums
# are then EXACT integer/decimal(38,0) arithmetic — invariant to Spark
# partition order vs DuckDB scan order, and immune to the engines'
# differing decimal-multiply scale-reduction rules (scale-0 products
# never trigger Spark's allowPrecisionLoss rescale). The micro-unit
# scale factors cancel exactly in the slope/r² closed forms (10¹² in
# numerator and denominator), so only the final combination runs in
# double — identical inputs → identical rounded output. The type table
# is vocabulary-sized (≪ corpus), so the unpartitioned ranking window
# and the one-row aggregate are bounded by design; the only corpus-scale
# stage is the map-side-combined token count.


def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n_types, n_tokens, zipf_slope, zipf_r2) — the OLS fit of
    the corpus log-log rank/frequency line."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = (
        docs.select(F.explode(toks_col()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    terms = counts.select(
        "freq",
        F.round(F.log(F.row_number().over(w).cast("double")) * 1e6)
        .cast("decimal(20,0)")
        .alias("x"),
        F.round(F.log(F.col("freq").cast("double")) * 1e6)
        .cast("decimal(20,0)")
        .alias("y"),
    )
    sums = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("freq").cast("long").alias("n_tokens"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
    )
    # micro-unit (1e6) scale: cov/varx/vary all carry 1e12, cancelling in
    # slope and r² exactly
    n = F.col("n_types").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    return sums.select(
        "n_types",
        "n_tokens",
        F.when(varx != 0, F.round(cov / varx, 6)).alias("zipf_slope"),
        F.when(
            (varx != 0) & (vary != 0), F.round(cov * cov / (varx * vary), 6)
        ).alias("zipf_r2"),
    )


ZIPF_FIT_SQL = f"""
WITH counts AS (
  SELECT tok, COUNT(*) AS freq
  FROM (SELECT unnest({TOKS_SQL}) AS tok FROM documents)
  GROUP BY tok
),
terms AS (
  SELECT freq,
         CAST(ROUND(ln(CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, tok ASC)
                             AS DOUBLE)) * 1000000) AS DECIMAL(20,0)) AS x,
         CAST(ROUND(ln(CAST(freq AS DOUBLE)) * 1000000) AS DECIMAL(20,0)) AS y
  FROM counts
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT)   AS n_types,
         CAST(SUM(freq) AS BIGINT)  AS n_tokens,
         SUM(x)                     AS sx,
         SUM(y)                     AS sy,
         SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
         SUM(CAST(y * y AS DECIMAL(38,0))) AS syy,
         SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy
  FROM terms
)
SELECT n_types, n_tokens,
       CASE WHEN CAST(n_types AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0
            THEN ROUND((CAST(n_types AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n_types AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
       END AS zipf_slope,
       CASE WHEN CAST(n_types AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0
             AND CAST(n_types AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <> 0
            THEN ROUND(((CAST(n_types AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) ** 2)
                       / ((CAST(n_types AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * (CAST(n_types AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
       END AS zipf_r2
FROM sums
"""


# ---------------------------------------------------------------------------
# corpus datasheet — the one-row summary every dataset release ships
# ---------------------------------------------------------------------------
#
# "Datasheets for Datasets" (Gebru et al. 2021) asks every corpus to ship
# its composition numbers; this emits the quantitative core as ONE row by
# composing engine queries that are each independently oracle-checked:
# sizes (docs/tokens/sources/langs), the transitive near-dup drop rate
# (dedup_clusters), mean quality (text_stats' integer-micro-unit score,
# summed as exact DECIMAL so the mean is order-invariant), the language-
# mix Shannon entropy (per-lang terms pre-rounded to 6 dp, exact-decimal
# summed — the language axis is small by nature), and the Zipf slope
# (zipf_fit). Every piece is a one-row aggregate broadcast into a
# cross-join chain; nothing scans the corpus more than its source query
# already does.


def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n_docs, n_tokens, n_sources, n_langs, dup_doc_pct,
    mean_quality, lang_entropy, zipf_slope)."""
    from ed_twitter_spark.operators.dedup import dedup_clusters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(toks_col())).cast("long").alias("n_tokens"),
        F.countDistinct("source").cast("int").alias("n_sources"),
        F.countDistinct("lang").cast("int").alias("n_langs"),
    )
    dup = dedup_clusters(spark, sf_dir).agg(
        F.round(
            F.sum((~F.col("keep")).cast("int")) / F.count(F.lit(1)), 6
        ).alias("dup_doc_pct")
    )
    q = text_stats(spark, sf_dir).agg(
        F.round(
            F.sum(F.col("quality").cast("decimal(12,8)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_quality")
    )
    lc = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    n = docs.count()  # scalar for the per-lang term; one cheap count job
    ent = lc.select(
        F.round(
            (F.col("c") / F.lit(float(n)))
            * F.log(F.lit(float(n)) / F.col("c")),
            6,
        )
        .cast("decimal(12,6)")
        .alias("t")
    ).agg(F.round(F.sum("t").cast("double"), 6).alias("lang_entropy"))
    z = zipf_fit(spark, sf_dir).select("zipf_slope")
    return (
        base.crossJoin(F.broadcast(dup))
        .crossJoin(F.broadcast(q))
        .crossJoin(F.broadcast(ent))
        .crossJoin(F.broadcast(z))
    )


def corpus_datasheet_oracle_sql() -> str:
    from ed_twitter_spark.operators.dedup import DEDUP_CLUSTERS_SQL

    return f"""
WITH base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len({TOKS_SQL})) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT source) AS INTEGER) AS n_sources,
         CAST(COUNT(DISTINCT lang) AS INTEGER)   AS n_langs
  FROM documents
),
clusters AS ({DEDUP_CLUSTERS_SQL}),
dup AS (
  SELECT ROUND(SUM(CASE WHEN keep THEN 0 ELSE 1 END) * 1.0 / COUNT(*), 6)
           AS dup_doc_pct
  FROM clusters
),
ts AS ({TEXT_STATS_SQL}),
q AS (
  SELECT ROUND(CAST(SUM(CAST(quality AS DECIMAL(12,8))) AS DOUBLE)
               / COUNT(*), 6) AS mean_quality
  FROM ts
),
lc AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
n1 AS (SELECT COUNT(*) * 1.0 AS n FROM documents),
ent AS (
  SELECT ROUND(CAST(SUM(CAST(ROUND((c / n1.n) * ln(n1.n / c), 6)
                             AS DECIMAL(12,6))) AS DOUBLE), 6)
           AS lang_entropy
  FROM lc CROSS JOIN n1
),
zf AS ({ZIPF_FIT_SQL})
SELECT base.n_docs, base.n_tokens, base.n_sources, base.n_langs,
       dup.dup_doc_pct, q.mean_quality, ent.lang_entropy, zf.zipf_slope
FROM base CROSS JOIN dup CROSS JOIN q CROSS JOIN ent CROSS JOIN zf
"""
