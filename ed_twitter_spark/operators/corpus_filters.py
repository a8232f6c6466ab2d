"""Corpus-hygiene operators a large-scale training-data pipeline runs
before/alongside dedup: PII redaction, deterministic dataset splitting,
and eval-set decontamination. Beyond the reference's own operator set
(like the dedup/similarity ladder) — first-class per the build brief.

All three are single-scan, shuffle-minimal designs:

* ``pii_redact``   — regex redaction of emails / URLs / phone-like spans,
  pure JVM ``regexp_replace`` chain (patterns restricted to syntax RE2
  and Java regex interpret identically — no lookaround, no backrefs).
  The synthetic corpus carries no PII, so a deterministic contact line
  derived from doc_id is appended before redaction — the operator is
  exercised on every row, and both engines construct the same input.
* ``dataset_split`` — stable train/val/test assignment by md5 hash
  bucket (80/10/10): reproducible across runs/engines, no global sort,
  no sampling state.
* ``decontaminate`` — n-gram overlap against a held-out eval subset
  (the standard 8-gram collision rule): eval shingles form the (small)
  build side of a semi-join against training-doc shingles; output is
  per-training-doc collision counts. Σ cost is one shingle scan + one
  hash join keyed on the shingle — no pairwise document comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ed_twitter_spark.functions.hashing import TOKS_SQL, toks_col

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[A-Za-z0-9./_%\-?=&#]+"
PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

_CONTACT = "contact user{d}@example.com https://ex.org/u/{d} +1-555-{d4}"


def _with_contact(docs: DataFrame) -> DataFrame:
    d4 = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    contact = F.format_string(
        "contact user%s@example.com https://ex.org/u/%s +1-555-%s",
        F.col("doc_id").cast("string"),
        F.col("doc_id").cast("string"),
        d4,
    )
    return docs.withColumn("text2", F.concat_ws(" ", "text", contact))


_CONTACT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com "
    "https://ex.org/u/' || CAST(doc_id AS VARCHAR) || ' +1-555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_contact(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    t = F.col("text2")
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
    n_urls = F.size(F.regexp_extract_all(t, F.lit(URL_RE), 0))
    n_phones = F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        n_emails.cast("int").alias("n_emails"),
        n_urls.cast("int").alias("n_urls"),
        n_phones.cast("int").alias("n_phones"),
    )


PII_REDACT_SQL = f"""
WITH d AS (SELECT doc_id, {_CONTACT_SQL} AS text2 FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text2,
         '{EMAIL_RE}', '<EMAIL>', 'g'),
         '{URL_RE}', '<URL>', 'g'),
         '{PHONE_RE}', '<PHONE>', 'g')                          AS clean_text,
       CAST(len(regexp_extract_all(text2, '{EMAIL_RE}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(text2, '{URL_RE}')) AS INTEGER)   AS n_urls,
       CAST(len(regexp_extract_all(text2, '{PHONE_RE}')) AS INTEGER) AS n_phones
FROM d
"""


def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return docs.select("doc_id", bucket.cast("int").alias("bucket"), split.alias("split"))


DATASET_SPLIT_SQL = """
SELECT doc_id,
       CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            % 100 AS INTEGER) AS bucket,
       CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                 % 100 < 80 THEN 'train'
            WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                 % 100 < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


DECON_N = 8  # n-gram length of the contamination rule
EVAL_MOD = 10  # docs with doc_id % 10 == 0 form the held-out eval subset


def _ngrams(docs: DataFrame, n: int) -> DataFrame:
    sh = F.expr(
        f"transform(sequence(0, size(toks) - {n}), "
        f"i -> array_join(slice(toks, i + 1, {n}), ' '))"
    )
    return (
        docs.select("doc_id", toks_col().alias("toks"))
        .where(F.size("toks") >= n)
        .select("doc_id", F.explode(sh).alias("gram"))
        .distinct()
    )


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_collisions) — training docs sharing ≥1 eval 8-gram."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    grams = _ngrams(docs, DECON_N)
    eval_grams = (
        grams.where(F.col("doc_id") % EVAL_MOD == 0)
        .select("gram")
        .distinct()
    )
    train = grams.where(F.col("doc_id") % EVAL_MOD != 0)
    return (
        train.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_collisions"))
    )


DECONTAMINATE_SQL = f"""
WITH g AS (
  SELECT DISTINCT doc_id,
         array_to_string(toks[i+1 : i+{DECON_N}], ' ') AS gram
  FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
       UNNEST(range(0, len(toks) - {DECON_N} + 1)) AS t(i)
  WHERE len(toks) >= {DECON_N}
),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % {EVAL_MOD} = 0)
SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_collisions
FROM g JOIN ev USING (gram)
WHERE g.doc_id % {EVAL_MOD} <> 0
GROUP BY g.doc_id
"""


# stratified sampling: percent kept per language stratum — downsample the
# head language, keep the tail (the standard rebalancing move before
# pretraining-data mixing)
SAMPLE_PCT_EN = 20
SAMPLE_PCT_OTHER = 50


def dataset_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample of ``documents`` by language.

    The keep/drop decision is a pure function of doc_id (md5 bucket,
    salted differently from ``dataset_split`` so the two decisions are
    independent) — no RNG state, so the sample is reproducible across
    runs, cluster sizes, and engines, and a re-run after adding documents
    keeps every previously-kept doc (append-stable at 10^12 rows). One
    scan, no shuffle: the stratum comes from the same JVM column algebra
    as text_stats.
    """
    from ed_twitter_spark.operators.textstats import text_stats

    stats = text_stats(spark, sf_dir)
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("samp#"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    rate = F.when(
        F.col("lang_pred") == "en", F.lit(SAMPLE_PCT_EN)
    ).otherwise(F.lit(SAMPLE_PCT_OTHER))
    return (
        stats.select(
            "doc_id", "lang_pred", bucket.cast("int").alias("bucket"), rate.alias("rate")
        )
        .where(F.col("bucket") < F.col("rate"))
        .select("doc_id", "lang_pred", "bucket")
    )


def dataset_sample_oracle_sql() -> str:
    from ed_twitter_spark.operators.textstats import TEXT_STATS_SQL

    return f"""
WITH ts AS ({TEXT_STATS_SQL}),
b AS (
  SELECT doc_id, lang_pred,
         CAST(CAST(('0x' || substr(md5('samp#' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 100 AS INTEGER) AS bucket,
         CASE WHEN lang_pred = 'en' THEN {SAMPLE_PCT_EN}
              ELSE {SAMPLE_PCT_OTHER} END  AS rate
  FROM ts
)
SELECT doc_id, lang_pred, bucket FROM b WHERE bucket < rate
"""


# ---------------------------------------------------------------------------
# Bloom-filter decontamination: the O(1)-broadcast-state scale path
# ---------------------------------------------------------------------------

BLOOM_M = 65536  # bits (~10 bits per eval gram at fixture scale, FP ~1%)
BLOOM_K = 3  # hash functions


def _bloom_positions(gram_col: F.Column, k: int) -> F.Column:
    from ed_twitter_spark.functions.hashing import h32_col

    return h32_col(F.concat(F.lit(f"{k}:"), gram_col)) % BLOOM_M


def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_flagged_grams, n_exact_collisions) — Bloom-filter
    decontamination beside the exact answer it approximates.

    The exact operator (:func:`decontaminate`) broadcasts the eval set's
    DISTINCT GRAM STRINGS — fine at fixture scale, but a real eval suite
    against 10^12 turns can make that broadcast arbitrarily large. This
    variant broadcasts a FIXED-SIZE object instead: the eval grams'
    Bloom bit set (≤ BLOOM_M set-bit rows ≈ 0.5 MB worst-case at any eval-set size; a production build ships it as an actual m-bit bitmap). A train
    gram is flagged when all BLOOM_K of its md5-derived bit positions
    are set — a superset of true contamination (one-sided: no false
    negatives, FP rate ≈ (1−e^{−kn/m})^k), which is the correct failure
    direction for decontamination (over-drop, never leak). The gate
    output carries the exact collision count per doc so the FP overshoot
    is directly visible: n_flagged_grams ≥ n_exact_collisions always,
    with equality wherever the filter had no false positive.

    Everything is md5-derived, so both engines build the identical bit
    set and flag the identical grams — the sketch is value-exact
    cross-engine, not merely statistically equivalent.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    grams = _ngrams(docs, DECON_N)
    ev = grams.where(F.col("doc_id") % EVAL_MOD == 0).select("gram").distinct()
    bits = (
        ev.select(
            F.explode(
                F.array(*[_bloom_positions(F.col("gram"), k) for k in range(BLOOM_K)])
            ).alias("bit")
        )
        .distinct()
    )
    train = grams.where(F.col("doc_id") % EVAL_MOD != 0)
    probe = train.select(
        "doc_id",
        "gram",
        F.posexplode(
            F.array(*[_bloom_positions(F.col("gram"), k) for k in range(BLOOM_K)])
        ).alias("k", "bit"),
    )
    flagged = (
        probe.join(F.broadcast(bits), "bit")
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("hits"))
        .where(F.col("hits") == BLOOM_K)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_flagged_grams"))
    )
    exact = (
        train.join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_exact_collisions"))
    )
    return (
        flagged.join(exact, "doc_id", "left")
        .select(
            "doc_id",
            "n_flagged_grams",
            F.coalesce("n_exact_collisions", F.lit(0)).alias("n_exact_collisions"),
        )
    )


def _bloom_pos_sql(k: int) -> str:
    from ed_twitter_spark.functions.hashing import h32_sql

    return f"({h32_sql(repr(f'{k}:') + ' || gram')} % {BLOOM_M})"


DECONTAMINATE_BLOOM_SQL = f"""
WITH g AS (
  SELECT DISTINCT doc_id,
         array_to_string(toks[i+1 : i+{DECON_N}], ' ') AS gram
  FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
       UNNEST(range(0, len(toks) - {DECON_N} + 1)) AS t(i)
  WHERE len(toks) >= {DECON_N}
),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % {EVAL_MOD} = 0),
bits AS (
  SELECT DISTINCT bit FROM ev,
         UNNEST([{", ".join(_bloom_pos_sql(k) for k in range(BLOOM_K))}]) AS u(bit)
),
train AS (SELECT doc_id, gram FROM g WHERE doc_id % {EVAL_MOD} <> 0),
probe AS (
  SELECT doc_id, gram, bit FROM train,
         UNNEST([{", ".join(_bloom_pos_sql(k) for k in range(BLOOM_K))}]) AS u(bit)
),
flagged AS (
  SELECT doc_id, COUNT(*) AS n_flagged_grams
  FROM (
    SELECT doc_id, gram
    FROM probe JOIN bits USING (bit)
    GROUP BY doc_id, gram
    HAVING COUNT(*) = {BLOOM_K}
  ) GROUP BY doc_id
),
exact AS (
  SELECT doc_id, COUNT(*) AS n_exact_collisions
  FROM train JOIN ev USING (gram)
  GROUP BY doc_id
)
SELECT f.doc_id, f.n_flagged_grams,
       COALESCE(e.n_exact_collisions, 0) AS n_exact_collisions
FROM flagged f LEFT JOIN exact e USING (doc_id)
ORDER BY f.doc_id
"""


# ---------------------------------------------------------------------------
# temperature-based source sampling (the multilingual mixing rule)
# ---------------------------------------------------------------------------

TEMP_BUDGET = 15  # per-source quota ceiling (docs) at temperature T
# T = 2: quota ∝ sqrt(source token mass). sqrt and one multiply/divide are
# correctly-rounded IEEE ops, so the quota arithmetic is deterministic
# cross-engine WITHOUT float-sum order concerns (no normalizing Σ — quotas
# are anchored to the LARGEST source instead, the usual implementation).


def dataset_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, rk, quota) — the docs selected by temperature-2
    source sampling: quota_s = max(1, ⌊BUDGET·√tok_s/√tok_max⌋) documents
    per source, picked in md5(doc_id) order.

    This is the source-mixing rule multilingual/multi-domain pipelines
    apply so small sources are upsampled relative to their share
    (p_s ∝ n_s^(1/T)); hash-order selection makes the draw deterministic,
    engine-independent and stable (a new document displaces an existing
    pick only if it hashes earlier — no RNG state to ship). Plan: one
    token-count aggregation (source-sized), a global-window max over the
    ~|sources| rows, and one row_number per source — the corpus is
    scanned once and only the per-source ordering shuffles.
    """
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", F.size(toks_col()).alias("n_tok")
    )
    tot = docs.groupBy("source").agg(F.sum("n_tok").alias("tok_s"))
    # anchor scalar as a broadcast 1-row cross join (source-sized × 1 —
    # not a data-sized nested loop), avoiding a global window
    tot = tot.crossJoin(F.broadcast(tot.agg(F.max("tok_s").alias("tok_max"))))
    quota = tot.select(
        "source",
        F.greatest(
            F.lit(1),
            F.floor(
                F.lit(float(TEMP_BUDGET)) * F.sqrt("tok_s") / F.sqrt("tok_max")
            ),
        ).alias("quota"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select("doc_id", "source", F.row_number().over(w).alias("rk"))
    return (
        ranked.join(F.broadcast(quota), "source")
        .where(F.col("rk") <= F.col("quota"))
        .select("doc_id", "source", "rk", "quota")
    )


DATASET_SAMPLE_TEMP_SQL = f"""
WITH d AS (
  SELECT doc_id, source, len({TOKS_SQL}) AS n_tok FROM documents
),
tot AS (
  SELECT source, SUM(n_tok) AS tok_s, MAX(SUM(n_tok)) OVER () AS tok_max
  FROM d GROUP BY source
),
quota AS (
  SELECT source,
         GREATEST(1, CAST(FLOOR({float(TEMP_BUDGET)} * sqrt(tok_s) / sqrt(tok_max))
                          AS BIGINT)) AS quota
  FROM tot
),
ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM d
)
SELECT doc_id, source, rk, quota
FROM ranked JOIN quota USING (source)
WHERE rk <= quota
"""


# ---------------------------------------------------------------------------
# curriculum schedule — difficulty-staged global training order
# ---------------------------------------------------------------------------

CURRICULUM_PHASES = 4
_CUR_BUCKETS = 16


def dataset_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(global_idx, doc_id, phase, difficulty) — a curriculum-learning
    schedule (Bengio et al. 2009) over the corpus: documents staged
    easy -> hard by their self-LM difficulty (the unigram avg_neg_logp
    from quality_unigram_ppl — rounded to 6 dp, so the staging key is
    engine-stable), split into CURRICULUM_PHASES equal-mass phases at
    EXACT interpolated quantile cutoffs (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``, the corpus_ppl_buckets contract), and
    deterministically shuffled WITHIN each phase by md5(doc_id) so no
    difficulty-adjacent ordering artifacts leak into training.

    The global index is assigned with the same two-phase scheme as
    dataset_interleave: a naive row_number() OVER (ORDER BY phase, md5)
    would sort the whole corpus on one partition, so instead the md5
    key's first hex digit makes 16 ordered buckets per phase, each
    (phase, bucket) cell numbers its rows locally, and the ≤ 64 cell
    counts come to the driver once for cumulative offsets — the only
    driver state is that count vector.
    """
    from pyspark.sql import Window

    from ed_twitter_spark.operators.textstats import quality_unigram_ppl

    base = quality_unigram_ppl(spark, sf_dir).select(
        "doc_id", F.col("avg_neg_logp").alias("difficulty")
    )
    cuts = base.agg(
        F.expr("percentile(difficulty, 0.25)").alias("q1"),
        F.expr("percentile(difficulty, 0.50)").alias("q2"),
        F.expr("percentile(difficulty, 0.75)").alias("q3"),
    )
    ph = base.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "difficulty",
        F.when(F.col("difficulty") <= F.col("q1"), F.lit(1))
        .when(F.col("difficulty") <= F.col("q2"), F.lit(2))
        .when(F.col("difficulty") <= F.col("q3"), F.lit(3))
        .otherwise(F.lit(4))
        .alias("phase"),
    )
    key = F.md5(F.col("doc_id").cast("string"))
    from ed_twitter_spark.caching import persist_tracked

    b = persist_tracked(
        ph.withColumn("okey", key).withColumn(
            "bucket", F.conv(F.substring("okey", 1, 1), 16, 10).cast("int")
        )
    )
    w = Window.partitionBy("phase", "bucket").orderBy("okey", "doc_id")
    ranked = b.withColumn("rn", F.row_number().over(w))
    counts = {
        (r["phase"], r["bucket"]): r["n"]
        for r in b.groupBy("phase", "bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for phase in range(1, CURRICULUM_PHASES + 1):
        for bucket in range(_CUR_BUCKETS):
            offsets[(phase, bucket)] = acc
            acc += counts.get((phase, bucket), 0)
    off = F.create_map(
        *[
            x
            for (phase, bucket), o in sorted(offsets.items())
            for x in (F.lit(phase * _CUR_BUCKETS + bucket), F.lit(o))
        ]
    )
    return ranked.select(
        (off[F.col("phase") * _CUR_BUCKETS + F.col("bucket")] + F.col("rn"))
        .cast("long")
        .alias("global_idx"),
        "doc_id",
        "phase",
        "difficulty",
    )


def dataset_curriculum_oracle_sql() -> str:
    from ed_twitter_spark.operators.textstats import QUALITY_PPL_SQL

    return f"""
WITH base AS ({QUALITY_PPL_SQL}),
cuts AS (
  SELECT quantile_cont(avg_neg_logp, 0.25) AS q1,
         quantile_cont(avg_neg_logp, 0.50) AS q2,
         quantile_cont(avg_neg_logp, 0.75) AS q3
  FROM base
),
ph AS (
  SELECT doc_id, avg_neg_logp AS difficulty,
         CASE WHEN avg_neg_logp <= q1 THEN 1
              WHEN avg_neg_logp <= q2 THEN 2
              WHEN avg_neg_logp <= q3 THEN 3
              ELSE 4 END AS phase
  FROM base CROSS JOIN cuts
)
SELECT row_number() OVER (
         ORDER BY phase, md5(CAST(doc_id AS VARCHAR)), doc_id
       ) AS global_idx,
       doc_id, phase, difficulty
FROM ph
"""
