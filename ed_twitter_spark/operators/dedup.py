"""Deduplication operators for training-data pipelines over ``documents``.

The dedup ladder a pretraining-data pipeline runs, each expressed
Spark-first and each with a value-exact DuckDB oracle (all hashes are
md5-derived so both engines agree bit-for-bit):

* ``dedup_exact``     — content-hash groupBy; canonical = min doc_id.
  One map-side-combined aggregation; the only full-width scan.
* ``dedup_minhash_lsh`` — word-3-gram shingles → 16 Kirsch–Mitzenmacher
  double-hashed minhashes (one md5 per shingle, components
  (h1 + i·h2) mod 2^32) →
  4 bands × 4 rows → bucket self-join → candidate pairs with estimated
  Jaccard (fraction of agreeing minhash components). The self-join is on
  (band, band_key) buckets, so cluster-wide cost is Σ bucket², not n² —
  the standard web-scale near-dup design (the banding/bucket math of
  Broder's resemblance sketches).
* ``dedup_ngram_jaccard`` — *exact* shingle Jaccard via an inverted
  index: one linear pipeline (shingle build → per-doc size window →
  posting list per shingle → in-list pair expansion → pair counts →
  |A∩B| / (|A|+|B|−|A∩B|)). Shingles whose posting list exceeds an
  **absolute** document-frequency cap are dropped — the skew guard that
  bounds per-shingle pair work at C(DF_CAP, 2) regardless of corpus
  size (a fractional cap would still admit ~10¹⁶ pairs at 10⁹ docs).
  The corpus is scanned exactly once; no count/size job runs at plan
  build time.
* ``dedup_simhash``   — 64-bit simhash fingerprint per document
  (bit b = sign of Σ_tokens ±1 by token-hash bit b), assembled by one
  wide aggregation (64 sum columns), not a 64× bit explode.
* ``dedup_simhash_pairs`` — hamming-near pairs over those fingerprints:
  4 bands × 16 bits; by pigeonhole any pair at hamming ≤ 3 agrees exactly
  on ≥ 1 band, so the banded bucket self-join finds all such pairs with
  Σ bucket² work, then ``bit_count(xor)`` filters to the true distance.
  16-bit band keys give 65,536 bucket values per band, so buckets stay
  O(n/65k) and the join is genuinely subquadratic (a 16-bit fingerprint
  with 4-bit bands degenerated to ~n²/64 candidate pairs).

Embedding-cosine near-dup lives in operators/similarity.py (same blocked
join it uses for ANN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ed_twitter_spark.caching import persist_tracked
from ed_twitter_spark.functions.hashing import (
    TOKS_SQL,
    h32_col,
    h32_sql,
    h64_col,
    h64_sql,
    toks_col,
)

N_MINHASH = 16
N_BANDS = 4
BAND_ROWS = N_MINHASH // N_BANDS
# absolute document-frequency cap: drop shingles shared by more than
# DF_CAP documents. Real pipelines cap df at O(100), never at a fraction
# of the corpus — C(DF_CAP, 2) bounds the pair fan-out per shingle at any
# corpus size.
DF_CAP = 100
SIMHASH_BITS = 64
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
HAMMING_MAX = SIMHASH_BANDS - 1  # pigeonhole-complete for ≤ bands-1 flipped bits


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select("doc_id", F.md5(F.lower("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


DEDUP_EXACT_SQL = """
SELECT md5(lower(text))            AS content_hash,
       CAST(COUNT(*) AS BIGINT)    AS n_docs,
       MIN(doc_id)                 AS canonical_doc_id
FROM documents GROUP BY md5(lower(text))
"""


# ---------------------------------------------------------------------------
# shingles (shared by minhash + exact jaccard)
# ---------------------------------------------------------------------------


def shingle_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) word 3-grams from any documents-schema frame —
    a stateless projection+explode, so it applies unchanged to a
    STREAMING documents frame (used by ``streaming/sketch.py``)."""
    sh = F.expr(
        "transform(sequence(0, size(toks) - 3), "
        "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))"
    )
    return (
        docs.select("doc_id", toks_col().alias("toks"))
        .where(F.size("toks") >= 3)
        .select("doc_id", F.explode(sh).alias("shingle"))
    )


def _shingles_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) — word 3-grams WITH duplicates (no shuffle).

    The minhash sketch consumes this directly: min() is idempotent over
    duplicates and the sketch aggregation's map-side combine collapses
    them for free, so a distinct here would add a full extra exchange of
    the shingle stream for nothing."""
    return shingle_rows(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) — distinct word 3-grams (set semantics, for the
    exact-Jaccard inverted index where per-doc set sizes matter)."""
    return _shingles_raw(spark, sf_dir).distinct()


_SHINGLES_SQL = f"""
SELECT DISTINCT doc_id,
       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
     UNNEST(range(1, len(toks) - 1)) AS t(i)
WHERE len(toks) >= 3
"""


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc1, doc2, est_jaccard) — LSH candidate pairs, est = matching
    minhash components / 16.

    The 16-component sketch is one *wide* map-side-combined aggregation
    (16 min() columns over the shingle stream) — not a 16× row explosion
    through the shuffle — and the signature stays wide end-to-end: band
    keys project off the sketch row and the pair-similarity join compares
    the two 16-column sketches in a single projection instead of 16 rows
    per pair. One shuffle to doc granularity, then only sketch-sized data
    moves. Shingles arrive raw (duplicates included): min() collapses them
    in the map-side partial aggregation, so the set-semantics distinct —
    and its whole extra exchange — is skipped."""
    sh = _shingles_raw(spark, sf_dir)
    # Kirsch–Mitzenmacher double hashing: ONE md5 per shingle, split into
    # two 32-bit halves (h1, h2); component i minimizes (h1 + i·h2) mod
    # 2^32. Same guarantees as N independent hashes asymptotically
    # (Kirsch & Mitzenmacher, ESA'06), at 1/N_MINHASH of the hash cost —
    # the sketch build is hash-bound at corpus scale (measured ~1.8×
    # faster than the 16-md5 variant at sf0.1).
    hx = F.md5(F.col("shingle"))
    sh = sh.select(
        "doc_id",
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(hx, 9, 8), 16, 10).cast("long").alias("h2"),
    )
    mh = sh.groupBy("doc_id").agg(
        *[
            F.min(F.expr(f"(h1 + {i} * h2) % 4294967296")).alias(f"mh{i}")
            for i in range(N_MINHASH)
        ]
    )
    # sketch table: built once, read by bands + both join sides; released
    # by the harness after the terminal action (caching.release_caches)
    mh = persist_tracked(mh)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh{b * BAND_ROWS + j}").cast("string")
                        for j in range(BAND_ROWS)
                    ],
                )
            ).alias("bkey"),
        )
        for b in range(N_BANDS)
    ]
    bands = mh.select("doc_id", F.explode(F.array(*band_structs)).alias("s")).select(
        "doc_id", "s.band", "s.bkey"
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )
    m1 = mh.select(
        F.col("doc_id").alias("doc1"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(N_MINHASH)],
    )
    m2 = mh.select(
        F.col("doc_id").alias("doc2"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(N_MINHASH)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    return (
        cand.join(m1, "doc1")
        .join(m2, "doc2")
        .select(
            "doc1",
            "doc2",
            F.round(matches / F.lit(float(N_MINHASH)), 6).alias("est_jaccard"),
        )
    )


DEDUP_MINHASH_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
hh AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS h2
  FROM sh
),
mh AS (
  SELECT doc_id, i, MIN((h1 + i * h2) % 4294967296) AS mh
  FROM hh, UNNEST(range(0, {N_MINHASH})) AS t(i)
  GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, CAST(i // {BAND_ROWS} AS INTEGER) AS band,
         md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)) AS bkey
  FROM mh GROUP BY doc_id, i // {BAND_ROWS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT c.doc1, c.doc2,
       ROUND(SUM(CASE WHEN m1.mh = m2.mh THEN 1 ELSE 0 END) / {float(N_MINHASH)}, 6)
         AS est_jaccard
FROM cand c
JOIN mh m1 ON m1.doc_id = c.doc1
JOIN mh m2 ON m2.doc_id = c.doc2 AND m2.i = m1.i
GROUP BY c.doc1, c.doc2
"""


# ---------------------------------------------------------------------------
# exact n-gram Jaccard via inverted index
# ---------------------------------------------------------------------------

JACCARD_MIN = 0.1


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc1, doc2, jaccard) — exact shingle Jaccard ≥ 0.1 over pairs that
    share ≥1 shingle with document frequency ≤ DF_CAP.

    One linear pipeline over a single corpus scan: the per-doc shingle
    count rides a window on the shingle stream, the inverted index is a
    groupBy(shingle) posting list (the size filter IS the df cap — no
    separate frequency pass), and pairs are expanded inside each capped
    posting list, so no self-join re-reads the input and nothing runs at
    plan-construction time.
    """
    sh = _shingles(spark, sf_dir)
    sh = sh.withColumn("sz", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    posting = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "sz"))).alias("docs"))
        .where((F.size("docs") >= 2) & (F.size("docs") <= DF_CAP))
    )
    pairs = posting.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("docs"),
                    lambda a, i: F.transform(
                        F.slice(F.col("docs"), i + 2, F.size(F.col("docs"))),
                        lambda b: F.struct(
                            a["doc_id"].alias("doc1"),
                            b["doc_id"].alias("doc2"),
                            a["sz"].alias("sz1"),
                            b["sz"].alias("sz2"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.*")
    return (
        pairs.groupBy("doc1", "doc2", "sz1", "sz2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared") / (F.col("sz1") + F.col("sz2") - F.col("n_shared")), 6
            ),
        )
        .where(F.col("jaccard") >= JACCARD_MIN)
        .select("doc1", "doc2", "jaccard")
    )


DEDUP_JACCARD_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
rare AS (
  SELECT shingle FROM sh GROUP BY shingle
  HAVING COUNT(*) <= {DF_CAP}
),
shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
inter AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_shared
  FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc1, doc2,
       ROUND(n_shared * 1.0 / (s1.sz + s2.sz - n_shared), 6) AS jaccard
FROM inter
JOIN sizes s1 ON s1.doc_id = doc1
JOIN sizes s2 ON s2.doc_id = doc2
WHERE ROUND(n_shared * 1.0 / (s1.sz + s2.sz - n_shared), 6) >= {JACCARD_MIN}
"""


# ---------------------------------------------------------------------------
# asymmetric shingle containment — quote / sub-document inclusion
# ---------------------------------------------------------------------------

CONTAIN_MIN = 0.5


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc1, doc2, containment) — asymmetric shingle CONTAINMENT
    |A∩B| / min(|A|, |B|) ≥ 0.5 (Broder 1997's other resemblance measure):
    catches a short document quoted wholesale inside a long one, which
    Jaccard structurally misses (a 20-shingle doc inside a 2000-shingle
    doc has J ≈ 0.01 but containment 1.0). The deciding filter for
    "is this a re-post with commentary" in transcript corpora.

    Same single-scan inverted-index pipeline as ``dedup_ngram_jaccard``
    (posting lists capped at DF_CAP bound the pair fan-out at C(cap, 2)
    per shingle at any corpus size); only the final normalizer differs.
    """
    sh = _shingles(spark, sf_dir)
    sh = sh.withColumn("sz", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    posting = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "sz"))).alias("docs"))
        .where((F.size("docs") >= 2) & (F.size("docs") <= DF_CAP))
    )
    pairs = posting.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("docs"),
                    lambda a, i: F.transform(
                        F.slice(F.col("docs"), i + 2, F.size(F.col("docs"))),
                        lambda b: F.struct(
                            a["doc_id"].alias("doc1"),
                            b["doc_id"].alias("doc2"),
                            a["sz"].alias("sz1"),
                            b["sz"].alias("sz2"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.*")
    return (
        pairs.groupBy("doc1", "doc2", "sz1", "sz2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .withColumn(
            "containment",
            F.round(F.col("n_shared") / F.least("sz1", "sz2"), 6),
        )
        .where(F.col("containment") >= CONTAIN_MIN)
        .select("doc1", "doc2", "containment")
    )


DEDUP_CONTAINMENT_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
rare AS (
  SELECT shingle FROM sh GROUP BY shingle
  HAVING COUNT(*) <= {DF_CAP}
),
shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
inter AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_shared
  FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc1, doc2,
       ROUND(n_shared * 1.0 / LEAST(s1.sz, s2.sz), 6) AS containment
FROM inter
JOIN sizes s1 ON s1.doc_id = doc1
JOIN sizes s2 ON s2.doc_id = doc2
WHERE ROUND(n_shared * 1.0 / LEAST(s1.sz, s2.sz), 6) >= {CONTAIN_MIN}
"""


# ---------------------------------------------------------------------------
# SimHash fingerprints
# ---------------------------------------------------------------------------


def _simhash_bit_value(b: int) -> int:
    """Two's-complement value of bit ``b`` in a signed int64 fingerprint.

    Bit 63 is the sign bit: its contribution is −2^63 (``1 << 63``
    overflows signed 64-bit — DuckDB range-checks the shift, Spark ANSI
    the add — so both engines assemble the fingerprint from this value)."""
    return -(1 << 63) if b == 63 else (1 << b)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash) — 64-bit simhash over token hashes.

    Bit b = sign of Σ_tokens (±1 by token-hash bit b). The 64 per-bit
    sums ride ONE wide map-side-combined aggregation (64 ``sum`` columns
    over the token stream) — not a 64× bit-explode through the shuffle —
    and the fingerprint assembles in a single projection, so the only
    shuffle moves one 64-int row per document."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = docs.select("doc_id", F.explode(toks_col()).alias("tok")).select(
        "doc_id", h64_col(F.col("tok")).alias("h")
    )
    sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(F.expr(f"(shiftright(h, {b}) & 1) * 2 - 1")).alias(f"s{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    fp_terms = [
        F.when(F.col(f"s{b}") > 0, F.lit(_simhash_bit_value(b))).otherwise(F.lit(0))
        for b in range(SIMHASH_BITS)
    ]
    fp = fp_terms[0]
    for term in fp_terms[1:]:
        fp = fp + term
    return sums.select("doc_id", fp.cast("long").alias("simhash"))


DEDUP_SIMHASH_SQL = f"""
WITH tok AS (
  SELECT doc_id, {h64_sql('tok')} AS h
  FROM (SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents)
),
bits AS (
  SELECT doc_id, b, SUM(2 * ((h >> b) & 1) - 1) AS s
  FROM tok, UNNEST(range(0, {SIMHASH_BITS})) AS t(b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN
                  (CASE WHEN b = 63 THEN -9223372036854775807 - 1
                        ELSE (1::BIGINT << b) END)
                ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# SimHash hamming-near pairs (banded bucket join)
# ---------------------------------------------------------------------------

_BAND_MASK = (1 << SIMHASH_BAND_BITS) - 1


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc1, doc2, hamming) — all pairs at hamming distance ≤ HAMMING_MAX.

    The fingerprint splits into SIMHASH_BANDS disjoint bit bands; a pair
    with ≤ bands−1 differing bits must match exactly on at least one band
    (pigeonhole), so the (band, band_key) bucket self-join is *complete*
    for the threshold while doing Σ bucket² work instead of n². The exact
    distance then filters candidates via ``bit_count(xor)``. With 16-bit
    band keys (65,536 buckets per band) the bucket sizes stay O(n/65k),
    so Σ bucket² is genuinely subquadratic at corpus scale. Fingerprints
    are persisted so the corpus simhash build runs once, not once per
    join side (released by the harness via caching.release_caches)."""
    fp = persist_tracked(dedup_simhash(spark, sf_dir))
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BANDS - 1))).alias("band"),
    ).select(
        "doc_id",
        "simhash",
        "band",
        F.expr(
            f"shiftright(simhash, band * {SIMHASH_BAND_BITS}) & {_BAND_MASK}"
        ).alias("bkey"),
    )
    a = bands.select(
        "band", "bkey", F.col("doc_id").alias("doc1"), F.col("simhash").alias("s1")
    )
    b = bands.select(
        "band", "bkey", F.col("doc_id").alias("doc2"), F.col("simhash").alias("s2")
    )
    cand = (
        a.join(b, ["band", "bkey"])
        .where(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2", "s1", "s2")
        .distinct()
    )
    return (
        cand.select(
            "doc1",
            "doc2",
            F.expr("bit_count(s1 ^ s2)").cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= HAMMING_MAX)
    )


DEDUP_SIMHASH_PAIRS_SQL = f"""
WITH fp AS ({DEDUP_SIMHASH_SQL}),
bands AS (
  SELECT doc_id, simhash, b AS band,
         (simhash >> (b * {SIMHASH_BAND_BITS})) & {_BAND_MASK} AS bkey
  FROM fp, UNNEST(range(0, {SIMHASH_BANDS})) AS t(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
                  a.simhash AS s1, b.simhash AS s2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT doc1, doc2, CAST(bit_count(xor(s1, s2)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(s1, s2)) <= {HAMMING_MAX}
"""


# ---------------------------------------------------------------------------
# cluster assignment — the dedup *action*
# ---------------------------------------------------------------------------

# near-dup decision threshold on the estimated Jaccard (matching minhash
# components / 16); pairs at or above it are considered duplicates and
# clustered transitively.
DUP_EST_MIN = 0.5
_NODE_W = 12  # zero-pad width: string min == numeric min for int64 doc ids


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, canonical_doc_id, cluster_size, keep) — the per-document
    dedup decision table: near-dup pairs (minhash est_jaccard ≥ 0.5) are
    closed transitively via connected components, each cluster keeps its
    minimum doc_id, and every corpus document appears (non-duplicated docs
    are their own singleton cluster).

    This is the step that turns pair *detection* into the drop decision a
    corpus pipeline actually executes. Scale shape: the pair graph is tiny
    relative to the corpus (only near-dup docs appear), components run
    over that graph alone (driver union-find when small, hash-min / star
    contraction otherwise — operators/canonicalize.py), and the corpus
    joins the vertex-sized label table once. Doc ids ride as zero-padded
    fixed-width strings so the CC min-label order equals numeric order.
    """
    from ed_twitter_spark.operators.canonicalize import connected_components

    def node(c):
        return F.lpad(c.cast("string"), _NODE_W, "0")

    pairs = dedup_minhash_lsh(spark, sf_dir).where(
        F.col("est_jaccard") >= DUP_EST_MIN
    )
    edges = pairs.select(node(F.col("doc1")).alias("src"), node(F.col("doc2")).alias("dst"))
    comp = connected_components(edges)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", node(F.col("doc_id")).alias("node")
    )
    lab = docs.join(comp, on="node", how="left").select(
        "doc_id", F.coalesce("component", "node").alias("component")
    )
    sizes = lab.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return lab.join(sizes, on="component").select(
        "doc_id",
        F.col("component").cast("long").alias("canonical_doc_id"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
        (F.col("doc_id") == F.col("component").cast("long")).alias("keep"),
    )


DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE
pairs AS (
  SELECT doc1, doc2 FROM ({DEDUP_MINHASH_SQL}) mhp
  WHERE est_jaccard >= {DUP_EST_MIN}
),
edges0 AS (
  SELECT lpad(CAST(doc1 AS VARCHAR), {_NODE_W}, '0') AS src,
         lpad(CAST(doc2 AS VARCHAR), {_NODE_W}, '0') AS dst
  FROM pairs
),
edges AS (
  SELECT src, dst FROM edges0
  UNION
  SELECT dst AS src, src AS dst FROM edges0
),
cnodes AS (SELECT DISTINCT src AS node FROM edges),
reach AS (
  SELECT node, node AS r FROM cnodes
  UNION
  SELECT e.src AS node, reach.r
  FROM edges e JOIN reach ON e.dst = reach.node
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
docs AS (
  SELECT doc_id, lpad(CAST(doc_id AS VARCHAR), {_NODE_W}, '0') AS node
  FROM documents
),
lab AS (
  SELECT d.doc_id, COALESCE(c.component, d.node) AS component
  FROM docs d LEFT JOIN comp c ON c.node = d.node
),
sizes AS (SELECT component, COUNT(*) AS n FROM lab GROUP BY component)
SELECT l.doc_id,
       CAST(l.component AS BIGINT)  AS canonical_doc_id,
       CAST(s.n AS BIGINT)          AS cluster_size,
       l.doc_id = CAST(l.component AS BIGINT) AS keep
FROM lab l JOIN sizes s ON s.component = l.component
"""


# ---------------------------------------------------------------------------
# exact substring dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better" — the ExactSubstr variant, re-expressed
# relationally: instead of a monolithic suffix array, duplicated
# fixed-length token windows are found by one hash aggregation and then
# merged into maximal duplicated spans per document)
# ---------------------------------------------------------------------------

SUBSTR_K = 8  # window length in tokens; spans below this are never flagged


def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, span_start, span_end, span_tokens, n_windows) — maximal
    per-document token spans formed by merging overlapping-or-touching
    SUBSTR_K-windows that each occur in at least one OTHER document
    (1-based token positions, inclusive). Note the invariant is per
    MERGED WINDOW, not per span position: inside a span, windows at
    intermediate offsets between two merged duplicated windows need not
    themselves be duplicated — every TOKEN of the span is covered by ≥1
    cross-document window, which is the ExactSubstr removal contract.

    Pipeline is linear in the corpus — the crucial difference from the
    pairwise dedup operators: duplication here is a per-window boolean
    (``appears in ≥2 distinct docs``), so there is NO pair fan-out and no
    df-cap is needed; a window shared by a million documents costs one
    aggregation row, not C(10^6, 2) pairs. Stages: (1) rolling
    SUBSTR_K-token windows per doc via sequence+slice inside one
    projection (no explode until the windows exist — each token appears
    in ≤ SUBSTR_K windows, so the exploded stream is K× the token
    stream); windows are carried as 64-bit md5 hashes, never as strings;
    (2) groupBy(hash) → distinct-doc count ≥ 2 (map-side combined);
    (3) semi-join the window stream against the duplicated hashes;
    (4) merge hit windows into maximal spans with the classic
    gaps-and-islands trick (lag + running sum per doc) — windows at
    positions p1 < p2 merge when p2 − p1 ≤ K, i.e. they overlap or touch.

    At 10^12 turns every stage is a hash shuffle on window-hash or
    doc_id; nothing is quadratic and no driver state exists. The known
    cost vs a suffix array is K× window expansion and the fixed minimum
    match length K.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the K-slice + md5 explode is the expensive projection, and without a
    # repartition it runs at the parquet's row-group split count (2 tasks
    # on the sf1 fixture, whatever the file layout gives in production) —
    # the input-split-parallelism trap the skew stress caught for the
    # cosine join; one narrow shuffle of the token arrays fixes it
    toks = (
        docs.select("doc_id", toks_col().alias("t"))
        .where(F.size("t") >= SUBSTR_K)
        .repartition("doc_id")
    )
    # persisted: the gram stream feeds BOTH the duplicated-hash aggregation
    # and the position semi-join — without it the K-slice + md5 explode
    # runs twice (released via release_caches)
    grams = persist_tracked(
        toks.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (SUBSTR_K - 1)),
                    lambda i: h64_col(
                        F.array_join(F.slice(F.col("t"), i, SUBSTR_K), " ")
                    ),
                )
            ).alias("pos0", "gh"),
        ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gh")
    )

    dup = (
        grams.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gh")
    )
    hits = grams.join(dup, "gh", "left_semi").select("doc_id", "pos")

    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = hits.withColumn(
        "flag",
        F.when(F.col("pos") - F.lag("pos").over(w) <= SUBSTR_K, F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn("grp", F.sum("flag").over(w))
    return (
        flagged.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (SUBSTR_K - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_windows",
        )
    )


DEDUP_SUBSTRING_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
grams AS (
  SELECT doc_id, i AS pos,
         {h64_sql("array_to_string(t[i:i+" + str(SUBSTR_K - 1) + "], ' ')")} AS gh
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - {SUBSTR_K - 1} + 1)) AS i
        FROM toks WHERE len(t) >= {SUBSTR_K})
),
dup AS (SELECT gh FROM grams GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT doc_id, pos FROM grams JOIN dup USING (gh)),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {SUBSTR_K} THEN 0 ELSE 1 END AS flag
  FROM hits
),
grouped AS (
  SELECT doc_id, pos,
         SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM flagged
)
SELECT doc_id,
       MIN(pos) AS span_start,
       MAX(pos) + {SUBSTR_K - 1} AS span_end,
       MAX(pos) + {SUBSTR_K - 1} - MIN(pos) + 1 AS span_tokens,
       COUNT(*) AS n_windows
FROM grouped
GROUP BY doc_id, grp
ORDER BY doc_id, span_start
"""


def dedup_substring_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_before, n_after, clean_text) — the corpus with every
    duplicated span removed: the actionable ExactSubstr output (flag →
    REMOVE). Policy: all occurrences of a duplicated span are dropped,
    the released ExactSubstr tool's default (keeping one canonical copy
    would need a per-window global owner — ill-defined once windows
    merge into spans whose parts are shared with different documents).

    Plan: the span table (already linear to produce) aggregates to ≤1
    row per affected doc, joins the corpus once, and the removal is a
    higher-order ``filter`` over the token array against the doc's own
    span list — per-row JVM work, no Python, no extra shuffle beyond
    the span join.
    """
    spans = (
        dedup_substring(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"), F.col("span_end").alias("e")
                )
            ).alias("spans")
        )
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", toks_col().alias("toks")
    )
    j = docs.join(spans, "doc_id", "left").withColumn(
        "spans",
        F.coalesce("spans", F.array().cast("array<struct<s:int,e:int>>")),
    )
    clean = F.expr(
        "filter(toks, (x, i) -> "
        "NOT exists(spans, sp -> i + 1 >= sp.s AND i + 1 <= sp.e))"
    )
    return j.select(
        "doc_id",
        F.size("toks").alias("n_before"),
        F.size(clean).alias("n_after"),
        F.array_join(clean, " ").alias("clean_text"),
    )


DEDUP_SUBSTRING_CLEAN_SQL = f"""
WITH spans AS (
  SELECT doc_id, list(struct_pack(s := span_start, e := span_end)) AS sp
  FROM ({DEDUP_SUBSTRING_SQL}) GROUP BY doc_id
),
t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
cleaned AS (
  SELECT t.doc_id, t.toks,
         list_filter(t.toks, (x, i) ->
           len(list_filter(COALESCE(s.sp, []),
                           q -> i >= q.s AND i <= q.e)) = 0) AS clean
  FROM t LEFT JOIN spans s ON s.doc_id = t.doc_id
)
SELECT doc_id,
       len(toks) AS n_before,
       len(clean) AS n_after,
       -- Spark array_join of an empty array is ''; DuckDB returns NULL
       COALESCE(array_to_string(clean, ' '), '') AS clean_text
FROM cleaned
"""


# ---------------------------------------------------------------------------
# cross-source corpus similarity — the mixing-table datasheet row
# ---------------------------------------------------------------------------
#
# Before weighting sources in a training mix, the first question is how
# much they overlap: near-identical sources double-count their tokens at
# any mixing ratio, disjoint ones genuinely diversify. Per source pair
# this emits BOTH the exact shingle-set Jaccard and the 16-component
# MinHash estimate of it — at fixture scale the exact number certifies
# the estimator's error; at 100 TB the sketch is the survivor: per-source
# sketches are one wide map-side-combined aggregation (16 min() columns,
# the dedup_minhash_lsh scheme with the source as the key), constant rows
# per source, pairwise comparison over a source-count-sized table. The
# exact path shuffles once on shingle (map-side distinct combine) and its
# self-join fan-out is Σ per-shingle sources² with sources ≪ corpus — the
# standard inverted-index bound, but linear in distinct shingles, which
# is why the sketch column is the one a 1000-executor run keeps.


def source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src1, src2, n_sh1, n_sh2, n_common, jaccard, mh_agree,
    est_jaccard) for every unordered source pair — exact distinct-shingle
    Jaccard plus its MinHash estimate, integer-exact cross-engine."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh3 = F.expr(
        "transform(sequence(0, size(toks) - 3), "
        "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))"
    )
    raw = (
        docs.select("source", toks_col().alias("toks"))
        .where(F.size("toks") >= 3)
        .select("source", F.explode(sh3).alias("shingle"))
    )

    hx = F.md5(F.col("shingle"))
    hashed = raw.select(
        "source",
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(hx, 9, 8), 16, 10).cast("long").alias("h2"),
    )
    mh = hashed.groupBy("source").agg(
        *[
            F.min(F.expr(f"(h1 + {i} * h2) % 4294967296")).alias(f"mh{i}")
            for i in range(N_MINHASH)
        ]
    )

    dist = raw.distinct()
    sizes = dist.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    a = dist.select(F.col("source").alias("src1"), "shingle")
    b = dist.select(F.col("source").alias("src2"), "shingle")
    common = (
        a.join(b, on="shingle")
        .where(F.col("src1") < F.col("src2"))
        .groupBy("src1", "src2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )

    s1 = sizes.select(F.col("source").alias("src1"), F.col("n_sh").alias("n_sh1"))
    s2 = sizes.select(F.col("source").alias("src2"), F.col("n_sh").alias("n_sh2"))
    pairs = (
        s1.crossJoin(s2)
        .where(F.col("src1") < F.col("src2"))
        .join(common, on=["src1", "src2"], how="left")
        .withColumn("n_common", F.coalesce("n_common", F.lit(0)))
    )

    m1 = mh.select(
        F.col("source").alias("src1"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(N_MINHASH)]
    )
    m2 = mh.select(
        F.col("source").alias("src2"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(N_MINHASH)]
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    return (
        pairs.join(F.broadcast(m1), on="src1")
        .join(F.broadcast(m2), on="src2")
        .select(
            "src1",
            "src2",
            F.col("n_sh1").cast("long"),
            F.col("n_sh2").cast("long"),
            F.col("n_common").cast("long"),
            F.round(
                F.col("n_common")
                / (F.col("n_sh1") + F.col("n_sh2") - F.col("n_common")),
                6,
            ).alias("jaccard"),
            agree.cast("int").alias("mh_agree"),
            F.round(agree / F.lit(float(N_MINHASH)), 6).alias("est_jaccard"),
        )
    )


SOURCE_SIMILARITY_SQL = f"""
WITH raw AS (
  SELECT source, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM (SELECT source, {TOKS_SQL} AS toks FROM documents),
       UNNEST(range(1, len(toks) - 1)) AS t(i)
  WHERE len(toks) >= 3
),
hh AS (
  SELECT source,
         CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS h2
  FROM raw
),
mh AS (
  SELECT source, i, MIN((h1 + i * h2) % 4294967296) AS mh
  FROM hh, UNNEST(range(0, {N_MINHASH})) AS t(i)
  GROUP BY source, i
),
dist AS (SELECT DISTINCT source, shingle FROM raw),
sizes AS (SELECT source, COUNT(*) AS n_sh FROM dist GROUP BY source),
common AS (
  SELECT a.source AS src1, b.source AS src2, COUNT(*) AS n_common
  FROM dist a JOIN dist b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY a.source, b.source
),
pairs AS (
  SELECT s1.source AS src1, s2.source AS src2,
         s1.n_sh AS n_sh1, s2.n_sh AS n_sh2,
         COALESCE(c.n_common, 0) AS n_common
  FROM sizes s1 JOIN sizes s2 ON s1.source < s2.source
  LEFT JOIN common c ON c.src1 = s1.source AND c.src2 = s2.source
),
agree AS (
  SELECT a.source AS src1, b.source AS src2,
         SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS mh_agree
  FROM mh a JOIN mh b ON a.i = b.i AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT p.src1, p.src2,
       CAST(p.n_sh1 AS BIGINT) AS n_sh1,
       CAST(p.n_sh2 AS BIGINT) AS n_sh2,
       CAST(p.n_common AS BIGINT) AS n_common,
       ROUND(p.n_common * 1.0 / (p.n_sh1 + p.n_sh2 - p.n_common), 6) AS jaccard,
       CAST(g.mh_agree AS INTEGER) AS mh_agree,
       ROUND(g.mh_agree / {float(N_MINHASH)}, 6) AS est_jaccard
FROM pairs p JOIN agree g ON g.src1 = p.src1 AND g.src2 = p.src2
"""


# ---------------------------------------------------------------------------
# per-document n-gram novelty — the memorization-pressure score
# ---------------------------------------------------------------------------
#
# Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
# Better") measure duplication not only pairwise but as the fraction of a
# document's n-grams that recur elsewhere in the corpus — the signal that
# predicts verbatim memorization. Per document over its DISTINCT word
# 3-gram shingles: dup_frac = |{s : corpus-DF(s) ≥ 2}| / |shingles|,
# novelty = 1 − dup_frac. Unlike the pairwise rungs (which need a
# DF_CAP to bound pair fan-out) this has NO quadratic term anywhere: one
# shuffle keys the shingle stream for the DF count, the DF column joins
# back co-partitioned on the same key, and one doc-keyed aggregation
# emits the score — every stage is a map-side-combined hash aggregation
# at any corpus size. Docs with < 3 tokens have no shingles and are
# excluded (same domain as the other shingle rungs).


def doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_shingles, n_dup, novelty) — the fraction of each
    document's distinct 3-gram shingles that are corpus-unique."""
    sh = _shingles(spark, sf_dir)
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(df_counts, on="shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_dup",
            F.round(1.0 - F.col("n_dup") / F.col("n_shingles"), 6).alias(
                "novelty"
            ),
        )
    )


DOC_NOVELTY_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
dfc AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle)
SELECT sh.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN dfc.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       ROUND(1.0 - SUM(CASE WHEN dfc.df >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS novelty
FROM sh JOIN dfc USING (shingle)
GROUP BY sh.doc_id
"""


# ---------------------------------------------------------------------------
# dedup savings — the cluster-size histogram + reduction ratio
# ---------------------------------------------------------------------------


def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cluster_size, n_clusters, n_docs, n_dropped) — the "what does
    dedup buy" datasheet row set: for each cluster size in the
    transitive dedup decision (dedup_clusters), how many clusters exist,
    how many documents they hold, and how many of those the keep rule
    drops. Σ n_dropped / Σ n_docs is the corpus reduction ratio; a long
    tail of big clusters is the boilerplate signature that motivates the
    exact-substring pass on top of document-level dedup.

    Plan shape: one aggregation over the (corpus-sized but narrow)
    decision table keyed by cluster_size — a bounded, heavy-hit key
    domain (sizes ≤ the biggest cluster), map-side combined."""
    d = dedup_clusters(spark, sf_dir)
    return d.groupBy("cluster_size").agg(
        F.countDistinct("canonical_doc_id").cast("long").alias("n_clusters"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((~F.col("keep")).cast("int")).cast("long").alias("n_dropped"),
    )


DEDUP_CLUSTER_STATS_SQL = f"""
WITH base AS ({DEDUP_CLUSTERS_SQL})
SELECT cluster_size,
       CAST(COUNT(DISTINCT canonical_doc_id) AS BIGINT) AS n_clusters,
       CAST(COUNT(*) AS BIGINT)                         AS n_docs,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM base
GROUP BY cluster_size
"""
