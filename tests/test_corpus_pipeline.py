"""The composed corpus pipeline: stage consistency + status precedence.

The driver gate proves Spark ≡ the end-to-end DuckDB twin; these tests
pin (a) that every stage of the composition agrees with its STANDALONE
gated operator on the fixture corpus, and (b) the status precedence on a
hand corpus that hits every branch (including the ones the synthetic
corpus happens not to exercise, like quality-passing duplicates).
"""

from __future__ import annotations

import pytest
from conftest import SF_CORRECT

from ed_twitter_spark.operators import corpus_pipeline as cp
from ed_twitter_spark.operators.corpus_filters import EVAL_MOD
from ed_twitter_spark.operators.packing import PACK_BUDGET
from ed_twitter_spark.operators.textstats import quality_gopher


@pytest.fixture(scope="module")
def result(spark):
    return cp.corpus_pipeline(spark, SF_CORRECT).toPandas().set_index("doc_id")


def test_stage_consistency_with_standalone_operators(spark, result):
    # eval holdout is exactly the doc_id % EVAL_MOD == 0 set
    holdout = set(result[result.status == "eval_holdout"].index)
    assert holdout == {d for d in result.index if d % EVAL_MOD == 0}
    # low_quality is exactly the gopher keep=False set (minus holdout)
    keep = (
        quality_gopher(spark, SF_CORRECT)
        .toPandas()
        .set_index("doc_id")["keep"]
        .to_dict()
    )
    lowq = set(result[result.status == "low_quality"].index)
    assert lowq == {d for d, k in keep.items() if not k and d % EVAL_MOD != 0}
    # train/val/test statuses agree with the dataset_split bucket rule
    import hashlib

    for d, row in result.iterrows():
        if row.status in {"train", "val", "test"}:
            b = int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 100
            want = "train" if b < 80 else ("val" if b < 90 else "test")
            assert row.status == want, d
    # bin ids: only train docs are packed; -1 everywhere else
    assert (result[result.status != "train"].bin_idx == -1).all()
    assert (result[result.status == "train"].bin_idx >= 0).all()


def test_train_bins_respect_budget(spark, result):
    import re

    docs = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id", "source", "text")
        .toPandas()
        .set_index("doc_id")
    )
    train = result[result.status == "train"]
    ntok = {d: len(re.split(r"\s+", docs.loc[d, "text"])) for d in train.index}
    for (src, b), g in train.groupby([docs.source.reindex(train.index), "bin_idx"]):
        total = sum(ntok[d] for d in g.index)
        assert total <= PACK_BUDGET or len(g) == 1, (src, b)


def test_status_precedence_on_hand_corpus(spark, tmp_path):
    # quality-passing text: 50 4-letter alpha words incl. a stopword
    good = ("the " + "word " * 49).strip()
    # a second, distinct good text for the contamination pair
    good2 = ("the " + "tion " * 49).strip()
    rows = [
        (0, "s", good2),          # eval_holdout (doc 0) — defines the eval grams
        (1, "s", "short text"),   # low_quality (< 50 words)
        (2, "s", good),           # train/val/test (canonical of the dup pair)
        (3, "s", good),           # duplicate of 2
        (4, "s", good2),          # contaminated: shares all grams with doc 0
        (5, "s", good + " zzzz"), # distinct survivor
    ]
    p = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(d, t, "en", s, len(t)) for d, s, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{p}/documents.parquet")
    got = cp.corpus_pipeline(spark, p).toPandas().set_index("doc_id")
    assert got.loc[0, "status"] == "eval_holdout"
    assert got.loc[1, "status"] == "low_quality"
    assert got.loc[2, "status"] in {"train", "val", "test"}
    assert got.loc[3, "status"] == "duplicate"
    assert got.loc[4, "status"] == "contaminated"
    assert got.loc[5, "status"] in {"train", "val", "test"}


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (corpus_filters.decontaminate_bloom)
# ---------------------------------------------------------------------------


def test_bloom_decontamination_one_sided(spark):
    """The Bloom variant is a strict superset of the exact answer —
    every truly contaminated doc is flagged with n_flagged >= n_exact
    (no false negatives, the safe failure direction)."""
    from ed_twitter_spark.operators.corpus_filters import (
        decontaminate,
        decontaminate_bloom,
    )

    exact = (
        decontaminate(spark, SF_CORRECT)
        .toPandas()
        .set_index("doc_id")["n_collisions"]
        .to_dict()
    )
    bloom = decontaminate_bloom(spark, SF_CORRECT).toPandas().set_index("doc_id")
    assert set(exact) <= set(bloom.index)
    for d, n in exact.items():
        assert bloom.loc[d, "n_exact_collisions"] == n
        assert bloom.loc[d, "n_flagged_grams"] >= n
    assert (bloom.n_flagged_grams >= bloom.n_exact_collisions).all()


def test_bloom_matches_python_transcription(spark):
    import hashlib
    import re

    from ed_twitter_spark.operators.corpus_filters import (
        BLOOM_K,
        BLOOM_M,
        DECON_N,
        EVAL_MOD,
        decontaminate_bloom,
    )
    from conftest import SF_SMOKE

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
        .set_index("doc_id")["text"]
        .to_dict()
    )

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def grams(t):
        toks = re.split(r"\s+", t)
        return {
            " ".join(toks[i : i + DECON_N]) for i in range(len(toks) - DECON_N + 1)
        }

    bits = set()
    for d, t in docs.items():
        if d % EVAL_MOD == 0:
            for g in grams(t):
                bits.update(h32(f"{k}:{g}") % BLOOM_M for k in range(BLOOM_K))
    expected = {}
    for d, t in docs.items():
        if d % EVAL_MOD == 0:
            continue
        n = sum(
            1
            for g in grams(t)
            if all(h32(f"{k}:{g}") % BLOOM_M in bits for k in range(BLOOM_K))
        )
        if n:
            expected[d] = n
    got = (
        decontaminate_bloom(spark, SF_SMOKE)
        .toPandas()
        .set_index("doc_id")["n_flagged_grams"]
        .to_dict()
    )
    assert got == expected


# ---------------------------------------------------------------------------
# temperature sampling (corpus_filters.dataset_sample_temperature)
# ---------------------------------------------------------------------------


def test_temperature_sampling_matches_transcription(spark):
    import hashlib
    import math
    import re

    from conftest import SF_SMOKE

    from ed_twitter_spark.operators.corpus_filters import (
        TEMP_BUDGET,
        dataset_sample_temperature,
    )

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source", "text")
        .toPandas()
    )
    docs["n_tok"] = docs.text.map(lambda t: len(re.split(r"\s+", t)))
    tok = docs.groupby("source").n_tok.sum().to_dict()
    tok_max = max(tok.values())
    quota = {
        s: max(1, math.floor(float(TEMP_BUDGET) * math.sqrt(n) / math.sqrt(tok_max)))
        for s, n in tok.items()
    }
    expected = set()
    for s, g in docs.groupby("source"):
        order = sorted(
            g.doc_id, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)
        )
        expected.update((d, s) for d in order[: quota[s]])
    got = dataset_sample_temperature(spark, SF_SMOKE).toPandas()
    assert {(r.doc_id, r.source) for r in got.itertuples()} == expected
    assert (got.rk <= got.quota).all()
    # temperature flattening: pre-floor, sqrt(x)/sqrt(max) >= x/max for
    # every x <= max; the floor can shave < 1 off the quota, hence +1
    for s, q in got.groupby("source").quota.first().items():
        assert q + 1 > TEMP_BUDGET * tok[s] / tok_max
