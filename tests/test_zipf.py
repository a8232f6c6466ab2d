"""zipf_fit correctness pins: a hand fixture with a known OLS answer
(numpy transcription) and the corpus-level diagnostic semantics."""

import math

import pytest
from conftest import SF_CORRECT

from ed_twitter_spark.operators.textstats import zipf_fit


def _ols(freqs):
    """Numpy-free transcription of the fit: 6-dp-rounded log terms,
    exact sums, closed form — what both engines compute."""
    ranked = sorted(freqs, reverse=True)
    xs = [round(math.log(i + 1), 6) for i in range(len(ranked))]
    ys = [round(math.log(f), 6) for f in ranked]
    n = len(ranked)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    cov, varx, vary = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    return round(cov / varx, 6), round(cov * cov / (varx * vary), 6)


def test_zipf_fit_hand_fixture(spark, tmp_path):
    """freq profile 8/4/2/1 over four types — slope and r² must equal the
    closed-form transcription."""
    rows = (
        [("a " * 8).strip()] + [("b " * 4).strip()] + [("c c")] + ["d"]
    )
    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)], "doc_id LONG, text STRING")
    p = str(tmp_path / "documents.parquet")
    df.write.parquet(p)
    got = zipf_fit(spark, str(tmp_path)).collect()[0]
    slope, r2 = _ols([8, 4, 2, 1])
    assert got["n_types"] == 4
    assert got["n_tokens"] == 15
    assert got["zipf_slope"] == pytest.approx(slope, abs=1e-6)
    assert got["zipf_r2"] == pytest.approx(r2, abs=1e-6)
    # a genuinely Zipfian profile fits tightly with a negative slope
    assert slope < -0.9 and r2 > 0.9


def test_zipf_fit_flags_flat_synthetic_corpus(spark):
    """The synthetic corpus is near-uniform over its small vocabulary —
    the diagnostic must report a flat slope and a poor fit (that IS the
    'not natural language' signal the datasheet row exists for)."""
    got = zipf_fit(spark, SF_CORRECT).collect()[0]
    assert got["n_types"] > 0 and got["n_tokens"] > got["n_types"]
    assert -0.6 < got["zipf_slope"] < 0.0
    assert 0.0 <= got["zipf_r2"] < 0.5
