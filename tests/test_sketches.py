"""Sketch operators: Count-Min heavy hitters, HLL distinct, substring dedup.

Each is checked against an independent pure-Python transcription on the
sf0.001 corpus (the driver gate separately checks the DuckDB twins at
sf0.01), plus the structural guarantees the module docstrings claim:
CMS one-sided error, HLL register-table size, substring spans maximal
and genuinely cross-document.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pytest
from conftest import SF_CORRECT, SF_SMOKE

from ed_twitter_spark.operators import sketches as sk
from ed_twitter_spark.operators.dedup import SUBSTR_K, dedup_substring


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
        .set_index("doc_id")["text"]
        .to_dict()
    )


def _tokens(docs):
    for text in docs.values():
        yield from re.split(r"\s+", text)


def test_cms_matches_python_sketch(spark, docs):
    got = sk.heavy_hitters_cms(spark, SF_SMOKE).toPandas().set_index("token")
    exact = Counter(_tokens(docs))
    # transcribe the sketch: DEPTH x WIDTH counters
    cells: Counter = Counter()
    for tok, n in exact.items():
        for d in range(sk.CMS_DEPTH):
            cells[(d, _h32(f"{d}:{tok}") % sk.CMS_WIDTH)] += n
    assert set(got.index) == set(exact)
    for tok, n in exact.items():
        est = min(
            cells[(d, _h32(f"{d}:{tok}") % sk.CMS_WIDTH)] for d in range(sk.CMS_DEPTH)
        )
        assert got.loc[tok, "exact_count"] == n
        assert got.loc[tok, "est_count"] == est


def test_cms_one_sided_error_and_collisions(spark):
    got = sk.heavy_hitters_cms(spark, SF_CORRECT).toPandas()
    # CMS never underestimates...
    assert (got.est_count >= got.exact_count).all()
    # ...and WIDTH < vocabulary forces real collisions, so the min over
    # depths is doing work (not a vacuous pass-through of exact counts)
    assert (got.est_count > got.exact_count).any()


def _hll_transcription(items):
    regs: dict[int, int] = {}
    for it in items:
        h = hashlib.md5(it.encode()).hexdigest()
        reg = int(h[:2], 16)
        v = int(h[2:10], 16)
        rank = 33 if v == 0 else 33 - len(bin(v)[2:])
        regs[reg] = max(regs.get(reg, 0), rank)
    s = sum(2.0**-m for m in regs.values()) + (sk.HLL_M - len(regs))
    alpha_m2 = 0.7213 / (1.0 + 1.079 / sk.HLL_M) * sk.HLL_M * sk.HLL_M
    return alpha_m2 / s, sk.HLL_M - len(regs)


def test_hll_matches_python_sketch(spark, docs):
    row = sk.distinct_sketch(spark, SF_SMOKE).collect()[0]
    shingles = set()
    for text in docs.values():
        t = re.split(r"\s+", text)
        shingles.update(" ".join(t[i : i + 3]) for i in range(len(t) - 2))
    est, zeros = _hll_transcription(shingles)
    assert row.exact_distinct == len(shingles)
    assert row.zero_registers == zeros
    assert row.hll_raw_estimate == pytest.approx(est, rel=0, abs=0)  # exact algebra


def test_hll_estimate_within_expected_error(spark):
    row = sk.distinct_sketch(spark, SF_CORRECT).collect()[0]
    # raw HLL std error is ~1.04/sqrt(m) = 6.5% at m=256; allow 4 sigma
    assert row.exact_distinct > 1000  # the corpus is big enough to mean something
    rel = abs(row.hll_raw_estimate - row.exact_distinct) / row.exact_distinct
    assert rel < 0.26


def test_substring_spans_match_python(spark, docs):
    got = dedup_substring(spark, SF_SMOKE).toPandas()
    # transcription: windows -> cross-doc duplicated -> merged spans
    windows: dict[str, set[int]] = {}
    toks = {d: re.split(r"\s+", t) for d, t in docs.items()}
    for d, t in toks.items():
        for i in range(len(t) - SUBSTR_K + 1):
            windows.setdefault(" ".join(t[i : i + SUBSTR_K]), set()).add(d)
    dup = {g for g, ds in windows.items() if len(ds) >= 2}
    expected = []
    for d, t in toks.items():
        hits = [
            i + 1
            for i in range(len(t) - SUBSTR_K + 1)
            if " ".join(t[i : i + SUBSTR_K]) in dup
        ]
        spans: list[list[int]] = []
        for p in hits:
            if spans and p - spans[-1][1] <= SUBSTR_K:
                spans[-1][1] = p
                spans[-1][2] += 1
            else:
                spans.append([p, p, 1])
        for s, e, n in spans:
            expected.append((d, s, e + SUBSTR_K - 1, e + SUBSTR_K - 1 - s + 1, n))
    assert sorted(map(tuple, got.itertuples(index=False))) == sorted(expected)


def test_substring_spans_structural(spark):
    got = dedup_substring(spark, SF_CORRECT).toPandas()
    assert len(got) > 0
    # every span is at least one full window long
    assert (got.span_tokens >= SUBSTR_K).all()
    assert (got.span_tokens == got.span_end - got.span_start + 1).all()
    # spans within a doc are maximal: disjoint and non-adjacent (gap > K
    # would have merged them)
    for _, g in got.groupby("doc_id"):
        g = g.sort_values("span_start")
        starts, ends = g.span_start.to_numpy(), g.span_end.to_numpy()
        # last window of the previous span starts at end-K+1; the next
        # span's first window must sit more than K past it, else merged
        assert (starts[1:] - (ends[:-1] - SUBSTR_K + 1) > SUBSTR_K).all()
        assert (starts[1:] > ends[:-1]).all()


def test_substring_clean_matches_spans(spark, docs):
    from ed_twitter_spark.operators.dedup import dedup_substring_clean

    spans = dedup_substring(spark, SF_SMOKE).toPandas()
    got = dedup_substring_clean(spark, SF_SMOKE).toPandas().set_index("doc_id")
    by_doc = {
        d: [(r.span_start, r.span_end) for r in g.itertuples()]
        for d, g in spans.groupby("doc_id")
    }
    for d, text in docs.items():
        toks = re.split(r"\s+", text)
        cover = by_doc.get(d, [])
        keep = [
            t
            for i, t in enumerate(toks, 1)
            if not any(s <= i <= e for s, e in cover)
        ]
        row = got.loc[d]
        assert row.n_before == len(toks)
        assert row.n_after == len(keep)
        assert row.clean_text == " ".join(keep)
    # removal is real on this corpus: some doc lost tokens, none gained
    assert (got.n_after <= got.n_before).all()
    assert (got.n_after < got.n_before).any()
