"""DSIR importance-resampling tests.

The gate (tools/oracle_check.py) pins Spark ≡ DuckDB for `dataset_dsir`;
these tests pin both against a THIRD independent transcription — a plain
Python bag-of-hashed-ngrams estimator (Xie et al. 2023 eq. 3) — and audit
the plan shape the 100-TB story depends on (broadcast log-ratio join,
bounded global ranking window).
"""

from __future__ import annotations

import collections
import hashlib
import math
import re

import pytest

from tests.conftest import SF_SMOKE


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_dsir(rows, n_buckets, target_source):
    """Reference transcription: hashed unigram+bigram occurrence counts,
    add-1 smoothed target/raw bucket distributions, per-doc log ratio."""
    raw = collections.Counter()
    tgt = collections.Counter()
    per_doc = {}
    nr = nt = 0
    for doc_id, source, text in rows:
        toks = re.split(r"\s+", text)
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        bs = [_h32(f) % n_buckets for f in feats]
        per_doc[doc_id] = collections.Counter(bs)
        raw.update(bs)
        nr += len(bs)
        if source == target_source:
            tgt.update(bs)
            nt += len(bs)
    out = {}
    for doc_id, cnts in per_doc.items():
        lw = sum(
            c
            * (
                math.log((tgt.get(b, 0) + 1.0) / (nt + n_buckets))
                - math.log((raw[b] + 1.0) / (nr + n_buckets))
            )
            for b, c in cnts.items()
        )
        out[doc_id] = (sum(cnts.values()), round(lw, 6))
    return out


@pytest.fixture(scope="module")
def docs_rows(spark):
    return [
        (r["doc_id"], r["source"], r["text"])
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    ]


def test_dsir_weights_match_python(spark, docs_rows):
    from ed_twitter_spark.operators.dsir import (
        N_BUCKETS,
        TARGET_SOURCE,
        dsir_weights,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_logw"])
        for r in dsir_weights(docs).collect()
    }
    ref = _py_dsir(docs_rows, N_BUCKETS, TARGET_SOURCE)
    assert set(got) == set(ref)
    for doc_id, (n_ref, lw_ref) in ref.items():
        n_got, lw_got = got[doc_id]
        assert n_got == n_ref
        assert lw_got == pytest.approx(lw_ref, abs=2e-6)


def test_dsir_topk_selection_and_target_enrichment(spark, docs_rows):
    """The selected top-K must be the true top-K by (logw desc, doc_id),
    and the target slice must score higher on average than the rest —
    the property that makes DSIR a selection signal at all."""
    from ed_twitter_spark.operators.dsir import (
        N_BUCKETS,
        TARGET_SOURCE,
        TOP_K,
        q_dataset_dsir,
    )

    ref = _py_dsir(docs_rows, N_BUCKETS, TARGET_SOURCE)
    want = sorted(ref.items(), key=lambda kv: (-kv[1][1], kv[0]))[:TOP_K]
    got = q_dataset_dsir(spark, SF_SMOKE).orderBy("rank").collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    assert [r["rank"] for r in got] == list(range(1, len(want) + 1))

    src = {d: s for d, s, _ in docs_rows}
    tgt_scores = [lw for d, (_, lw) in ref.items() if src[d] == TARGET_SOURCE]
    rest_scores = [lw for d, (_, lw) in ref.items() if src[d] != TARGET_SOURCE]
    assert sum(tgt_scores) / len(tgt_scores) > sum(rest_scores) / len(rest_scores)


def test_dsir_plan_broadcasts_log_ratio_and_bounds_global_window(spark):
    """Scale audit: the ≤N_BUCKETS-row log-ratio table reaches the
    per-(doc,bucket) counts via a broadcast hash join (the document axis
    never shuffles on the bucket key), and the unpartitioned ranking
    window is fed by a per-partition top-K filter, not the raw score
    table."""
    from test_plans import plan_of

    from ed_twitter_spark.operators.dsir import q_dataset_dsir

    plan = plan_of(q_dataset_dsir(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    # two Window nodes: the _p-partitioned local top-K, then the global rank
    assert plan.count("Window") >= 2
    assert "SPARK_PARTITION_ID" in plan.upper() or "spark_partition_id" in plan
