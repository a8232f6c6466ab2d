"""Chunking + greedy sequence packing: reconstruction and bin invariants.

The driver gate checks the DuckDB twins at sf0.01; these tests pin the
SEMANTICS: chunks reconstruct the document exactly (overlap included),
and packing is the greedy recurrence — bins never exceed the budget
except for single oversized documents, and every bin break is forced.
"""

from __future__ import annotations

import re

import pytest
from conftest import SF_CORRECT, SF_SMOKE

from ed_twitter_spark.operators import packing as pk


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source", "text")
        .toPandas()
        .set_index("doc_id")
    )


def test_chunks_reconstruct_documents(spark, docs):
    got = pk.chunk_documents(spark, SF_SMOKE).toPandas()
    stride = pk.CHUNK_N - pk.CHUNK_OVERLAP
    for doc_id, g in got.groupby("doc_id"):
        toks = re.split(r"\s+", docs.loc[doc_id, "text"])
        g = g.sort_values("chunk_idx")
        # starts advance by exactly the stride and cover the whole text
        assert list(g.chunk_start) == [1 + k * stride for k in range(len(g))]
        assert g.chunk_start.iloc[-1] <= len(toks)
        assert g.chunk_start.iloc[-1] + stride > len(toks)
        for _, row in g.iterrows():
            want = toks[row.chunk_start - 1 : row.chunk_start - 1 + pk.CHUNK_N]
            assert row.chunk_text == " ".join(want)
            assert row.n_tokens == len(want)


def test_chunks_overlap_contract(spark):
    got = pk.chunk_documents(spark, SF_CORRECT).toPandas()
    stride = pk.CHUNK_N - pk.CHUNK_OVERLAP
    full = got[got.n_tokens == pk.CHUNK_N]
    for doc_id, g in got.groupby("doc_id"):
        g = g.sort_values("chunk_idx")
        for prev, nxt in zip(g.itertuples(), list(g.itertuples())[1:]):
            if prev.n_tokens == pk.CHUNK_N:
                # the next chunk re-covers the trailing OVERLAP tokens
                tail = prev.chunk_text.split(" ")[stride:]
                head = nxt.chunk_text.split(" ")[: len(tail)]
                assert head == tail
    assert len(full) > 0


def test_pack_matches_python_greedy(spark, docs):
    got = (
        pk.dataset_pack(spark, SF_SMOKE)
        .toPandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    toks = {d: len(re.split(r"\s+", t)) for d, t in docs.text.items()}
    for source, g in got.groupby("source"):
        cur, b = 0, 0
        for row in g.itertuples():
            n = toks[row.doc_id]
            if cur and cur + n > pk.PACK_BUDGET:
                b += 1
                cur = 0
            cur += n
            assert row.n_tokens == n
            assert row.bin_idx == b, (source, row.doc_id)


def test_pack_bin_invariants(spark):
    got = pk.dataset_pack(spark, SF_CORRECT).toPandas()
    # budget respected except single-doc oversized bins
    over = got[got.bin_tokens > pk.PACK_BUDGET]
    assert (over.bin_docs == 1).all()
    # bin ids contiguous from 0 per source, and every break is forced:
    # the first doc of bin k+1 would have overflowed bin k
    for source, g in got.groupby("source"):
        bins = g.groupby("bin_idx").first().sort_index()
        assert list(bins.index) == list(range(len(bins)))
        g = g.sort_values(["bin_idx", "doc_id"])
        for k in range(len(bins) - 1):
            bin_total = g[g.bin_idx == k].bin_tokens.iloc[0]
            first_next = g[g.bin_idx == k + 1].n_tokens.iloc[0]
            assert bin_total + first_next > pk.PACK_BUDGET


def test_interleave_is_a_deterministic_permutation(spark):
    import hashlib

    got = pk.dataset_interleave(spark, SF_CORRECT).toPandas()
    n = len(got)
    # a permutation of 1..n
    assert sorted(got.global_idx) == list(range(1, n + 1))
    # the order IS the md5 order (two-phase bucket/offset scheme == naive
    # global sort)
    got = got.sort_values("global_idx")
    keys = [
        hashlib.md5(f"{r.source}:{r.bin_idx}".encode()).hexdigest()
        for r in got.itertuples()
    ]
    assert keys == sorted(keys)
    # and it actually interleaves: the first 20 rows span many sources
    assert got.head(20).source.nunique() > 5


def test_interleave_rerun_identical(spark):
    a = pk.dataset_interleave(spark, SF_CORRECT).toPandas().sort_values("global_idx")
    b = pk.dataset_interleave(spark, SF_CORRECT).toPandas().sort_values("global_idx")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
