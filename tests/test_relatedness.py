"""K10 ingestion: reference relatedness-format reader + RLTD union.

Hand fixtures pin the parse semantics the reference's dict-based loader
implies (`deep-ed-pytorch/entities/relatedness/relatedness.py:160-199`):
first line of a query binds e1, last line of a (query, candidate) wins the
label, the candidate pair is located by the literal ``#`` token (not a
column position), and the ED-CSV candidate scan skips EMPTYCAND lines.
Golden corpus-stat pins cover the synthesized reference-shaped dataset.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from ed_twitter_spark.sources import relatedness as rel
from tests.conftest import SF_SMOKE

FIXTURE_LINES = [
    # q17: two candidates, multiple filler features before '#'
    "1 qid:17 1:0.5 2:0.1 # 100-200",
    "0 qid:17 1:0.2 # 100-300",
    # duplicate (q17, e2=200): LAST wins (label 0 overwrites 1)
    "0 qid:17 1:0.9 3:0.3 4:0.1 # 100-200",
    # q17 again with a CONFLICTING e1 (999): reference keeps the first
    # e1 (100) but still records the candidate
    "1 qid:17 # 999-400",
    # q5: single candidate, no filler features at all
    "1 qid:5 # 7-8",
    "",  # blank line ignored
]


@pytest.fixture(scope="module")
def fixture_df(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("rel") / "val.txt"
    p.write_text("\n".join(FIXTURE_LINES) + "\n")
    return rel.read_relatedness_txt(spark, str(p))


def test_reader_reference_dict_semantics(fixture_df):
    rows = {
        (r["query_id"], r["e2"]): (r["e1"], r["label"])
        for r in fixture_df.collect()
    }
    # the reference dict for this file:
    #   reltd[17] = {ent: 100, cand: {200: 0 (last wins), 300: 0, 400: 1}}
    #   reltd[5]  = {ent: 7,   cand: {8: 1}}
    assert rows == {
        (17, 200): (100, 0),
        (17, 300): (100, 0),
        (17, 400): (100, 1),  # e1 stays 100 — first line of q17 wins
        (5, 8): (7, 1),
    }


def test_ed_candidate_scan_skips_emptycand(spark, tmp_path):
    lines = [
        "d1\tdoc 1\tm\tl\tr\tCANDIDATES\t42,0.5,A\t77,0.3,B\tGT:\t1,42,0.5,A",
        "d2\tdoc 2\tm\tl\tr\tEMPTYCAND\tGT:\t-1",
        "d3\tdoc 3\tm\tl\tr\tCANDIDATES\t42,0.9,A\tGT:\t1,42,0.9,A",
        "",
    ]
    p = tmp_path / "ed.csv"
    p.write_text("\n".join(lines) + "\n")
    got = sorted(
        r["ent_wikiid"] for r in rel.ed_candidate_wikiids(spark, str(p)).collect()
    )
    assert got == [42, 42, 77]  # EMPTYCAND line contributes nothing


def test_rltd_union_sorted_dense_with_unk(spark, fixture_df, tmp_path):
    test_lines = ["1 qid:2 # 500-600"]
    p = tmp_path / "test.txt"
    p.write_text("\n".join(test_lines) + "\n")
    test_df = rel.read_relatedness_txt(spark, str(p))
    got = [
        (r["ent_wikiid"], r["rltd_id"])
        for r in rel.rltd_entity_union(fixture_df, test_df)
        .orderBy("rltd_id")
        .collect()
    ]
    # union of {100, 200, 300, 400, 7, 8} ∪ {500, 600} ∪ unk(1),
    # sorted ascending, enumerated from 0 (relatedness.py:81-96)
    assert got == [
        (1, 0), (7, 1), (8, 2), (100, 3), (200, 4),
        (300, 5), (400, 6), (500, 7), (600, 8),
    ]


def test_reference_shaped_corpus_stats(spark):
    """Golden pins of the synthesized reference-format dataset at
    sf0.001: split sizes, query counts, and round-trip equality of the
    write→read path against the closed-form pairs."""
    val_dir, test_dir = rel.write_reference_relatedness(spark, SF_SMOKE)
    val = rel.read_relatedness_txt(spark, val_dir)
    test = rel.read_relatedness_txt(spark, test_dir)
    n_val, n_test = val.count(), test.count()
    q_val = val.select("query_id").distinct().count()
    q_test = test.select("query_id").distinct().count()
    assert (q_val, q_test) == (12, 12)  # 24 queries, even/odd split
    # every query carries CANDS_PER_QUERY candidates minus self-hits
    assert n_val + n_test == rel._pairs(spark, SF_SMOKE).count()
    got = {
        (r["query_id"], r["e2"]): (r["e1"], r["label"])
        for r in val.unionByName(test).collect()
    }
    want = {
        (r["query_id"], r["e2"]): (r["e1"], r["label"])
        for r in rel._pairs(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_metrics_match_duckdb_reference_transcription(spark):
    """relatedness_metrics over the validate split equals a straight
    DuckDB transcription of the reference metric math on the same pairs
    (the registry oracle, run here at sf0.001 for a second SF point)."""
    from ed_twitter_spark.plans import registry

    got = registry.queries()["rltd_metrics_val"](spark, SF_SMOKE).first()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    )
    want = con.execute(registry.oracle_sql()["rltd_metrics_val"]).fetchone()
    for g, w in zip((got["map"], got["ndcg1"], got["ndcg5"], got["ndcg10"]), want):
        assert g == pytest.approx(w, abs=1e-6)


def test_metrics_match_pure_python_reference_transcription(spark):
    """relatedness_metrics equals a line-by-line Python transcription of
    the reference's compute_map / compute_DCG / compute_NDCG
    (`relatedness.py:225-286`) on a hand fixture whose relevant items sit
    PAST rank 1 — this is the case where the reference's 1/log2(max(2,i))
    discount (ranks 1 and 2 both 1.0) diverges from the textbook
    1/log2(i+1), and it cannot be caught by the DuckDB oracle because
    both engines share one formula string."""
    from math import log2

    # (query_id, e2, label, score) — distinct scores so ranking order is
    # tie-free in both engines and the transcription
    pairs = [
        (1, 10, 0, 0.9), (1, 11, 1, 0.8), (1, 12, 1, 0.3),  # rel at rn 2,3
        (2, 20, 1, 0.7), (2, 21, 0, 0.5), (2, 22, 1, 0.1),  # rel at rn 1,3
        (3, 30, 0, 0.6), (3, 31, 0, 0.4), (3, 32, 1, 0.2),  # rel at rn 3
    ]
    df = spark.createDataFrame(pairs, "query_id int, e2 bigint, label int, score double")
    got = rel.relatedness_metrics(df).first()

    def disc(i):
        return 1.0 / log2(max(2, i))  # relatedness.py:271

    by_q = {}
    for q, e2, label, score in pairs:
        by_q.setdefault(q, []).append((e2, label, score))
    aps, ndcg = [], {1: [], 5: [], 10: []}
    for q, cands in by_q.items():
        ranked = sorted(cands, key=lambda t: -t[2])
        n_rel_so_far, sum_prec = 0, 0.0
        for i, (_, label, _) in enumerate(ranked, start=1):
            if label == 1:
                n_rel_so_far += 1
                sum_prec += n_rel_so_far / i
        aps.append(sum_prec / n_rel_so_far)
        n_rel = sum(1 for _, label, _ in cands if label == 1)
        for k in (1, 5, 10):
            dcg = sum(
                disc(i)
                for i, (_, label, _) in enumerate(ranked, start=1)
                if label == 1 and i <= k
            )
            idcg = sum(disc(i) for i in range(1, min(k, n_rel) + 1))
            ndcg[k].append(dcg / idcg)
    n = len(by_q)
    assert got["map"] == pytest.approx(sum(aps) / n, abs=1e-6)
    for k in (1, 5, 10):
        assert got[f"ndcg{k}"] == pytest.approx(sum(ndcg[k]) / n, abs=1e-6), k
