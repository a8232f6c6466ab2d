"""Ranker Adam-trainer distillation: transcription + loop-rule tests.

The scalar training loop (`ed_ranker.py:262-369` semantics over the
linear (ctx_dot, ln prior) scorer) is re-derived in pure python from the
DuckDB feature frame and compared step-by-step against the distributed
run; the LR-drop rule and the θ0 ≡ link_cosine equivalence are pinned
separately.
"""

import math

import duckdb
import pytest

from ed_twitter_spark.operators import ranker_train as R
from tests.conftest import SF_SMOKE


def _duck_feats(sf_dir: str):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    sql = "WITH " + R._feats_sql() + "\nSELECT subj, ent_name, is_gold, f1, f2 FROM feats"
    return con.execute(sql).df()


def _python_loop(feats, n_steps, f1_drop):
    by_subj = {}
    for r in feats.itertuples():
        by_subj.setdefault(r.subj, []).append((r.ent_name, r.is_gold, r.f1, r.f2))
    M = len(by_subj)
    w1, w2, b = R.THETA0
    m1 = m2 = mb = v1 = v2 = vb = 0.0
    lr, best = R.RANK_LR, 0.0
    rows = []
    for t in range(1, n_steps + 1):
        L = g1 = g2 = gb = 0.0
        for cands in by_subj.values():
            scored = [(e, g, round(w1 * f1 + w2 * f2 + b, 6), f1, f2)
                      for e, g, f1, f2 in cands]
            sg = max(s for _, g, s, _, _ in scored if g == 1)
            nc = len(scored)
            nviol = 0
            for e, g, s, f1, f2 in scored:
                if g == 0 and R.RANK_MARGIN - sg + s > 0:
                    nviol += 1
                    L += (R.RANK_MARGIN - sg + s) / nc
                    g1 += f1 / nc
                    g2 += f2 / nc
                    gb += 1.0 / nc
            gold = next(x for x in scored if x[1] == 1)
            g1 -= nviol / nc * gold[3]
            g2 -= nviol / nc * gold[4]
            gb -= nviol / nc
        avg_loss = round(L / M, 6)
        g1, g2, gb = round(g1 / M, 6), round(g2 / M, 6), round(gb / M, 6)
        m1 = R.ADAM_B1 * m1 + (1 - R.ADAM_B1) * g1
        m2 = R.ADAM_B1 * m2 + (1 - R.ADAM_B1) * g2
        mb = R.ADAM_B1 * mb + (1 - R.ADAM_B1) * gb
        v1 = R.ADAM_B2 * v1 + (1 - R.ADAM_B2) * g1 * g1
        v2 = R.ADAM_B2 * v2 + (1 - R.ADAM_B2) * g2 * g2
        vb = R.ADAM_B2 * vb + (1 - R.ADAM_B2) * gb * gb
        bc1, bc2 = 1 - R.ADAM_B1**t, 1 - R.ADAM_B2**t
        lr_used = lr
        w1 = round(w1 - lr_used * (m1 / bc1) / (math.sqrt(v1 / bc2) + R.ADAM_EPS), 6)
        w2 = round(w2 - lr_used * (m2 / bc1) / (math.sqrt(v2 / bc2) + R.ADAM_EPS), 6)
        b = round(b - lr_used * (mb / bc1) / (math.sqrt(vb / bc2) + R.ADAM_EPS), 6)
        ok = 0
        for cands in by_subj.values():
            # score desc, ent_name asc — the engines' tie-break order
            ranked = sorted(
                cands,
                key=lambda x: (-round(w1 * x[2] + w2 * x[3] + b, 6), x[0]),
            )
            ok += ranked[0][1]
        f1v = round(ok / M, 6)
        best = max(best, f1v)
        if best >= f1_drop:
            lr = R.RANK_LR_DROPPED
        rows.append((t, M, avg_loss, f1v, lr_used, w1, w2, b))
    return rows


def test_rank_training_matches_transcription(spark):
    feats = _duck_feats(SF_SMOKE)
    want = _python_loop(feats, R.N_STEPS, R.F1_DROP)
    got = R.run_rank_training(spark, SF_SMOKE)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        (t, M, avg_loss, f1v, lr_used, w1, w2, b) = w
        assert g["step"] == t and g["n_mentions"] == M
        assert g["avg_loss"] == pytest.approx(avg_loss, abs=2e-6)
        assert g["micro_f1"] == pytest.approx(f1v, abs=2e-6)
        assert g["lr_used"] == pytest.approx(lr_used, rel=1e-9)
        for k, v in (("w1", w1), ("w2", w2), ("b", b)):
            assert g[k] == pytest.approx(v, abs=2e-6), (t, k)


def test_lr_drop_rule_is_monotone(spark):
    """With the F1 threshold forced to 0, the very first evaluation drops
    the LR and it stays dropped (reference: best dev F1 is monotone)."""
    rows = R.run_rank_training(spark, SF_SMOKE, n_steps=3, f1_drop=0.0)
    assert rows[0]["lr_used"] == R.RANK_LR
    assert all(r["lr_used"] == R.RANK_LR_DROPPED for r in rows[1:])


def test_early_stop_counter_rule():
    """ed_ranker.py:358-367 semantics: STRICT decreases increment; equal
    or better resets AND advances the best."""
    nb, best = 0, 0.0
    seq = [0.5, 0.5, 0.4, 0.3, 0.5, 0.2, 0.2]
    got = []
    for f1 in seq:
        nb, best = R.early_stop_update(nb, best, f1)
        got.append((nb, best))
    assert got == [
        (0, 0.5),  # first eval sets best
        (0, 0.5),  # equal → reset (equal is "not worse")
        (1, 0.5),  # strict decrease
        (2, 0.5),
        (0, 0.5),  # recovery resets
        (1, 0.5),
        (2, 0.5),  # 0.2 < best twice in a row
    ]


def test_early_stop_truncates_steps_in_both_engines(spark):
    """With n_not_inc forced to 0, the loop stops after its first eval;
    the SQL twin's stopped-gating produces the same single row."""
    rows = R.run_rank_training(spark, SF_SMOKE, n_not_inc=0)
    assert len(rows) == 1 and rows[0]["step"] == 1
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    df = con.execute(R.rank_train_steps_sql(n_not_inc=0)).df()
    assert len(df) == 1 and int(df.iloc[0]["step"]) == 1
    assert df.iloc[0]["micro_f1"] == pytest.approx(rows[0]["micro_f1"], abs=1e-9)


def test_theta0_recovers_link_cosine(spark):
    """θ0 = (1, 1, 0) scores are link_cosine's scorer: the argmax per
    mention matches the link_cosine query's prediction."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ed_twitter_spark.operators.cosine_linker import link_cosine

    feats = R.rank_features(spark, SF_SMOKE)
    s = F.round(F.col("f1") + F.col("f2"), 6)
    rnk = F.row_number().over(
        Window.partitionBy("subj").orderBy(F.desc("s"), F.asc("ent_name"))
    )
    pred = (
        feats.withColumn("s", s)
        .withColumn("rnk", rnk)
        .where(F.col("rnk") == 1)
        .select("subj", F.col("ent_name").alias("pred_ent"))
    )
    lc = link_cosine(spark, SF_SMOKE).select("subj", F.col("obj").alias("lc_ent"))
    both = pred.join(lc, "subj")
    n = both.count()
    agree = both.where(F.col("pred_ent") == F.col("lc_ent")).count()
    assert n > 0 and agree == n
