"""source_similarity pins: identical sources estimate 1, disjoint 0, and
the exact Jaccard matches a hand-computed shingle-set intersection."""

import pytest


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")
    df.write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_source_similarity_identical_disjoint_partial(spark, tmp_path):
    from ed_twitter_spark.operators.dedup import source_similarity

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "sA", "the quick brown fox jumps"),
            (1, "sB", "the quick brown fox jumps"),  # identical to sA
            (2, "sC", "pack my box with five dozen jugs"),  # disjoint
            (3, "sD", "quick brown fox runs home"),  # partial overlap w/ sA
        ],
    )
    got = {
        (r["src1"], r["src2"]): r
        for r in source_similarity(spark, sf).collect()
    }
    assert len(got) == 6  # C(4,2) pairs, zero-overlap pairs included

    ab = got[("sA", "sB")]
    assert ab["jaccard"] == pytest.approx(1.0)
    assert ab["mh_agree"] == 16 and ab["est_jaccard"] == pytest.approx(1.0)

    ac = got[("sA", "sC")]
    assert ac["n_common"] == 0 and ac["jaccard"] == pytest.approx(0.0)

    # sA shingles: {the quick brown, quick brown fox, brown fox jumps}
    # sD shingles: {quick brown fox, brown fox runs, fox runs home}
    ad = got[("sA", "sD")]
    assert ad["n_sh1"] == 3 and ad["n_sh2"] == 3
    assert ad["n_common"] == 1
    assert ad["jaccard"] == pytest.approx(round(1 / 5, 6))
    # the 16-component sketch is an estimator — just bound it
    assert 0 <= ad["mh_agree"] <= 16


def test_doc_novelty_by_hand(spark, tmp_path):
    from ed_twitter_spark.operators.dedup import doc_novelty

    sf = _write_docs(
        spark,
        tmp_path / "nov",
        [
            (0, "s", "a b c d"),        # shingles {abc, bcd}
            (1, "s", "a b c x"),        # shingles {abc, bcx} — shares abc
            (2, "s", "p q r"),          # shingle {pqr}, corpus-unique
            (3, "s", "p q"),            # < 3 tokens → excluded
        ],
    )
    got = {r["doc_id"]: r for r in doc_novelty(spark, sf).collect()}
    assert set(got) == {0, 1, 2}
    assert got[0]["n_shingles"] == 2 and got[0]["n_dup"] == 1
    assert got[0]["novelty"] == pytest.approx(0.5)
    assert got[1]["novelty"] == pytest.approx(0.5)
    assert got[2]["n_dup"] == 0 and got[2]["novelty"] == pytest.approx(1.0)


def test_link_calibration_by_hand(spark):
    from ed_twitter_spark.operators.eval import link_calibration

    # scores span [0, 10): buckets are width-1; the two 9.x rows share
    # the top bucket (one right, one wrong -> accuracy 0.5)
    pred = spark.createDataFrame(
        [
            ("m1", "A", 0.0),
            ("m2", "B", 5.0),
            ("m3", "C", 9.2),
            ("m4", "D", 10.0),
        ],
        "subj STRING, obj STRING, score_r4 DOUBLE",
    )
    gold = spark.createDataFrame(
        [("m1", "A"), ("m2", "X"), ("m3", "C"), ("m4", "X")],
        "subj STRING, gold_obj STRING",
    )
    got = {r["bucket"]: r for r in link_calibration(pred, gold).collect()}
    assert set(got) == {0, 5, 9}
    assert got[0]["n"] == 1 and got[0]["accuracy"] == 1.0
    assert got[5]["n"] == 1 and got[5]["accuracy"] == 0.0
    assert got[9]["n"] == 2 and got[9]["accuracy"] == 0.5
    assert got[9]["avg_score"] == 9.6


def test_link_calibration_degenerate_range_single_bucket(spark):
    from ed_twitter_spark.operators.eval import link_calibration

    pred = spark.createDataFrame(
        [("m1", "A", 2.0), ("m2", "B", 2.0)],
        "subj STRING, obj STRING, score_r4 DOUBLE",
    )
    gold = spark.createDataFrame(
        [("m1", "A"), ("m2", "B")], "subj STRING, gold_obj STRING"
    )
    got = link_calibration(pred, gold).collect()
    assert len(got) == 1 and got[0]["bucket"] == 0 and got[0]["n"] == 2


def test_eval_bootstrap_ci_shape_and_brackets(spark):
    from ed_twitter_spark.operators.eval import (
        BOOTSTRAP_REPS,
        eval_bootstrap_ci,
    )

    # 80 correct / 20 wrong predictions -> point F1 0.8; the bootstrap
    # CI must be a proper interval around a mean near the point value.
    pred = spark.createDataFrame(
        [(f"m{i}", "A" if i < 80 else "B", ) for i in range(100)],
        "subj STRING, obj STRING",
    )
    gold = spark.createDataFrame(
        [(f"m{i}", "A") for i in range(100)], "subj STRING, gold_obj STRING"
    )
    row = eval_bootstrap_ci(pred, gold).collect()[0]
    assert row["n_reps"] == BOOTSTRAP_REPS
    assert row["point_f1"] == 0.8
    assert 0.0 < row["f1_p05"] <= row["f1_mean"] <= row["f1_p95"] < 1.0
    assert abs(row["f1_mean"] - 0.8) < 0.05


def test_poisson_weights_mean_one(spark):
    """The deterministic Poisson(1) draw must produce multiplicities in
    [0, 6] with empirical mean ~1 over many (example, replicate) cells —
    the property that makes each replicate an n-sized resample."""
    from pyspark.sql import functions as F

    from ed_twitter_spark.operators.eval import _POISSON1_T

    df = spark.range(2000).select(
        F.concat(F.lit("s"), F.col("id")).alias("subj"),
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("b"),
    )
    u = F.conv(
        F.substring(F.md5(F.concat_ws("#", "subj", "b")), 1, 12), 16, 10
    ).cast("long")
    w = F.when(u < _POISSON1_T[0], 0)
    for k in range(1, 6):
        w = w.when(u < _POISSON1_T[k], k)
    w = w.otherwise(6)
    stats = df.select(w.alias("w")).agg(
        F.min("w").alias("lo"), F.max("w").alias("hi"), F.avg("w").alias("mu")
    ).collect()[0]
    assert stats["lo"] >= 0 and stats["hi"] <= 6
    assert abs(stats["mu"] - 1.0) < 0.03


def _turns(spark, convs):
    """convs = [(conv_id, [(role, text), ...] in turn order)]"""
    rows = [
        (c, i, role, text)
        for c, ts in convs
        for i, (role, text) in enumerate(ts)
    ]
    return spark.createDataFrame(
        rows, "conv_id STRING, turn_idx INT, role STRING, text STRING"
    )


def test_loop_profile_detects_retry_runs(spark):
    from ed_twitter_spark.operators.transcript_stats import loop_profile

    t = _turns(
        spark,
        [
            # 3x verbatim assistant retry (case/space-insensitive) mid-conv
            ("c1", [("user", "go"), ("assistant", "Err X"),
                    ("assistant", "err x "), ("assistant", "ERR X"),
                    ("user", "stop")]),
            # healthy conversation
            ("c2", [("user", "hi"), ("assistant", "hello"), ("user", "bye")]),
            # repeat of same text by DIFFERENT roles is NOT a run
            ("c3", [("user", "ok"), ("assistant", "ok"), ("user", "ok")]),
        ],
    )
    got = {r["conv_id"]: r for r in loop_profile(t).collect()}
    c1 = got["c1"]
    assert c1["looping"] and c1["max_run"] == 3
    assert c1["run_role"] == "assistant" and c1["run_start"] == 1
    assert c1["n_turns"] == 5 and c1["n_runs"] == 3 and c1["loop_turns"] == 3
    c2 = got["c2"]
    assert not c2["looping"] and c2["max_run"] == 1 and c2["loop_turns"] == 0
    c3 = got["c3"]
    assert not c3["looping"] and c3["n_runs"] == 3


def test_loop_profile_tie_breaks_to_earliest_run(spark):
    from ed_twitter_spark.operators.transcript_stats import loop_profile

    t = _turns(
        spark,
        [("c1", [("a", "x"), ("a", "x"), ("a", "x"),
                 ("u", "mid"),
                 ("a", "y"), ("a", "y"), ("a", "y")])],
    )
    r = loop_profile(t).collect()[0]
    assert r["max_run"] == 3 and r["run_start"] == 0
    assert r["loop_turns"] == 6  # both runs cross the threshold


def test_quality_classifier_eval_auc_transcription(spark, tmp_path):
    """Exact-AUC pin: a corpus where one 'real' document IS templated
    spam makes its positive row collide with its negative twin (an exact
    score tie), so AUC must count the tied pair as half a win — checked
    against a from-scratch python transcription over the same scores."""
    import math

    from ed_twitter_spark.operators.quality_classifier import (
        _feature_frame,
        _trained_weights,
        quality_classifier_eval,
    )

    df = spark.createDataFrame(
        [(0, "s", "a b c d"), (1, "s", "x x x x"), (2, "s", "p q r s t u")],
        "doc_id LONG, source STRING, text STRING",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    w = {k: v for k, v in _trained_weights(spark, sf).collect()[0].asDict().items()}
    rows = _feature_frame(spark, sf).collect()
    scored = []
    for r in rows:
        z = sum(r[f"x{j}"] * w[f"w{j}"] for j in range(5))
        scored.append((r["y"], round(1.0 / (1.0 + math.exp(-z)), 6)))
    pos = sorted(s for y, s in scored if y == 1.0)
    neg = sorted(s for y, s in scored if y == 0.0)
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    )
    want_auc = round(wins / (len(pos) * len(neg)), 6)

    got = quality_classifier_eval(spark, sf).collect()[0]
    assert got["n_pos"] == 3 and got["n_neg"] == 3
    assert got["auc"] == pytest.approx(want_auc, abs=1e-9)
    assert 0.0 < got["auc"] < 1.0  # the tie keeps it strictly inside


def test_echo_profile_scores_bigram_parroting(spark):
    from ed_twitter_spark.operators.transcript_stats import echo_profile

    t = _turns(
        spark,
        [
            # full parrot: every assistant bigram appears in the user turn
            ("c1", [("user", "the quick brown fox jumps"),
                    ("assistant", "The quick brown fox")]),
            # half echo: "alpha beta" shared; "beta gamma" and "gamma new"
            # are not; repeated phrase counts once (distinct bigrams)
            ("c2", [("user", "alpha beta zzz alpha beta"),
                    ("assistant", "alpha beta gamma new")]),
            # assistant after assistant: not scored (no preceding user turn)
            ("c3", [("assistant", "one two three four"),
                    ("assistant", "one two three four")]),
            # too short: a 2-token reply has 1 bigram < ECHO_MIN_BIGRAMS
            ("c4", [("user", "one two three"), ("assistant", "one two")]),
        ],
    )
    got = {r["conv_id"]: r for r in echo_profile(t).collect()}
    assert set(got) == {"c1", "c2"}
    assert got["c1"]["n_bigrams"] == 3 and got["c1"]["n_shared"] == 3
    assert got["c1"]["echo"] == 1.0
    assert got["c2"]["n_bigrams"] == 3 and got["c2"]["n_shared"] == 1
    assert got["c2"]["echo"] == 0.333333


def test_key_turns_textrank_ranks_central_turns(spark):
    from ed_twitter_spark.operators.transcript_stats import key_turns

    t = _turns(
        spark,
        [
            # t0 and t1 share all tokens (mutual reinforcement); t2 is
            # lexically isolated and bottoms out at the (1-d) floor
            ("cA", [("user", "alpha beta"), ("assistant", "Alpha Beta"),
                    ("user", "unrelated thing entirely")]),
            # no edges at all: both turns score the floor; tie breaks to
            # the earlier turn_idx
            ("cB", [("user", "one two"), ("assistant", "three four")]),
        ],
    )
    got = {
        (r["conv_id"], r["rank"]): r for r in key_turns(t).collect()
    }
    assert len(got) == 4  # KEY_TURNS_K per conversation
    a1, a2 = got[("cA", 1)], got[("cA", 2)]
    assert {a1["turn_idx"], a2["turn_idx"]} == {0, 1}
    assert a1["turn_idx"] == 0  # equal scores -> earlier turn first
    assert a1["score"] == a2["score"] > 0.15
    b1, b2 = got[("cB", 1)], got[("cB", 2)]
    assert (b1["turn_idx"], b2["turn_idx"]) == (0, 1)
    assert b1["score"] == b2["score"] == 0.15
