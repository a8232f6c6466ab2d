"""Full-model ranker training (rank_train_full) correctness pins.

The op has no SQL oracle (attention top-k/softmax backward is not
SQL-expressible), so correctness rests on four independent checks:

1. forward parity — at fixture weights with all-live masks, the trainer's
   forward is BIT-IDENTICAL to the inference kernels
   (`local_attention_scores` + `score_combine`), so θ at the fixture
   scores exactly what `link_embed` scores locally;
2. gradcheck — the hand-written backward matches central finite
   differences on a small random fixture;
3. sequential-transcription equality — the distributed run (integer
   micro-unit gradient sums) is row-identical to a sequential pandas
   transcription over the same chunks, for any partitioning;
4. trained weights move the argmax on a hand fixture (the round-4
   verdict's acceptance criterion) with monotone loss descent.
"""

import numpy as np
import pandas as pd
import pytest

from ed_twitter_spark.functions import kernels
from ed_twitter_spark.functions import ranker_grad as rg
from ed_twitter_spark.functions.fixtures import fixture_weights
from tests.conftest import SF_SMOKE


def _rand_case(seed=7, d=8, h=5, M=3, C=4, T=9):
    rs = np.random.RandomState(seed)
    tv = rs.randn(M, T, d)
    tm = (rs.rand(M, T) > 0.2).astype(float)
    tm[:, :3] = 1.0
    ev = rs.randn(M, C, d)
    em = np.ones((M, C))
    em[1, 3] = 0.0
    pem = rs.rand(M, C) * 0.9 + 0.05
    gold = np.array([0, 1, 2])
    theta = rg.pack_params(
        1 + 0.1 * rs.randn(d),
        1 + 0.1 * rs.randn(d),
        rs.randn(h, 2) * 0.5,
        rs.randn(h) * 0.1,
        rs.randn(1, h) * 0.3,
        rs.randn(1) * 0.1,
    )
    return tv, tm, ev, em, pem, gold, theta


def test_forward_matches_inference_kernels_bitwise():
    """θ = fixture ModelWeights, all-live entity mask → the trainer's
    forward equals score_combine(local_attention_scores(...)) bit for
    bit (same op order; mask multiply by 1.0 and add of 0.0 are exact)."""
    w = fixture_weights()
    rs = np.random.RandomState(3)
    M, C, T, d = 5, 8, 31, w.att_mat_diag.shape[0]
    tv = rs.randn(M, T, d)
    tm = np.ones((M, T))
    tm[:, 25:] = 0.0
    ev = rs.randn(M, C, d)
    em = np.ones((M, C))
    pem = rs.rand(M, C) * 0.9 + 0.01
    theta = rg.pack_params(
        w.att_mat_diag, w.tok_score_mat_diag, w.comb_w1, w.comb_b1,
        w.comb_w2, w.comb_b2,
    )
    got, _ = rg.local_forward(tv, tm, ev, em, pem, theta, tok_top_n=w.tok_top_n)
    local = kernels.local_attention_scores(tv, tm, ev, em, w)
    want = kernels.score_combine(local, pem, w)
    assert np.array_equal(got, want)


def test_backward_matches_finite_differences():
    tv, tm, ev, em, pem, gold, theta = _rand_case()

    def loss_of(th):
        s, cache = rg.local_forward(tv, tm, ev, em, pem, th, tok_top_n=5)
        ls, g, _ = rg.margin_loss_and_grad(s, gold, 0.01, cache)
        return ls, g

    _, g = loss_of(theta)
    eps = 1e-6
    num = np.zeros_like(theta)
    for i in range(len(theta)):
        tp = theta.copy(); tp[i] += eps
        tn = theta.copy(); tn[i] -= eps
        num[i] = (loss_of(tp)[0] - loss_of(tn)[0]) / (2 * eps)
    assert np.abs(num - g).max() < 1e-8


def test_spark_run_matches_sequential_transcription(spark):
    """The distributed training rows equal a sequential pandas
    transcription: same per-chunk kernel, but grouping, integer sums and
    the Adam/LR/early-stop loop re-run independently on the driver. The
    int micro-unit representation makes the cross-chunk sum exact and
    order-free, so this must match for ANY partitioning."""
    from pyspark.sql import functions as F

    from ed_twitter_spark.functions.fixtures import load_embedding_matrix
    from ed_twitter_spark.operators import ranker_full as RF

    got = [
        tuple(r)
        for r in sorted(
            RF.run_rank_training_full(spark, SF_SMOKE, n_steps=3).collect(),
            key=lambda r: r["step"],
        )
    ]

    emb = load_embedding_matrix(spark, SF_SMOKE)
    n_vec = emb.shape[0] - 1
    feats = RF.full_features(spark, SF_SMOKE).toPandas()
    groups = list(feats.groupby(["conv_id", "chunk"], sort=False))

    theta = rg.init_full_params()
    state = (np.zeros_like(theta), np.zeros_like(theta), 0)
    lr, best_f1, nb = RF.RANK_LR, -1.0, 0
    want = []
    for step in range(3):
        sums = {}
        for _, g in groups:
            contrib = RF._chunk_contrib(g, emb, n_vec, n_vec, theta)
            for i, v in zip(contrib["idx"], contrib["val"]):
                sums[i] = sums.get(i, 0) + int(v)
        n = sums.get(RF.IDX_N, 0)
        grad = (
            np.array([sums.get(i, 0) for i in range(rg.N_FULL_PARAMS)], dtype=float)
            / RF.MICRO
            / n
        )
        loss = sums.get(RF.IDX_LOSS, 0) / RF.MICRO / n
        f1 = sums.get(RF.IDX_CORRECT, 0) / n
        A, Bv, W1, b1, W2, b2 = rg.unpack_params(theta)
        want.append(
            (
                step,
                float(lr),
                n,
                round(float(loss), 6),
                round(float(f1), 6),
                round(float(np.linalg.norm(np.concatenate([A, Bv]))), 6),
                round(
                    float(
                        np.linalg.norm(
                            np.concatenate([W1.reshape(-1), b1, W2.reshape(-1), b2])
                        )
                    ),
                    6,
                ),
            )
        )
        if lr == RF.RANK_LR and f1 >= RF.F1_DROP:
            lr = RF.RANK_LR_DROPPED
            best_f1, nb = f1, 0
        else:
            from ed_twitter_spark.operators.ranker_train import early_stop_update

            nb, best_f1 = early_stop_update(nb, best_f1, f1)
            if nb >= RF.N_NOT_INC:
                break
        theta, state = rg.adam_step(theta, grad, state, lr)
        theta = RF._regularize(theta)

    assert got == want


def test_training_moves_argmax_to_gold():
    """Round-4 verdict acceptance: trained weights change the argmax on a
    hand fixture. One mention, two candidates, gold second and initially
    losing; margin-loss Adam training must flip the prediction, with the
    loss decreasing along the way."""
    d, h = 8, 5
    rs = np.random.RandomState(1)
    T = 6
    tv = rs.randn(1, T, d)
    tm = np.ones((1, T))
    ev = rs.randn(1, 2, d)
    em = np.ones((1, 2))
    pem = np.array([[0.9, 0.1]])  # prior favors the wrong candidate
    gold = np.array([1])
    theta = rg.pack_params(
        np.ones(d), np.ones(d),
        rs.randn(h, 2) * 0.5, rs.randn(h) * 0.1,
        rs.randn(1, h) * 0.3, rs.randn(1) * 0.1,
    )

    def step_once(th, st, lr):
        s, cache = rg.local_forward(tv, tm, ev, em, pem, th, tok_top_n=5)
        ls, g, _ = rg.margin_loss_and_grad(s, gold, 0.01, cache)
        th, st = rg.adam_step(th, g, st, lr)
        return th, st, ls, int(np.argmax(s, axis=1)[0])

    state = (np.zeros_like(theta), np.zeros_like(theta), 0)
    th = theta
    th, state, loss0, pred0 = step_once(th, state, 0.01)
    losses = [loss0]
    pred = pred0
    for _ in range(200):
        th, state, ls, pred = step_once(th, state, 0.01)
        losses.append(ls)
        if pred == 1 and ls == 0.0:
            break
    if pred0 == 1:
        pytest.skip("fixture started at gold — rebuild fixture")
    assert pred == 1, "training never flipped the argmax to gold"
    assert losses[-1] < losses[0]


def test_chunk_without_gold_contributes_zeros(spark):
    """Mentions whose gold never appears in the candidate slots are
    dropped (ed_ranker.py:128-131); a chunk of only such mentions yields
    an all-zero contribution row set."""
    from ed_twitter_spark.functions.fixtures import load_embedding_matrix
    from ed_twitter_spark.operators import ranker_full as RF

    emb = load_embedding_matrix(spark, SF_SMOKE)
    n_vec = emb.shape[0] - 1
    feats = RF.full_features(spark, SF_SMOKE).limit(40).toPandas()
    feats["gold_name"] = "NOT_A_CANDIDATE"
    out = RF._chunk_contrib(feats, emb, n_vec, n_vec, rg.init_full_params())
    assert (out["val"] == 0).all()
    assert len(out) == rg.N_FULL_PARAMS + 3
