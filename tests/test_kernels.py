"""Unit tests for the numpy inference kernels (SURVEY.md §2.9)."""

from __future__ import annotations

import numpy as np

from ed_twitter_spark.functions import kernels
from ed_twitter_spark.functions.fixtures import ModelWeights, fixture_weights


def _weights(d=8, hid=4, n_rels=2, seed=7):
    return fixture_weights(seed=seed, d=d, hid=hid, n_rels=n_rels)


def _identity_combiner(w: ModelWeights) -> ModelWeights:
    """Combiner MLP that passes the model score through unchanged."""
    import dataclasses

    return dataclasses.replace(
        w,
        comb_w1=np.array([[1.0, 0.0]]),
        comb_b1=np.zeros(1),
        comb_w2=np.array([[1.0]]),
        comb_b2=np.zeros(1),
    )


def test_prerank_select_mix():
    # 6 candidates; context ranks 5,3 on top; fill from index 0
    lp = np.array([[0.1, 0.2, 0.0, 0.5, -0.1, 0.9]])
    sel = kernels.prerank_select(lp, keep_ctx_ent=2, keep_p_e_m=2)
    assert list(sel[0]) == [0, 1, 3, 5]  # top-ctx {5,3} ∪ fill {0,1}, sorted


def test_prerank_select_fill_skips_selected():
    lp = np.array([[0.9, 0.8, 0.1, 0.2]])
    sel = kernels.prerank_select(lp, keep_ctx_ent=2, keep_p_e_m=2)
    assert list(sel[0]) == [0, 1, 2, 3]


def test_local_attention_masks_invalid_candidates():
    rs = np.random.RandomState(0)
    w = _weights()
    tok_vecs = rs.randn(2, 5, 8)
    tok_mask = np.ones((2, 5))
    ent_vecs = rs.randn(2, 3, 8)
    ent_mask = np.array([[1.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    s = kernels.local_attention_scores(tok_vecs, tok_mask, ent_vecs, ent_mask, w)
    assert s.shape == (2, 3)
    assert s[0, 2] < -1e9 and s[1, 1] < -1e9
    assert abs(s[0, 0]) < 1e3


def test_masked_tokens_do_not_contribute():
    """Padding tokens (mask 0) must not change attention output."""
    rs = np.random.RandomState(1)
    w = _weights()
    tok = rs.randn(1, 4, 8)
    ent = rs.randn(1, 2, 8)
    em = np.ones((1, 2))
    base = kernels.local_attention_scores(tok, np.ones((1, 4)), ent, em, w)
    # append garbage tokens with mask 0
    tok2 = np.concatenate([tok, rs.randn(1, 3, 8) * 100], axis=1)
    mask2 = np.concatenate([np.ones((1, 4)), np.zeros((1, 3))], axis=1)
    padded = kernels.local_attention_scores(tok2, mask2, ent, em, w)
    np.testing.assert_allclose(base, padded, rtol=1e-12)


def test_lbp_zero_coherence_preserves_local_argmax():
    """With rel/ew embeddings at 0 the pairwise term is candidate-independent,
    so global inference must agree with the local argmax (identity combiner,
    equal priors)."""
    import dataclasses

    rs = np.random.RandomState(3)
    d, m, c = 8, 4, 3
    w = dataclasses.replace(
        _identity_combiner(_weights(d=d)),
        rel_embs=np.zeros((2, d)),
        ew_embs=np.zeros((2, d)),
    )
    local = rs.randn(m, c)
    ent_vecs = rs.randn(m, c, d)
    mask = np.ones((m, c))
    pem = np.full((m, c), 1.0 / c)
    bow = rs.randn(m, 3 * d)
    scores = kernels.global_lbp_scores(local, ent_vecs, mask, pem, bow, w)
    assert scores.shape == (m, c)
    np.testing.assert_array_equal(
        np.argmax(scores, axis=1), np.argmax(local, axis=1)
    )


def test_argmax_fallback_chain():
    scores = np.array([[0.1, 5.0], [9.0, 0.0], [1.0, 2.0]])
    mask = np.array([[1.0, 0.0], [0.0, 0.0], [1.0, 1.0]])
    names = [["A", "B"], ["C", "D"], ["E", "F"]]
    out = kernels.argmax_with_fallback(scores, mask, names)
    assert out == ["A", "NIL", "F"]  # fallback to cand0; NIL; direct


def test_single_mention_doc_runs_global_path_with_pad():
    rs = np.random.RandomState(5)
    w = _weights()
    scores = kernels.global_lbp_scores(
        rs.randn(1, 3),
        rs.randn(1, 3, 8),
        np.ones((1, 3)),
        np.full((1, 3), 1 / 3),
        rs.randn(1, 24),
        w,
    )
    assert scores.shape == (1, 3)
    assert np.all(np.isfinite(scores))


def test_pad_token_ids():
    ids, mask = kernels.pad_token_ids([[1, 2], [], [3]], unk_id=9)
    np.testing.assert_array_equal(ids, [[1, 2], [9, 9], [3, 9]])
    np.testing.assert_array_equal(mask, [[1, 1], [1, 0], [1, 0]])


def test_top_n_neighbour_threshold_matches_transcription():
    """Direct transcription of mulrel_ranker.py:185-189 (torch.topk last
    value + >= mask) vs the partition-based kernel, ties included."""
    import numpy as np

    from ed_twitter_spark.functions import kernels

    rs = np.random.RandomState(7)
    x = rs.randn(3, 6, 6)
    x[0, 1, 2] = x[0, 1, 4]  # force a tie at a potential threshold
    for top_n in (1, 2, 3, 5, 6, 1000):
        got = kernels.top_n_neighbour_threshold(x.copy(), top_n)
        # transcription: sort desc, threshold = k-th value, mask = 1-(x>=thr)
        k = min(top_n, x.shape[2])
        srt = np.sort(x, axis=2)[:, :, ::-1]
        thr = srt[:, :, k - 1 : k]
        want = x + (1.0 - (x >= thr)) * (-1e10)
        if top_n >= x.shape[2]:
            want = x
        assert np.allclose(got, want), top_n
    # default knob is the identity
    assert np.array_equal(kernels.top_n_neighbour_threshold(x, 1000), x)
