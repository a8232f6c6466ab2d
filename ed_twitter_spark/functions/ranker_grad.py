"""Hand-written gradients for the reference's LOCAL ranker model.

Closes the last training-fidelity gap (round-4 verdict item 2): the
trainable surface of `mulrel-nel/nel/local_ctx_att_ranker.py` — the two
attention diagonals and the score⊕log-prior combiner MLP — trained
in-engine, not the 3-parameter distillation of `operators/ranker_train.py`.

The reference model (`local_ctx_att_ranker.py:22-28`) trains, with word
and entity embeddings FROZEN (`main.py:126 freeze_embs=True`,
`abstract_word_entity.py:59-63`, optimizer filter `ed_ranker.py:273`):

* ``att_mat_diag``       A  (d,)   — line 22
* ``tok_score_mat_diag`` B  (d,)   — line 23
* ``score_combine_linear_1`` W1 (h,2), b1 (h,)  — line 26
* ``score_combine_linear_2`` W2 (1,h), b2 (1,)  — line 28

Forward is the `forward()` p_e_m branch (lines 52-88): attention scores
``bmm(ent·A, tok^T)`` masked, per-token max over candidates, top-k
softmax (k = tok_top_n), context vector ``Σ (sel·B)·p``, entity·context
scores, then the 2-layer ReLU combiner over ``[score, log(p_e_m+1e-20)]``
and the final entity-mask trick (line 84). Loss is
``multi_margin_loss(scores, true_pos, margin)`` (line 119): per example
(1/C)·Σ_{j≠y} max(0, margin − s_y + s_j), meaned over the batch.

Backward is derived by hand (no torch in this repo): hinge → mask →
MLP → context vector → softmax-over-topk (including the reference's
redundant re-normalization at line 68 — its Jacobian at Σ=1 is
δ−x, so dsp = dp − Σdp·p and the subsequent softmax backward
simplifies to dts = p⊙(dp − Σdp·p)) → scatter through the top-k gather
→ subgradient through the per-token max over candidates (gradient to
the first argmax row, ties measure-zero) → dA via the trilinear
attention form. Verified against central finite differences in
`tests/test_ranker_full.py`.

All math float64. One call handles one document chunk; gradients are
SUMS over the chunk's kept mentions (the caller normalizes by the global
mention count), so cross-chunk combination is a plain addition.
"""

from __future__ import annotations

import numpy as np

EMB_DIMS = 64
HID_DIMS = 100
N_FULL_PARAMS = 2 * EMB_DIMS + HID_DIMS * 2 + HID_DIMS + HID_DIMS + 1  # 529


def pack_params(A, B, W1, b1, W2, b2) -> np.ndarray:
    return np.concatenate(
        [A, B, W1.reshape(-1), b1, W2.reshape(-1), np.atleast_1d(b2)]
    ).astype(np.float64)


def unpack_params(theta: np.ndarray, d: int = EMB_DIMS, h: int = HID_DIMS):
    i = 0
    A = theta[i : i + d]; i += d
    B = theta[i : i + d]; i += d
    W1 = theta[i : i + h * 2].reshape(h, 2); i += h * 2
    b1 = theta[i : i + h]; i += h
    W2 = theta[i : i + h].reshape(1, h); i += h
    b2 = theta[i : i + 1]; i += 1
    return A, B, W1, b1, W2, b2


def init_full_params(seed: int = 13, d: int = EMB_DIMS, h: int = HID_DIMS) -> np.ndarray:
    """θ₀ like the reference initializes: diagonals at ones
    (`local_ctx_att_ranker.py:22-23` torch.ones), combiner layers with
    nn.Linear's default U(−1/√fan_in, 1/√fan_in) draw, pinned to a seed
    so every run (and the transcription twin) starts identically."""
    rs = np.random.RandomState(seed)
    A = np.ones(d)
    B = np.ones(d)
    lim1 = 1.0 / np.sqrt(2.0)
    W1 = rs.uniform(-lim1, lim1, size=(h, 2))
    b1 = rs.uniform(-lim1, lim1, size=h)
    lim2 = 1.0 / np.sqrt(h)
    W2 = rs.uniform(-lim2, lim2, size=(1, h))
    b2 = rs.uniform(-lim2, lim2, size=1)
    return pack_params(A, B, W1, b1, W2, b2)


def local_forward(tok_vecs, tok_mask, ent_vecs, ent_mask, p_e_m, theta, tok_top_n=25):
    """Forward pass of `local_ctx_att_ranker.py:54-88` (p_e_m branch),
    returning (scores, cache-for-backward). Op order mirrors the
    reference; with θ = (A=1, B=1, fixture combiner) and all-live masks
    it reproduces `kernels.local_attention_scores` + `score_combine`."""
    m, t, d = tok_vecs.shape
    c = ent_vecs.shape[1]
    h = (len(theta) - 2 * d - 1) // 4  # |θ| = 2d + 4h + 1
    A, B, W1, b1, W2, b2 = unpack_params(theta, d, h)

    att = np.matmul(ent_vecs * A, tok_vecs.transpose(0, 2, 1))  # (M,C,T)
    att_m = att * tok_mask[:, None, :] + (tok_mask[:, None, :] - 1.0) * 1e10
    cmax = np.argmax(att_m, axis=1)  # (M,T) first-max row per token
    tok_att = np.take_along_axis(att_m, cmax[:, None, :], axis=1)[:, 0, :]  # (M,T)
    k = min(tok_top_n, t)
    top_ids = np.argsort(-tok_att, axis=1, kind="stable")[:, :k]  # (M,k)
    top_scores = np.take_along_axis(tok_att, top_ids, axis=1)
    mx = top_scores.max(axis=1, keepdims=True)
    e = np.exp(top_scores - mx)
    sp = e / e.sum(axis=1, keepdims=True)
    p = sp / sp.sum(axis=1, keepdims=True)  # line 68's redundant renorm
    sel = np.take_along_axis(tok_vecs, top_ids[:, :, None], axis=1)  # (M,k,d)
    ctx = ((sel * B) * p[:, :, None]).sum(axis=1)  # (M,d)
    ecs = np.einsum("mcd,md->mc", ent_vecs, ctx)  # (M,C) UNMASKED
    x = np.stack([ecs.reshape(-1), np.log(p_e_m + 1e-20).reshape(-1)], axis=1)
    pre1 = x @ W1.T + b1  # (MC,h)
    h1 = np.maximum(pre1, 0.0)
    out = (h1 @ W2.T + b2).reshape(m, c)
    scores = out * ent_mask + (ent_mask - 1.0) * 1e10
    cache = dict(
        A=A, B=B, W1=W1, W2=W2, tok_vecs=tok_vecs, tok_mask=tok_mask,
        ent_vecs=ent_vecs, ent_mask=ent_mask, cmax=cmax, top_ids=top_ids,
        p=p, sel=sel, ctx=ctx, x=x, pre1=pre1, h1=h1, m=m, c=c, k=k,
    )
    return scores, cache


def margin_loss_and_grad(scores, gold, margin, cache):
    """multi_margin_loss SUM over the chunk's mentions + d(sum)/dθ.

    Returns (loss_sum, grad_flat, n_active_hinges). ``gold`` is (M,)
    positions into the C selected slots (every row kept for training has
    one — `ed_ranker.py:128-131` drops the rest upstream)."""
    m, c = scores.shape
    rows = np.arange(m)
    s_gold = scores[rows, gold][:, None]
    z = margin - s_gold + scores
    z[rows, gold] = 0.0
    act = (z > 0).astype(np.float64)
    act[rows, gold] = 0.0
    loss_sum = float((np.maximum(z, 0.0).sum(axis=1) / c).sum())

    ds = act / c
    ds[rows, gold] = -act.sum(axis=1) / c
    grad = backward_from_scores(ds, cache)
    return loss_sum, grad, int(act.sum())


def backward_from_scores(ds, cache):
    """d(Σ loss)/dθ given d(Σ loss)/d(masked scores)."""
    A, B, W1, W2 = cache["A"], cache["B"], cache["W1"], cache["W2"]
    tv, tm = cache["tok_vecs"], cache["tok_mask"]
    ev, em = cache["ent_vecs"], cache["ent_mask"]
    p, sel, x = cache["p"], cache["sel"], cache["x"]
    pre1, h1 = cache["pre1"], cache["h1"]
    m, c, k = cache["m"], cache["c"], cache["k"]

    dout = (ds * em).reshape(-1)  # mask multiply backward (MC,)
    # combiner MLP
    dW2 = (dout[:, None] * h1).sum(axis=0, keepdims=True)  # (1,h)
    db2 = np.array([dout.sum()])
    dh1 = dout[:, None] * W2  # (MC,h)
    dpre1 = dh1 * (pre1 > 0)
    dW1 = dpre1.T @ x  # (h,2)
    db1 = dpre1.sum(axis=0)
    dx = dpre1 @ W1  # (MC,2)
    decs = dx[:, 0].reshape(m, c)  # log-prior channel is constant

    dctx = np.einsum("mc,mcd->md", decs, ev)  # (M,d)
    dB = (dctx[:, None, :] * sel * p[:, :, None]).sum(axis=(0, 1))
    dp = np.einsum("md,mkd->mk", dctx * B, sel)
    # softmax + the line-68 renorm: dts = p ⊙ (dp − Σ dp·p)
    u = (dp * p).sum(axis=1, keepdims=True)
    dts = p * (dp - u)  # (M,k)
    # scatter through top-k gather → per-token attention scores
    dta = np.zeros_like(cache["tok_mask"])  # (M,T)
    np.put_along_axis(dta, cache["top_ids"], dts, axis=1)
    # max-over-candidates backward: route to the argmax row
    datt = np.zeros((m, ev.shape[1], tv.shape[1]))  # (M,C,T)
    np.put_along_axis(datt, cache["cmax"][:, None, :], dta[:, None, :], axis=1)
    datt *= tm[:, None, :]  # mask multiply backward
    # att = (ev·A) @ tv^T → dA[d] = Σ datt[m,c,t]·ev[m,c,d]·tv[m,t,d]
    dA = np.einsum("mct,mcd,mtd->d", datt, ev, tv, optimize=True)

    return pack_params(dA, dB, dW1, db1, dW2, db2)


def adam_step(theta, grad, state, lr, b1=0.9, b2=0.999, eps=1e-8):
    """torch.optim.Adam update (the scalar recurrence of
    `operators/ranker_train.py` vectorized over the 529 params); state is
    (m, v, t). θ is rounded to 6 dp after the step — the engine's shared
    state representation, keeping the distributed run and the sequential
    transcription in lockstep through rounding checkpoints."""
    mm, vv, t = state
    t += 1
    mm = b1 * mm + (1 - b1) * grad
    vv = b2 * vv + (1 - b2) * grad * grad
    bc1, bc2 = 1 - b1**t, 1 - b2**t
    theta = theta - lr * (mm / bc1) / (np.sqrt(vv / bc2) + eps)
    theta = np.round(theta, 6)
    return theta, (mm, vv, t)
