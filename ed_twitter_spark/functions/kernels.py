"""Pure-numpy inference kernels (SURVEY.md §2.9 K1-K6, T5, T7).

Clean-room reimplementation of the reference's eval-time math — NTEE
prerank, local context attention, multi-relational global model with loopy
belief propagation, and the score⊕prior combiner — as vectorized numpy
over one document (= conversation chunk) at a time (float64 control path;
the O(n²c²) K5/K6 region runs float32 like the reference's torch model —
see global_lbp_scores). Reference cites:

* K1 prerank: `mulrel-nel/nel/ntee.py:20-39`, `ed_ranker.py:65-151`
* K2 local attention: `mulrel-nel/nel/local_ctx_att_ranker.py:52-96`
* K3 combiner MLP: `local_ctx_att_ranker.py:26-28`, `mulrel_ranker.py:84-87,256-259`
* K4 pairwise coherence: `mulrel_ranker.py:163-189`
* K5 relation-weighted entity-pair scores (ment-norm): `mulrel_ranker.py:191-222`
* K6 LBP: `mulrel_ranker.py:233-251`
* T7 argmax + NIL fallback: `ed_ranker.py:433-436`

These run inside `mapInPandas`/`applyInPandas` on executors, batched per
conversation; no torch, no GPU — Arrow batches + BLAS matmuls.
"""

from __future__ import annotations

import numpy as np

from ed_twitter_spark.functions.fixtures import ModelWeights

BIG_NEG = 1e10

# Per-process float32 scratch pool for the O(n²c²) kernel region. Fresh
# megabyte-class numpy allocations go through glibc's mmap path (≥128 KB
# threshold): every call then pays mmap/munmap plus a page fault per 4 KB
# touched, which measured as ~45 ms/chunk of pure allocator overhead in
# the LBP scorer. Carving contiguous views out of one persistent flat
# buffer keeps the pages hot across the ~70 chunk calls each Spark python
# worker handles per task. Workers are single-threaded, so no locking.
_F32_POOL = np.empty(0, dtype=np.float32)


def _carve_f32(*shapes: tuple[int, ...]) -> list[np.ndarray]:
    """Contiguous float32 views of the persistent pool, one per shape."""
    global _F32_POOL
    sizes = [int(np.prod(s)) for s in shapes]
    total = sum(sizes)
    if _F32_POOL.size < total:
        _F32_POOL = np.empty(total, dtype=np.float32)
    out, off = [], 0
    for s, sz in zip(shapes, sizes):
        out.append(_F32_POOL[off : off + sz].reshape(s))
        off += sz
    return out


def _tree_max_last(
    x: np.ndarray, out: np.ndarray, scr: np.ndarray, scr2: np.ndarray
) -> None:
    """``out = x.max(axis=-1)`` by pairwise halving, ping-ponging between
    the two scratch buffers (last dims ⌈c/2⌉ and ⌈c/4⌉... — never
    aliasing input with output, which numpy penalizes heavily). Pairs are
    taken INTERLEAVED (even vs odd lanes, ``0::2`` vs ``1::2``) — measured
    ~6× faster than block-half slicing for the (n,c,n,c) shape — and max
    is associative/commutative, so any pairing order is bit-identical.
    Total read traffic ~2× the buffer vs the (c-1)× of a sequential
    unroll."""
    c = x.shape[-1]
    if c == 1:
        np.copyto(out, x[..., 0])
        return
    bufs = (scr, scr2)
    level = 0
    while True:
        h, odd = c // 2, c % 2
        if h + odd == 1:  # c == 2 (odd c folded earlier): final pair → out
            np.maximum(x[..., 0], x[..., 1], out=out)
            return
        dst = bufs[level % 2]
        np.maximum(x[..., 0 : 2 * h : 2], x[..., 1 : 2 * h : 2], out=dst[..., :h])
        if odd:
            np.copyto(dst[..., h], x[..., 2 * h])
        x = dst[..., : h + odd]
        c = h + odd
        level += 1


def _tree_max_mid(x: np.ndarray, scr: np.ndarray) -> np.ndarray:
    """``x.max(axis=1, keepdims=True)`` for (n,c,n) by pairwise halving
    into ``scr`` (n, ⌈c/2⌉, n); returns a (n,1,n) view of scr. Same
    bit-identity argument as ``_tree_max_last``."""
    c = x.shape[1]
    if c == 1:
        np.copyto(scr[:, 0, :], x[:, 0, :])
        return scr[:, :1, :]
    h, odd = c // 2, c % 2
    np.maximum(x[:, :h, :], x[:, h : 2 * h, :], out=scr[:, :h, :])
    if odd:
        np.copyto(scr[:, h, :], x[:, 2 * h, :])
    ln = h + odd
    while ln > 1:
        h, odd = ln // 2, ln % 2
        np.maximum(scr[:, :h, :], scr[:, h : 2 * h, :], out=scr[:, :h, :])
        if odd:
            np.copyto(scr[:, h, :], scr[:, 2 * h, :])
        ln = h + odd
    return scr[:, :1, :]


def _softmax(x: np.ndarray, axis: int) -> np.ndarray:
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / np.sum(e, axis=axis, keepdims=True)


def _log_softmax(x: np.ndarray, axis: int) -> np.ndarray:
    m = np.max(x, axis=axis, keepdims=True)
    s = x - m
    return s - np.log(np.sum(np.exp(s), axis=axis, keepdims=True))


def pad_token_ids(
    tok_ids: list[list[int]], unk_id: int
) -> tuple[np.ndarray, np.ndarray]:
    """make_equal_len (nel/utils.py:113-122): right-pad with unk + 0-mask;
    empty lists become a single live unk token (ed_ranker.py:288-291)."""
    tok_ids = [ids if len(ids) > 0 else [unk_id] for ids in tok_ids]
    t = max(len(ids) for ids in tok_ids)
    out = np.full((len(tok_ids), t), unk_id, dtype=np.int64)
    mask = np.zeros((len(tok_ids), t), dtype=np.float64)
    for i, ids in enumerate(tok_ids):
        out[i, : len(ids)] = ids
        mask[i, : len(ids)] = 1.0
    return out, mask


# ---------------------------------------------------------------------------
# K1 — NTEE prerank + T5 candidate-set mix
# ---------------------------------------------------------------------------


def ntee_log_probs(
    sum_vecs: np.ndarray, ent_vecs: np.ndarray, ent_mask: np.ndarray
) -> np.ndarray:
    """(M,d) context sums × (M,C,d) candidate vecs → masked log-softmax (M,C).

    `ntee.py:29-39` with use_sum=True, then the mask trick of
    `ed_ranker.py:94`."""
    scores = np.einsum("mcd,md->mc", ent_vecs, sum_vecs)
    log_probs = _log_softmax(scores, axis=1)
    return log_probs * ent_mask + (ent_mask - 1.0) * BIG_NEG


def prerank_select(
    log_probs: np.ndarray, keep_ctx_ent: int = 4, keep_p_e_m: int = 4
):
    """T5 selection-set mix (`ed_ranker.py:95-125`): per mention, union of the
    top-keep_ctx_ent candidates by context score with the first candidate
    indices (p(e|m)-ordered input) filled from 0 upward, returned sorted.

    Returns an (M, n_keep) int64 array (row i = the sorted selected
    indices — identical contents to the per-row set construction, which
    survives as the fallback for rows narrower than n_keep): the union is
    equivalently "top-k marked ∪ first (n_keep − k) unmarked indices",
    which vectorizes as a boolean scatter + a cumulative count of
    unmarked positions, with row-major nonzero yielding each row's
    indices already sorted."""
    n_keep = keep_ctx_ent + keep_p_e_m
    m, c = log_probs.shape
    if c < n_keep or m == 0:
        out = []
        for row in log_probs:
            top = np.argsort(-row, kind="stable")[:keep_ctx_ent]
            selected = set(int(i) for i in top)
            idx = 0
            while len(selected) < n_keep:
                if idx not in selected:
                    selected.add(idx)
                idx += 1
            out.append(np.array(sorted(selected), dtype=np.int64))
        return out
    k = min(keep_ctx_ent, c)
    top = np.argsort(-log_probs, axis=1, kind="stable")[:, :k]
    marked = np.zeros((m, c), dtype=bool)
    marked[np.arange(m)[:, None], top] = True
    unmarked_rank = np.cumsum(~marked, axis=1)
    final = marked | (~marked & (unmarked_rank <= n_keep - k))
    return np.nonzero(final)[1].reshape(m, n_keep).astype(np.int64)


# ---------------------------------------------------------------------------
# K2 — local context attention
# ---------------------------------------------------------------------------


def local_attention_scores(
    tok_vecs: np.ndarray,  # (M,T,d)
    tok_mask: np.ndarray,  # (M,T)
    ent_vecs: np.ndarray,  # (M,C,d)
    ent_mask: np.ndarray,  # (M,C)
    w: ModelWeights,
) -> np.ndarray:
    """(M,C) masked local scores (`local_ctx_att_ranker.py:52-96`, p_e_m=None
    path: mask applied to the raw entity·context scores at line 84)."""
    att = np.matmul(ent_vecs * w.att_mat_diag, tok_vecs.transpose(0, 2, 1))
    att = att * tok_mask[:, None, :] + (tok_mask[:, None, :] - 1.0) * BIG_NEG
    tok_att = att.max(axis=1)  # (M,T) best candidate per token
    k = min(w.tok_top_n, tok_vecs.shape[1])
    top_ids = np.argsort(-tok_att, axis=1, kind="stable")[:, :k]  # (M,k)
    top_scores = np.take_along_axis(tok_att, top_ids, axis=1)
    att_probs = _softmax(top_scores, axis=1)
    att_probs = att_probs / att_probs.sum(axis=1, keepdims=True)
    sel = np.take_along_axis(tok_vecs, top_ids[:, :, None], axis=1)  # (M,k,d)
    ctx_vec = ((sel * w.tok_score_mat_diag) * att_probs[:, :, None]).sum(axis=1)
    scores = np.einsum("mcd,md->mc", ent_vecs, ctx_vec)
    return scores * ent_mask + (ent_mask - 1.0) * BIG_NEG


# ---------------------------------------------------------------------------
# K3 — score ⊕ log-prior combiner MLP
# ---------------------------------------------------------------------------


def score_combine(model_scores: np.ndarray, p_e_m: np.ndarray, w: ModelWeights) -> np.ndarray:
    """2-layer MLP over [score, log(p+1e-20)] (`mulrel_ranker.py:256-259`)."""
    m, c = model_scores.shape
    x = np.stack([model_scores.reshape(-1), np.log(p_e_m + 1e-20).reshape(-1)], axis=1)
    h = np.maximum(x @ w.comb_w1.T + w.comb_b1, 0.0)
    return (h @ w.comb_w2.T + w.comb_b2).reshape(m, c)


# ---------------------------------------------------------------------------
# K4-K6 — multi-relational global model (ment-norm, use_pad_ent) + LBP
# ---------------------------------------------------------------------------


def top_n_neighbour_threshold(ctx_scores: np.ndarray, top_n: int) -> np.ndarray:
    """T6: ent_top_n neighbour thresholding (mulrel_ranker.py:185-189).

    Per (relation, mention) row keep only the top_n neighbour scores —
    ties at the threshold value all survive, exactly like the reference's
    ``topk`` last value + ``>=`` mask — and push the rest to -1e10 before
    the softmax. At the reference default (1000 ≥ n_ments) this is the
    identity, so the ment-norm softmax path is unchanged."""
    n = ctx_scores.shape[2]
    if top_n >= n:
        return ctx_scores
    k = min(top_n, n)
    thr = np.partition(ctx_scores, n - k, axis=2)[:, :, n - k][:, :, None]
    return ctx_scores + (ctx_scores < thr) * (-BIG_NEG)


def global_lbp_scores(
    local_scores: np.ndarray,  # (M,C) masked local scores
    ent_vecs: np.ndarray,  # (M,C,d)
    ent_mask: np.ndarray,  # (M,C)
    p_e_m: np.ndarray,  # (M,C)
    bow_ctx_vecs: np.ndarray,  # (M,3d) [lctx_avg, ment_avg, rctx_avg]
    w: ModelWeights,
) -> np.ndarray:
    """Final combined scores (M,C) per `mulrel_ranker.py:108-263`
    (ment-norm, bilinear, use_pad_ent=True, eval mode → no dropout,
    oracle=False). Note the pad entity is appended *before* the
    `n_ments == 1` check (line 146 vs 159), so with use_pad_ent the global
    path runs even for single-mention documents."""
    m, c = local_scores.shape
    d = ent_vecs.shape[2]
    r = w.rel_embs.shape[0]

    # pad entity (mulrel_ranker.py:136-146)
    ent_vecs = np.concatenate(
        [ent_vecs, np.broadcast_to(w.pad_ent_emb, (1, c, d))], axis=0
    )
    pad_row = np.zeros((1, c))
    pad_row[0, 0] = 1.0
    ent_mask = np.concatenate([ent_mask, pad_row], axis=0)
    p_e_m = np.concatenate([p_e_m, pad_row], axis=0)
    local_scores = np.concatenate([local_scores, np.zeros((1, c))], axis=0)
    n = m + 1

    # K4: pairwise coherence scores over ctx vectors
    ctx = np.tanh(bow_ctx_vecs @ w.ctx_w.T + w.ctx_b)  # (M,d) ctx_layer, eval
    ctx = np.concatenate([ctx, w.pad_ctx_vec[None, :]], axis=0)  # (n,d)
    rel_ctx = ctx[None, :, :] * w.ew_embs[:, None, :]  # (R,n,d)
    ctx_scores = np.matmul(rel_ctx, ctx.T)  # (R,n,n)
    # dist mask: within max_dist all pairs live, diagonal dead (lines 163-181)
    eye = np.eye(n)
    ctx_scores = ctx_scores + (eye[None, :, :]) * (-BIG_NEG)  # (1-dist)*-1e10
    ctx_scores = ctx_scores + eye[None, :, :] * (-BIG_NEG)  # eye*-1e10
    ctx_scores = ctx_scores / np.sqrt(d)  # 1/sqrt(ew_hid_dims)
    ctx_scores = top_n_neighbour_threshold(ctx_scores, w.ent_top_n)
    probs = _softmax(ctx_scores, axis=2)
    weights = probs + probs.transpose(0, 2, 1)  # ment-norm (line 193)

    # K5: bilinear relation-weighted entity-pair scores
    # rel_ent_ent[r,i,c1,j,c2] = Σ_d ent[i,c1,d]·rel[r,d]·ent[j,c2,d]
    # — R matmuls over the (n·c, d) flattened entity matrix. The whole
    # O(n²c²) region runs in float32 (the reference computes this model in
    # float32 torch) with buffers allocated once per call and reused via
    # out=: the LBP loop is memory-bandwidth-bound when every core runs a
    # chunk, so halving element width nearly halves the DRAM traffic that
    # limits many-core scaling, and fresh 5 MB allocations per round would
    # additionally pay mmap page-fault cost.
    f32 = np.float32
    flat = ent_vecs.reshape(n * c, d).astype(f32)
    mask_mul = ent_mask.astype(f32)
    mask_add = ((ent_mask - 1.0) * BIG_NEG).astype(f32)
    rel32 = w.rel_embs.astype(f32)
    w32 = weights.astype(f32)
    # all megabyte-class scratch comes from the per-process pool: a fresh
    # 2.6 MB numpy allocation exceeds glibc's mmap threshold, so per-call
    # allocation pays mmap/munmap + page refaults on every chunk — measured
    # ~45 ms/call of pure allocator overhead (accumulate went 38 ms → 0.8,
    # the masked GEMM 12 ms → 1.6 once the buffers persist)
    ch = (c + 1) // 2  # tree-max level-1 scratch width
    ch2 = (ch + 1) // 2  # level-2 (ping-pong partner)
    ree2d, tmp4, ent_ent, base, sm2d, prev_msgs, msgs, tscr, tscr2, mscr = _carve_f32(
        (n * c, n * c),
        (n, c, n, c),
        (n, c, n, c),
        (n, c, n, c),
        (n, n * c),
        (n, c, n),
        (n, c, n),
        (n, c, n, ch),
        (n, c, n, ch2),
        (n, ch, n),
    )
    ree4 = ree2d.reshape(n, c, n, c)
    for ri in range(r):
        np.matmul(flat * rel32[ri], flat.T, out=ree2d)
        ree4 *= mask_mul[None, None, :, :]
        ree4 += mask_add[None, None, :, :]
        # Σ_r weights[r,i,j]·ree[i,a,j,b]: broadcast the (i,j) weight plane.
        # Relation 0 writes ent_ent directly (saves the zero-fill pass and
        # the first accumulate — per element the result is a single multiply
        # either way, so the bits are unchanged; a -0.0 vs +0.0 difference
        # on underflow dies at the `base` add below, IEEE (-0)+(+0)=+0)
        if ri == 0:
            np.multiply(ree4, w32[ri][:, None, :, None], out=ent_ent)
        else:
            np.multiply(ree4, w32[ri][:, None, :, None], out=tmp4)
            ent_ent += tmp4
    ent_ent /= np.float32(r)  # (n,c,n,c) lines 220-222

    # K6: loopy BP, max-product with damping (lines 233-251)
    offdiag = 1.0 - eye  # (n,n)
    off32 = offdiag.astype(f32)
    np.add(ent_ent, local_scores[None, None, :, :].astype(f32), out=base)
    prev_msgs[...] = 0.0
    votes = tmp4  # reuse the (n,c,n,c) scratch
    df32, one_minus_df32 = np.float32(w.df), np.float32(1.0 - w.df)
    for _ in range(w.n_loops):
        # sum over k≠i of prev_msgs[j,c2,k] → (i,(j,c2)): one GEMM into the
        # preallocated buffer (prev.reshape(nc,n).T is a no-copy view)
        np.matmul(off32, prev_msgs.reshape(n * c, n).T, out=sm2d)
        np.add(base, sm2d.reshape(n, n, c)[:, None, :, :], out=votes)
        # max over c2 → (i,c1,j): pairwise TREE max — each level halves the
        # buffer, so total read traffic is ~2× the buffer instead of the
        # (c-1)× of a sequential unroll, and it still beats
        # ndarray.max(axis=3)'s per-reduction overhead on a length-c inner
        # axis (identical values: max is associative/commutative, no ulp
        # drift regardless of reduction order)
        _tree_max_last(votes, msgs, tscr, tscr2)
        # damped update log(softmax(msgs)·df + exp(prev)·(1−df)), computed
        # in-place in the two ping-pong buffers — identical elementwise
        # arithmetic to the allocating form (same ops, same order)
        mx = _tree_max_mid(msgs, mscr)
        np.subtract(msgs, mx, out=msgs)
        np.exp(msgs, out=msgs)
        ssum = msgs.sum(axis=1, keepdims=True)
        msgs /= ssum
        msgs *= df32
        np.exp(prev_msgs, out=prev_msgs)
        prev_msgs *= one_minus_df32
        msgs += prev_msgs
        np.log(msgs, out=msgs)
        prev_msgs, msgs = msgs, prev_msgs

    ent_scores = local_scores + np.einsum(
        "icj,ij->ic", prev_msgs.astype(np.float64), offdiag
    )
    ent_scores = _softmax(ent_scores, axis=1)

    scores = score_combine(ent_scores, p_e_m, w)
    return scores[:-1]  # drop pad row (line 261-262)


# ---------------------------------------------------------------------------
# T7 — argmax prediction with mask/NIL fallback chain
# ---------------------------------------------------------------------------


def argmax_with_fallback(
    scores: np.ndarray, ent_mask: np.ndarray, named_cands: list[list[str]]
) -> list[str]:
    """`ed_ranker.py:433-436` verbatim semantics."""
    pred_ids = np.argmax(scores, axis=1)
    out = []
    for i, (p, names) in enumerate(zip(pred_ids, named_cands)):
        if ent_mask[i, p] == 1:
            out.append(names[p])
        elif ent_mask[i, 0] == 1:
            out.append(names[0])
        else:
            out.append("NIL")
    return out


# ---------------------------------------------------------------------------
# bow context averaging (A9) for the relation windows
# ---------------------------------------------------------------------------


def _segment_sums(
    tok_ids: list[list[int]], emb: np.ndarray, unk_id: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-list Σ vec via one gather + ``np.add.reduceat`` (no Python loop
    over rows); empty lists are replaced by [unk]. Returns (sums, lens)."""
    if not tok_ids:
        return np.zeros((0, emb.shape[1])), np.zeros(0, dtype=np.int64)
    lists = [ids if len(ids) > 0 else [unk_id] for ids in tok_ids]
    lens = np.fromiter((len(x) for x in lists), dtype=np.int64, count=len(lists))
    flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in lists])
    offsets = np.zeros(len(lists), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    return np.add.reduceat(emb[flat], offsets, axis=0), lens


def segment_sum_vecs(tok_ids: list[list[int]], emb: np.ndarray, unk_id: int) -> np.ndarray:
    """Σ vec per list (A10 NTEE EmbeddingBag-sum, `ntee.py:20-27`)."""
    sums, _ = _segment_sums(tok_ids, emb, unk_id)
    return sums


def masked_mean_vecs(tok_ids: list[list[int]], emb: np.ndarray, unk_id: int) -> np.ndarray:
    """Σ vec / (count + 1e-5) per mention (`mulrel_ranker.py:128-133`);
    empty lists use a single unk token (`ed_ranker.py:226-235`)."""
    sums, lens = _segment_sums(tok_ids, emb, unk_id)
    return sums / (lens[:, None] + 1e-5)
