"""BPE tokenizer training, PCA, and curriculum-schedule tests.

The gate (tools/oracle_check.py) pins Spark ≡ DuckDB; these tests pin
both against a THIRD, independent expression of the algorithm — a plain
Python BPE transcription and a numpy eigensolve — plus the structural
invariants the downstream consumers rely on.
"""

from __future__ import annotations

import collections

import numpy as np
import pytest

from tests.conftest import SF_SMOKE


def _py_bpe(word_freq: dict[str, int], n_merges: int):
    """Reference BPE (Sennrich et al. 2016, Algorithm 1) on symbol tuples:
    count overlapping adjacent pairs weighted by word freq, merge the
    (cnt DESC, a, b) argmax greedily left-to-right within each word."""
    vocab = {tuple(w): f for w, f in word_freq.items()}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, a + b, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges, vocab


def test_bpe_train_matches_python_transcription(spark):
    from ed_twitter_spark.operators import bpe

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    words = [
        w
        for r in docs.select("text").collect()
        for w in r["text"].split()
        if w and w.isascii() and w.replace("_", "a").isalnum() and w == w.lower()
    ]
    import re

    words = [w for w in words if re.fullmatch("[a-z0-9]+", w)]
    freq = collections.Counter(words)
    expect, _ = _py_bpe(dict(freq), bpe.N_MERGES)

    got = [
        (r["a"], r["b"], r["merged"], r["cnt"])
        for r in bpe.bpe_train(spark, SF_SMOKE).orderBy("round").collect()
    ]
    assert got == expect


def test_bpe_greedy_overlap_semantics():
    """'a a a' + merge (a,a) must yield ['aa','a'] (left-to-right greedy),
    which is what literal replace('[a][a]' -> '[aa]') produces."""
    merges, vocab = _py_bpe({"aaa": 1}, 1)
    assert merges[0][:2] == ("a", "a")
    assert list(vocab) == [("aa", "a")]
    # the string-splice twin used by both engines
    assert "[a][a][a]".replace("[a][a]", "[aa]") == "[aa][a]"


def test_bpe_encode_compression_monotone(spark):
    """BPE tokens per word is between 1 (fully merged) and the word's char
    count (no merges); encoding must count every filtered word."""
    from ed_twitter_spark.operators import bpe

    rows = bpe.bpe_encode(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1.0 <= r["tokens_per_word"]
        assert r["n_bpe"] >= r["n_words"]


def test_embed_pca_matches_numpy_transcription(spark):
    """Third-engine check: a numpy transcription of the SAME fixed-count
    max-normalized power iteration over the SAME integer-moment covariance
    must reproduce the gated loadings to the rounded precision, and the
    result must be near-dominant (bounded Rayleigh gap vs numpy eigh — the
    isotropic fixture is the adversarial eigengap floor, so exact λ_max
    equality is deliberately NOT asserted; see embed_pca.PCA_ITERS)."""
    from ed_twitter_spark.operators import embed_pca

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    M = np.floor(
        np.array([r["embedding"] for r in emb], dtype=np.float64)
        * embed_pca.Q_SCALE
        + 0.5
    )
    n, d = M.shape
    # the engines' integer moments: exact in float64 (values ≪ 2^53)
    G = M.T @ M
    s = M.sum(axis=0)
    C = (G - np.outer(s, s) / n) / n

    x = np.ones(d)
    for _ in range(embed_pca.PCA_ITERS):
        w = C @ x
        star = w[np.argmax(np.abs(w))]  # argmax takes lowest index on ties
        x = w / star

    out = embed_pca.embed_pca(spark, SF_SMOKE).orderBy("dim").collect()
    v = np.array([r["loading"] for r in out])
    lam = out[0]["eigval"]
    assert max(abs(v)) == pytest.approx(1.0, abs=1e-9)
    assert np.allclose(v, np.round(x, 6), atol=2e-6)
    assert lam == pytest.approx(star, rel=1e-6)
    # dominance bound: Rayleigh quotient of the iterate vs true λ_max
    rayleigh = (v @ C @ v) / (v @ v)
    lam_max = np.linalg.eigvalsh(C)[-1]
    assert rayleigh >= 0.9 * lam_max
    assert lam > 0


def test_dataset_curriculum_schedule(spark):
    """global_idx is a permutation of 1..n; phases are contiguous ascending
    blocks; difficulty is (weakly) staged: every phase-k doc is ≤ every
    phase-(k+1) doc's difficulty; within a phase the order is the md5
    shuffle, not the difficulty order."""
    from ed_twitter_spark.operators.corpus_filters import dataset_curriculum

    rows = dataset_curriculum(spark, SF_SMOKE).orderBy("global_idx").collect()
    n = len(rows)
    assert [r["global_idx"] for r in rows] == list(range(1, n + 1))
    phases = [r["phase"] for r in rows]
    assert phases == sorted(phases)  # contiguous easy -> hard blocks
    by_phase = collections.defaultdict(list)
    for r in rows:
        by_phase[r["phase"]].append(r["difficulty"])
    ks = sorted(by_phase)
    assert ks == [1, 2, 3, 4]
    for a, b in zip(ks, ks[1:]):
        assert max(by_phase[a]) <= min(by_phase[b])
    # equal-mass split (quantile cutoffs): phase sizes within 2 of n/4
    for k in ks:
        assert abs(len(by_phase[k]) - n / 4) <= 2
    # md5 shuffle inside each phase: difficulty not monotone within phase 1
    d1 = by_phase[1]
    assert d1 != sorted(d1)


def test_bpe_vocab_consistent_with_encode(spark):
    """Σ symbol freq over the vocab == Σ per-doc BPE token counts (the
    same corpus measured two ways), and every merged symbol the merge
    table produced that SURVIVES in some word appears in the vocab."""
    from ed_twitter_spark.operators import bpe

    vocab = bpe.bpe_vocab(spark, SF_SMOKE).collect()
    enc = bpe.bpe_encode(spark, SF_SMOKE).collect()
    assert sum(r["freq"] for r in vocab) == sum(r["n_bpe"] for r in enc)
    symbols = {r["symbol"] for r in vocab}
    # single chars that were never fully merged away must be present
    assert any(len(s) == 1 for s in symbols)
    assert any(len(s) > 1 for s in symbols)  # merges actually happened


def test_embed_pca_scores_centered(spark):
    """Projections of mean-centered data sum to ~0, and match the numpy
    transcription of the same quantized projection."""
    from ed_twitter_spark.operators import embed_pca

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    ids = [r["vec_id"] for r in emb]
    M = np.floor(
        np.array([r["embedding"] for r in emb], dtype=np.float64)
        * embed_pca.Q_SCALE
        + 0.5
    )
    n, d = M.shape
    G = M.T @ M
    s = M.sum(axis=0)
    C = (G - np.outer(s, s) / n) / n
    x = np.ones(d)
    for _ in range(embed_pca.PCA_ITERS):
        w = C @ x
        x = w / w[np.argmax(np.abs(w))]
    expect = (M - s / n) @ x / embed_pca.Q_SCALE

    rows = {
        r["vec_id"]: r["score"]
        for r in embed_pca.embed_pca_scores(spark, SF_SMOKE).collect()
    }
    got = np.array([rows[i] for i in ids])
    assert np.allclose(got, np.round(expect, 6), atol=2e-6)
    assert abs(got.mean()) < 1e-4  # centered


def test_quality_classifier_descends_and_separates(spark):
    """The GD loop must strictly descend the logistic loss, match a numpy
    transcription of the same full-batch updates, and the trained filter
    must keep every real document while its templated-spam twins would
    score below 0.5 (the classes are separable by construction)."""
    from ed_twitter_spark.operators import quality_classifier as qc

    steps = qc.quality_classifier_train(spark, SF_SMOKE).orderBy("step").collect()
    losses = [r["loss"] for r in steps]
    assert losses == sorted(losses, reverse=True)
    assert losses[-1] < losses[0]

    # numpy transcription over the same features
    feats = qc._feature_frame(spark, SF_SMOKE).collect()
    X = np.array([[r[f"x{j}"] for j in range(qc._NF)] for r in feats])
    y = np.array([r["y"] for r in feats])
    w = np.zeros(qc._NF)
    expect = []
    for _ in range(qc.GD_STEPS):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        loss = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
        w = w - qc.LR * ((p - y) @ X) / len(X)
        expect.append((loss, w.copy()))
    for r, (loss, wv) in zip(steps, expect):
        assert r["loss"] == pytest.approx(loss, abs=2e-6)
        for j in range(qc._NF):
            assert r[f"w{j}"] == pytest.approx(wv[j], abs=2e-6)

    scored = qc.quality_classifier_score(spark, SF_SMOKE).collect()
    assert scored and all(r["keep"] for r in scored)
    # the negative twins score below threshold under the same weights
    pneg = 1.0 / (1.0 + np.exp(-(X[y == 0.0] @ w)))
    assert (pneg < 0.5).all()
