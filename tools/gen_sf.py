"""Deterministic scale-factor generator for the bench input tables.

The driver ships seed-42 synthetic parquet at sf ≤ 0.1 (`/root/testdata`,
read-only). The round-4 verdict asks for one order of magnitude of
empirical scale confirmation (sf1 = 10× sf0.1) plus a deliberate skew
stress — this script synthesizes those inputs *locally* (under the repo,
gitignored) with the same distributional shape as the driver data,
measured from sf0.1:

  documents   doc_id 0..N-1; text = 10–100 tokens uniform over the same
              30-word vocabulary; ~5% of docs are near-duplicates of an
              earlier doc (one token replaced by the ``dup`` marker) and
              ~0.16% are exact duplicates — matching sf0.1's dedup
              structure (8 exact pairs / 250 ``dup`` docs per 5,000);
              lang en≈41% + {zh,es,fr,de}≈15% each; source src0..src19.
  embeddings  vec_id 0..M-1; unit-norm float32[64] (sf0.1 component
              stats: mean≈0, sd≈1/√64); label uniform 0..9.
  events      event_id 0..E-1; ts uniform over 2024-01; user_id uniform
              0..(15000·sf); event_type uniform over 5; value ~ Exp(50);
              props = {"k": uniform 0..99}.
  region      the 5 TPC-H rows (bench warm-up reads it).

Row counts scale linearly: sf1 → 50,000 docs / 20,000 vectors /
1,000,000 events (10× the sf0.1 driver data).

``--skew`` instead generates the stress variant of the same sizes:
  * token draws are Zipf(1.5) over the vocab — the head token carries
    ~30% of all mention occurrences (hot key for the candidates join and
    the kb_alias build);
  * embedding labels are Zipf — the head label owns ~45% of vectors, a
    degenerate cell for the label-blocked cosine join (CELL_CAP path).
The hot *conversation* needs no data knob: transcripts' GRP rule sends
every 10th doc_id to conv_0, which at any sf is ~10× the median
conversation (synth.py:107).

Usage:  python tools/gen_sf.py <out_dir> <sf> [--skew] [--seed 42]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]

DOCS_PER_SF = 50_000
VECS_PER_SF = 20_000
EVENTS_PER_SF = 1_000_000
USERS_PER_SF = 15_000
EMB_DIMS = 64

NEAR_DUP_FRAC = 0.05   # docs that are a near-copy (one token → 'dup')
EXACT_DUP_FRAC = 0.0016  # docs that are an exact copy of an earlier doc


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy")
    print(f"  {name}: {table.num_rows:,} rows -> {path}")


def gen_documents(rng: np.random.Generator, n: int, skew: bool) -> pa.Table:
    if skew:
        # Zipf(1.5) over vocab ranks: head token ~30% of occurrences
        w = 1.0 / np.arange(1, len(VOCAB) + 1) ** 1.5
        tok_p = w / w.sum()
    else:
        tok_p = np.full(len(VOCAB), 1.0 / len(VOCAB))
    vocab = np.array(VOCAB)

    lens = rng.integers(10, 101, size=n)
    texts: list[str] = [""] * n
    kinds = rng.random(n)
    near_tok_pos = rng.random(n)  # fraction through the doc to plant 'dup'
    copy_src = rng.integers(0, max(n // 2, 1), size=n)
    for i in range(n):
        if i > 0 and kinds[i] < EXACT_DUP_FRAC:
            texts[i] = texts[copy_src[i] % i]
            continue
        toks = vocab[rng.choice(len(VOCAB), size=lens[i], p=tok_p)]
        if i > 0 and kinds[i] < EXACT_DUP_FRAC + NEAR_DUP_FRAC:
            # near-dup: clone an earlier doc, swap one token for 'dup'
            base = texts[copy_src[i] % i].split(" ")
            base[int(near_tok_pos[i] * len(base))] = "dup"
            texts[i] = " ".join(base)
            continue
        texts[i] = " ".join(toks)

    lang = rng.choice(LANGS, size=n, p=LANG_P)
    source = np.char.add("src", rng.integers(0, 20, size=n).astype(str))
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(lang),
            "source": pa.array(source),
            "n_chars": pa.array(n_chars),
        }
    )


def gen_embeddings(rng: np.random.Generator, m: int, skew: bool) -> pa.Table:
    vecs = rng.standard_normal((m, EMB_DIMS)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    if skew:
        w = 1.0 / np.arange(1, 11) ** 2.0  # head label ~45% of vectors
        label = rng.choice(10, size=m, p=w / w.sum()).astype(np.int32)
    else:
        label = rng.integers(0, 10, size=m).astype(np.int32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(m, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(label),
        }
    )


def gen_events(rng: np.random.Generator, e: int, n_users: int) -> pa.Table:
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = base + rng.integers(0, span_us, size=e).astype("timedelta64[us]")
    ts = np.sort(ts)  # driver events arrive roughly time-ordered
    return pa.table(
        {
            "event_id": pa.array(np.arange(e, dtype=np.int64)),
            "ts": pa.array(ts),
            "user_id": pa.array(rng.integers(0, n_users, size=e)),
            "event_type": pa.array(rng.choice(EVENT_TYPES, size=e)),
            "value": pa.array(np.round(rng.exponential(50.0, size=e), 2)),
            "props": pa.array(
                [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, size=e)]
            ),
        }
    )


def gen_region() -> pa.Table:
    return pa.table(
        {
            "r_regionkey": pa.array(np.arange(5, dtype=np.int64)),
            "r_name": pa.array(
                ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
            ),
        }
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skew = "--skew" in sys.argv
    seed = 42
    if "--seed" in sys.argv:
        seed = int(sys.argv[sys.argv.index("--seed") + 1])
        args = [a for a in args if a != str(seed)]
    out_dir, sf = args[0], float(args[1])
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    print(f"gen_sf: sf={sf} skew={skew} seed={seed} -> {out_dir}")
    _write(out_dir, "documents", gen_documents(rng, int(DOCS_PER_SF * sf), skew))
    _write(out_dir, "embeddings", gen_embeddings(rng, int(VECS_PER_SF * sf), skew))
    _write(out_dir, "events", gen_events(rng, int(EVENTS_PER_SF * sf), int(USERS_PER_SF * sf)))
    _write(out_dir, "region", gen_region())


if __name__ == "__main__":
    main()
