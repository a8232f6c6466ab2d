"""Cosine linker: "cosine over averaged word/entity embeddings" (K1/A9 core).

The SQL-expressible distillation of the reference's disambiguation kernel:
score(candidate e | mention m) = Σ_{w ∈ ±25-token window} n(e)·n(w)  +  ln p(e|m)
where n(·) is L2 normalization (`ed_ranker.py:32-39`) and the sum-of-dots is
dot-of-sum by linearity (`ntee.py:20-27` EmbeddingBag sum). Arrow-batched
numpy inside ``mapInPandas`` with a broadcast embedding matrix; the DuckDB
oracle computes the identical sum via ``list_dot_product``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ed_twitter_spark.functions.fixtures import ent_code, load_embedding_matrix, word_code
from ed_twitter_spark.synth import MENTION_MIN_LEN

COS_WINDOW = 25  # ±25 tokens, turn-local (prerank_ctx_window // 2)

_OUT_SCHEMA = StructType(
    [
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("mention_idx", IntegerType()),
        StructField("mention", StringType()),
        StructField("score_r4", DoubleType()),
    ]
)


def link_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ed_twitter_spark import synth

    emb = load_embedding_matrix(spark, sf_dir)  # already L2-normalized
    n_vec = emb.shape[0] - 1
    bc = spark.sparkContext.broadcast(emb)

    t = synth.transcripts(spark, sf_dir)
    kb = synth.kb_alias(spark, sf_dir)

    # one row per turn with its token array; mentions derived in the UDF so
    # the window slice shares the tokenization exactly
    turns = t.select("conv_id", "turn_idx", "text")

    # candidate map shipped as a broadcast python dict (small dim side)
    kb_rows = kb.select("mention", "ent_name", "prior").collect()
    kb_map: dict[str, list[tuple[str, float]]] = {}
    for r in kb_rows:
        kb_map.setdefault(r["mention"], []).append((r["ent_name"], float(r["prior"])))
    for v in kb_map.values():
        v.sort(key=lambda x: x[0])
    bc_kb = spark.sparkContext.broadcast(kb_map)

    def score_batches(it):
        emb_m = bc.value
        kbm = bc_kb.value
        for pdf in it:
            out = []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                toks = (text or "").split()
                wids = np.array([word_code(tk) % n_vec for tk in toks], dtype=np.int64)
                for p, tok in enumerate(toks):
                    if len(tok) < MENTION_MIN_LEN or tok not in kbm:
                        continue
                    lo, hi = max(0, p - COS_WINDOW), min(len(toks), p + COS_WINDOW + 1)
                    ctx = np.concatenate([wids[lo:p], wids[p + 1 : hi]])
                    ctx_sum = (
                        emb_m[ctx].sum(axis=0) if len(ctx) else np.zeros(emb_m.shape[1])
                    )
                    best_name, best_score = None, -np.inf
                    for ent_name, prior in kbm[tok]:
                        s = float(
                            emb_m[ent_code(ent_name) % n_vec] @ ctx_sum
                        ) + float(np.log(prior + 1e-20))
                        # ties broken by ent_name asc (list pre-sorted)
                        if s > best_score:
                            best_name, best_score = ent_name, s
                    out.append(
                        (
                            f"{conv_id}#{turn_idx}#{p}",
                            "links_to",
                            best_name,
                            conv_id,
                            int(turn_idx),
                            p,
                            tok,
                            round(best_score, 4),
                        )
                    )
            yield pd.DataFrame(out, columns=[f.name for f in _OUT_SCHEMA.fields])

    return turns.mapInPandas(score_batches, schema=_OUT_SCHEMA)


def link_cosine_oracle_sql() -> str:
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators.mentions import mentions_sql

    return f"""
WITH m AS ({mentions_sql()}),
kb AS ({synth.KB_ALIAS_SQL}),
nv AS (SELECT MAX(vec_id) + 1 AS n FROM embeddings),
wv AS (
  SELECT vec_id,
         list_transform(embedding,
            x -> CAST(x AS DOUBLE) / sqrt(list_dot_product(
                 list_transform(embedding, y -> CAST(y AS DOUBLE)),
                 list_transform(embedding, y -> CAST(y AS DOUBLE))))) AS vec
  FROM embeddings
),
tok_pos AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '\\s+')) AS tok,
         CAST(unnest(range(len(string_split_regex(text, '\\s+')))) AS INTEGER) AS pos
  FROM documents
),
ctx AS (
  SELECT m.conv_id, m.turn_idx, m.mention_idx, tp.tok
  FROM m JOIN tok_pos tp
    ON m.doc_id = tp.doc_id
   AND tp.pos <> m.mention_idx
   AND abs(tp.pos - m.mention_idx) <= {COS_WINDOW}
),
ctx_dots AS (
  SELECT c.conv_id, c.turn_idx, c.mention_idx, kb.ent_name,
         SUM(list_dot_product(ev.vec, wv.vec)) AS dot_sum
  FROM ctx c
  JOIN (SELECT conv_id, turn_idx, mention_idx, mention FROM m) mm
    USING (conv_id, turn_idx, mention_idx)
  JOIN kb ON kb.mention = mm.mention
  JOIN wv ON wv.vec_id = CAST(('0x' || substr(md5(c.tok), 1, 6)) AS BIGINT) % (SELECT n FROM nv)
  JOIN wv ev ON ev.vec_id = CAST(('0x' || substr(md5(kb.ent_name), 1, 8)) AS BIGINT) % (SELECT n FROM nv)
  GROUP BY 1, 2, 3, 4
),
scored AS (
  SELECT m.conv_id, m.turn_idx, m.mention_idx, m.mention,
         kb.ent_name,
         COALESCE(cd.dot_sum, 0.0) + ln(kb.prior + 1e-20) AS score,
         ROW_NUMBER() OVER (
           PARTITION BY m.conv_id, m.turn_idx, m.mention_idx
           ORDER BY COALESCE(cd.dot_sum, 0.0) + ln(kb.prior + 1e-20) DESC,
                    kb.ent_name) AS rnk
  FROM m
  JOIN kb ON kb.mention = m.mention
  LEFT JOIN ctx_dots cd
    ON cd.conv_id = m.conv_id AND cd.turn_idx = m.turn_idx
   AND cd.mention_idx = m.mention_idx AND cd.ent_name = kb.ent_name
)
SELECT conv_id || '#' || CAST(turn_idx AS VARCHAR) || '#' ||
         CAST(mention_idx AS VARCHAR) AS subj,
       'links_to' AS pred,
       ent_name   AS obj,
       conv_id, turn_idx, mention_idx, mention,
       ROUND(score, 4) AS score_r4
FROM scored WHERE rnk = 1
"""
