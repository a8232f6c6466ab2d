"""Candidate generation: the KB alias join (J1) + prior-argmax linking (T7).

The reference probes an in-memory dict `ent_p_e_m_index[mention]`
(`mulrel-nel/nel/dataset.py` callers; index built at
`yago_crosswikis_wiki.py:15-36`). In Spark the dictionary is a DataFrame and
the probe is a **broadcast hash join** — the alias table is orders of
magnitude smaller than the mention stream, so we pin `F.broadcast` rather
than trusting the size estimator; AQE skew-join handles the shuffle fallback
if a deployment disables the hint. A left join preserves the EMPTYCAND path
(`gen_aida_test.py:198-203`): unmatched mentions surface with NULL candidate
and become NIL predictions downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gen_candidates(mentions_df: DataFrame, kb_df: DataFrame) -> DataFrame:
    """One output row per (mention occurrence, candidate), ranked by prior.

    Columns: conv_id, turn_idx, mention_idx, mention, ent_id, ent_name,
    prior, rank (1-based, prior desc / ent_name asc — the reference sorts
    candidates by count desc with Python's stable sort,
    `merge_crosswikis_wiki.py:91-92`).
    """
    return mentions_df.join(F.broadcast(kb_df), on="mention", how="left").select(
        "conv_id",
        "turn_idx",
        "mention_idx",
        "mention",
        "ent_id",
        "ent_name",
        "prior",
        "rank",
        "doc_id",
    )


def link_prior_argmax(candidates_df: DataFrame) -> DataFrame:
    """Top-1 candidate by prior → (subj, pred, obj, score) triples.

    This is the reference's fallback prediction when context is empty /
    model scores tie (argmax over p(e|m), `ed_ranker.py:433-436` with the
    prior as the only signal). NULL-candidate mentions become obj='NIL'
    (`dataset.py:227-233` excludes NIL from the precision denominator).
    """
    top1 = candidates_df.where((F.col("rank") == 1) | F.col("rank").isNull())
    return top1.select(
        F.concat_ws("#", "conv_id", "turn_idx", "mention_idx").alias("subj"),
        F.lit("links_to").alias("pred"),
        F.coalesce("ent_name", F.lit("NIL")).alias("obj"),
        F.coalesce("prior", F.lit(0.0)).alias("score"),
        "conv_id",
        "turn_idx",
        "mention_idx",
        "mention",
        "doc_id",
    )
