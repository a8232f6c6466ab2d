"""Twitter eval-set ingestion (S5 + S6 + J5) — the reference parity corpus.

Readers for the reference's mention-context CSV (9+ field TSV, format at
`gen_aida_train.py:4-6`, parser semantics `mulrel-nel/nel/dataset.py:6-37`)
and its CoNLL companion (`conll_from_tweets.py:3-14`, parser
`dataset.py:40-75`), plus the cursor-based CSV↔CoNLL mention alignment
(`dataset.py:79-111`). Data: /root/reference/Twitter_ED/{train,val,test}.

These files are small (hundreds of tweets) but the readers are built
Spark-side anyway: text-line scan + Arrow-batched parsing for the CSV,
wholeTextFiles + flatMap for the stateful CoNLL accumulation (each doc block
parses independently once the file is split on -DOCSTART-).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_RMPUNC = re.compile(r"[\W]+")

CSV_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("doc_name", StringType()),
        StructField("row_idx", IntegerType()),
        StructField("mention", StringType()),
        StructField("lctx", StringType()),
        StructField("rctx", StringType()),
        StructField("cand_names", ArrayType(StringType())),
        StructField("cand_priors", ArrayType(DoubleType())),
        StructField("gold_name", StringType()),
        StructField("gold_is_nil", IntegerType()),
    ]
)


def _norm_name(s: str) -> str:
    return s.replace('"', "%22").replace(" ", "_")


def parse_csv_line(line: str, row_idx: int) -> tuple | None:
    """One mention record (dataset.py:6-37 semantics, incl. comma-containing
    entity names re-joined from the split tail)."""
    comps = line.strip("\n").strip().split("\t")
    if len(comps) < 8:
        return None
    doc_id, mention, lctx, rctx = comps[0], comps[2], comps[3], comps[4]
    doc_name = comps[0] + " " + comps[1]
    names: list[str] = []
    priors: list[float] = []
    if comps[6] != "EMPTYCAND":
        for cstr in comps[6:-2]:
            c = cstr.split(",")
            names.append(_norm_name(",".join(c[2:])))
            priors.append(float(c[1]))
    gold = comps[-1].split(",")
    if gold[0] == "-1":
        gold_name, is_nil = _norm_name(",".join(gold[2:])), 1
    else:
        gold_name, is_nil = _norm_name(",".join(gold[3:])), 0
    return (
        doc_id,
        doc_name,
        row_idx,
        mention,
        lctx,
        rctx,
        names,
        priors,
        gold_name,
        is_nil,
    )


def read_mentions_csv(spark: SparkSession, path: str) -> DataFrame:
    """S5: mention-context records with per-file row order preserved."""
    import builtins

    lines = spark.read.text(path).selectExpr(
        "value", "monotonically_increasing_id() AS _ord"
    )

    def batches(it):
        for pdf in it:
            rows = []
            for line, ordi in zip(pdf["value"], pdf["_ord"]):
                parsed = parse_csv_line(line, int(ordi))
                if parsed is not None:
                    rows.append(parsed)
            yield pd.DataFrame(rows, columns=[f.name for f in CSV_SCHEMA.fields])

    return lines.mapInPandas(batches, schema=CSV_SCHEMA)


CONLL_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("sent_id", IntegerType()),
        StructField("sent_toks", ArrayType(StringType())),
        StructField("m_starts", ArrayType(IntegerType())),
        StructField("m_ends", ArrayType(IntegerType())),
        StructField("m_sents", ArrayType(IntegerType())),
    ]
)


def parse_conll_doc(doc_id: str, body: str):
    """One -DOCSTART- block → sentences + B/I-merged mention spans
    (dataset.py:40-75: 'I' extends the previous mention's end)."""
    sentences: list[list[str]] = []
    mentions: list[dict] = []
    cur: list[str] = []
    for line in body.split("\n"):
        line = line.strip()
        if line == "":
            sentences.append(cur)
            cur = []
            continue
        comps = line.split("\t")
        cur.append(comps[0])
        if len(comps) >= 6:
            if comps[1] == "I":
                mentions[-1]["end"] += 1
            else:
                mentions.append(
                    {
                        "sent_id": len(sentences),
                        "start": len(cur) - 1,
                        "end": len(cur),
                        "wikilink": comps[4],
                    }
                )
    if cur:
        sentences.append(cur)
    return sentences, mentions


def read_conll(spark: SparkSession, path: str) -> DataFrame:
    """S6: one row per doc-sentence, plus the doc's mention span arrays
    (replicated per sentence row for locality; docs are tweets — tiny)."""

    def parse_file(kv):
        _, content = kv
        out = []
        for block in content.split("-DOCSTART- (")[1:]:
            header, _, body = block.partition("\n")
            doc_id = header.split()[0].rstrip(")")
            sentences, mentions = parse_conll_doc(doc_id, body)
            starts = [m["start"] for m in mentions]
            ends = [m["end"] for m in mentions]
            sents = [m["sent_id"] for m in mentions]
            for sid, toks in enumerate(sentences):
                out.append((doc_id, sid, toks, starts, ends, sents))
        return out

    rdd = spark.sparkContext.wholeTextFiles(path).flatMap(parse_file)
    return spark.createDataFrame(rdd, schema=CONLL_SCHEMA)


def align_csv_conll(csv_rows: list[dict], conll_doc: dict) -> list[dict | None]:
    """J5 cursor matcher (dataset.py:88-111): returns per-CSV-row the matched
    conll mention dict (sent_id,start,end) or None."""
    out: list[dict | None] = []
    cur = 0
    mentions = conll_doc["mentions"]
    sentences = conll_doc["sentences"]
    for row in csv_rows:
        mention = row["mention"]
        matched = None
        while True:
            if cur >= len(mentions):
                break
            cm = mentions[cur]
            cm_txt = " ".join(sentences[cm["sent_id"]][cm["start"] : cm["end"]])
            if _RMPUNC.sub("", cm_txt.lower()) == _RMPUNC.sub("", mention.lower()):
                matched = cm
                cur += 1
                break
            elif _RMPUNC.sub("", mention.lower()) in _RMPUNC.sub("", cm_txt.lower()):
                break  # parsing err: stay on this conll mention
            else:
                cur += 1
        out.append(matched)
    return out
