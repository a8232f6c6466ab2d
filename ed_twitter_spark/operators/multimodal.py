"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A training-data pipeline carries images/audio/video as opaque ``binary``
columns with typed metadata, decoding only inside Arrow-batched Python.
The real codec libraries (PIL/ffmpeg/torchaudio) are not in this
container, so the *decode* step is a clearly-marked deterministic stub —
but everything Spark-side is real and tested: the binary column synthesis,
schema, partitioning, ``mapInPandas`` batch shape, and feature extraction
over raw bytes.

* ``mm_assets``   — synthesizes the asset table ``(doc_id, fmt, blob,
  n_bytes, width, height)``: blob = 64 deterministic bytes derived from
  the document text (md5 chain), dims md5-derived. Oracle-checked with
  the blob surfaced as hex (both engines agree byte-for-byte).
* ``mm_decode_features`` — the decode path: ``mapInPandas`` over the
  asset table computing per-blob byte statistics (mean, min, max, 4-bin
  histogram) in numpy. This is where a real deployment would call
  PIL/librosa per Arrow batch; the byte-stat fake keeps the identical
  batch shape and schema. Rows-only driver check; value-tested against a
  pure-Python reference in tests/test_corpus_ops.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ed_twitter_spark.functions.hashing import h32_col, h32_sql

BLOB_REPEATS = 4  # 4 chained md5 digests → 64-byte payload


def _blob_hex_col():
    """Deterministic 64-byte payload: md5(text) ‖ md5(md5(text)) ‖ …"""
    h = F.md5("text")
    parts = [h]
    for _ in range(BLOB_REPEATS - 1):
        h = F.md5(h)
        parts.append(h)
    return F.concat(*parts)


def _blob_hex_sql() -> str:
    h = "md5(text)"
    parts = [h]
    for _ in range(BLOB_REPEATS - 1):
        h = f"md5({h})"
        parts.append(h)
    return " || ".join(parts)


def mm_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blob = F.unhex(_blob_hex_col())
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/fake")
        .when(F.col("doc_id") % 3 == 1, "audio/fake")
        .otherwise("video/fake")
        .alias("fmt"),
        F.upper(F.hex(blob)).alias("blob_hex"),
        F.length(blob).cast("long").alias("n_bytes"),
        (h32_col(F.col("text")) % 512 + 16).cast("int").alias("width"),
        (h32_col(F.reverse(F.col("text"))) % 512 + 16).cast("int").alias("height"),
    )


MM_ASSETS_SQL = f"""
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image/fake' WHEN 1 THEN 'audio/fake'
            ELSE 'video/fake' END                          AS fmt,
       upper(hex(unhex({_blob_hex_sql()})))                AS blob_hex,
       CAST(octet_length(unhex({_blob_hex_sql()})) AS BIGINT) AS n_bytes,
       CAST({h32_sql('text')} % 512 + 16 AS INTEGER)       AS width,
       CAST({h32_sql('reverse(text)')} % 512 + 16 AS INTEGER) AS height
FROM documents
"""


_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_min", IntegerType()),
        StructField("byte_max", IntegerType()),
        StructField("hist0", IntegerType()),
        StructField("hist1", IntegerType()),
        StructField("hist2", IntegerType()),
        StructField("hist3", IntegerType()),
    ]
)


def decode_blob_features(blob: bytes) -> dict:
    """STUB decode: real deployments decode pixels/samples here (PIL /
    librosa, imported per executor); this container has neither, so the
    'decoded signal' is the raw byte array — deterministic and shape-
    preserving. Byte stats stand in for pixel stats."""
    arr = np.frombuffer(blob, dtype=np.uint8)
    hist = np.bincount(arr >> 6, minlength=4)
    return {
        "n_bytes": int(arr.size),
        "byte_mean": round(float(arr.mean()), 6),
        "byte_min": int(arr.min()),
        "byte_max": int(arr.max()),
        "hist0": int(hist[0]),
        "hist1": int(hist[1]),
        "hist2": int(hist[2]),
        "hist3": int(hist[3]),
    }


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = mm_assets(spark, sf_dir).select(
        "doc_id", F.unhex("blob_hex").alias("blob")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_blob_features(b) for b in pdf["blob"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return assets.mapInPandas(decode_batches, schema=_FEATURES_SCHEMA)
