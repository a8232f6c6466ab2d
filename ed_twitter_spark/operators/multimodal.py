"""Multimodal column plumbing: binary payloads + typed metadata + decode.

A training-data pipeline carries images/audio/video as opaque ``binary``
columns with typed metadata, decoding only inside Arrow-batched Python.
Two of the three synthetic modalities are **real containers in
codec-free formats**, so their decode path is a genuine parse, not a
stub:

* ``image/ppm`` — a valid binary PPM (P6) image: 11-byte header
  ``P6\\n4 4\\n255\\n`` + 48 raw RGB bytes. Decoded by parsing the header
  and reshaping the pixel plane (what PIL would do for this format).
* ``audio/wav`` — a valid RIFF/WAVE file: 44-byte PCM16-mono-8kHz header
  + 24 little-endian 16-bit samples. Decoded with the stdlib ``wave``
  reader (a real container parse) + numpy sample extraction.
* ``video/fake`` — video genuinely needs ffmpeg, which this container
  lacks, so the decode is an honest byte-stat stub over the raw payload
  (clearly marked; a real deployment swaps in PyAV per Arrow batch).

Payload bytes are md5-chain derived from the document text, so BOTH
engines can synthesize the identical container bit-for-bit and the
decode itself is oracle-checked: the DuckDB twin re-parses samples out
of the hex (including the WAV's little-endian signed-16 arithmetic) and
must reproduce every per-asset signal statistic.

* ``mm_assets``          — asset table (doc_id, fmt, blob_hex, n_bytes,
  width, height); real dims for the image rows.
* ``mm_decode_features`` — per-asset decoded-signal statistics
  (n_units, mean/min/max, 4-bin histogram), one ``mapInPandas`` stage.
"""

from __future__ import annotations

import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOB_REPEATS = 4  # 4 chained md5 digests → 64 payload bytes (128 hex chars)

# P6\n4 4\n255\n — 4×4 RGB, maxval 255; 48 data bytes follow
PPM_W = PPM_H = 4
PPM_HDR_HEX = "50360A3420340A3235350A"
PPM_DATA_BYTES = PPM_W * PPM_H * 3
# RIFF/WAVE PCM16 mono 8000 Hz, 24 samples (48 data bytes)
WAV_SAMPLES = 24
WAV_HDR_HEX = (
    "524946465400000057415645666D7420100000000100010040"
    "1F0000803E00000200100064617461"
    "30000000"
)
WAV_HDR_BYTES = 44


def _chain_hex_col():
    """Deterministic payload hex: md5(text) ‖ md5(md5(text)) ‖ …"""
    h = F.md5("text")
    parts = [h]
    for _ in range(BLOB_REPEATS - 1):
        h = F.md5(h)
        parts.append(h)
    return F.upper(F.concat(*parts))


def _chain_hex_sql() -> str:
    h = "md5(text)"
    parts = [h]
    for _ in range(BLOB_REPEATS - 1):
        h = f"md5({h})"
        parts.append(h)
    return "upper(" + " || ".join(parts) + ")"


def mm_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chain = _chain_hex_col()
    fmt = (
        F.when(F.col("doc_id") % 3 == 0, "image/ppm")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/fake")
    )
    blob_hex = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(PPM_HDR_HEX), F.substring(chain, 1, PPM_DATA_BYTES * 2)),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit(WAV_HDR_HEX), F.substring(chain, 1, WAV_SAMPLES * 4)),
        )
        .otherwise(chain)
    )
    return docs.select(
        "doc_id",
        fmt.alias("fmt"),
        blob_hex.alias("blob_hex"),
        (F.length(blob_hex) / 2).cast("long").alias("n_bytes"),
        F.when(F.col("doc_id") % 3 == 0, PPM_W).otherwise(0).cast("int").alias("width"),
        F.when(F.col("doc_id") % 3 == 0, PPM_H).otherwise(0).cast("int").alias("height"),
    )


MM_ASSETS_SQL = f"""
WITH d AS (SELECT doc_id, {_chain_hex_sql()} AS chain FROM documents)
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image/ppm' WHEN 1 THEN 'audio/wav'
            ELSE 'video/fake' END AS fmt,
       CASE doc_id % 3
            WHEN 0 THEN '{PPM_HDR_HEX}' || substr(chain, 1, {PPM_DATA_BYTES * 2})
            WHEN 1 THEN '{WAV_HDR_HEX}' || substr(chain, 1, {WAV_SAMPLES * 4})
            ELSE chain END AS blob_hex,
       CAST(length(CASE doc_id % 3
            WHEN 0 THEN '{PPM_HDR_HEX}' || substr(chain, 1, {PPM_DATA_BYTES * 2})
            WHEN 1 THEN '{WAV_HDR_HEX}' || substr(chain, 1, {WAV_SAMPLES * 4})
            ELSE chain END) / 2 AS BIGINT) AS n_bytes,
       CAST(CASE doc_id % 3 WHEN 0 THEN {PPM_W} ELSE 0 END AS INTEGER) AS width,
       CAST(CASE doc_id % 3 WHEN 0 THEN {PPM_H} ELSE 0 END AS INTEGER) AS height
FROM d
"""


_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fmt", StringType()),
        StructField("n_units", IntegerType()),
        StructField("sig_mean", DoubleType()),
        StructField("sig_min", IntegerType()),
        StructField("sig_max", IntegerType()),
        StructField("hist0", IntegerType()),
        StructField("hist1", IntegerType()),
        StructField("hist2", IntegerType()),
        StructField("hist3", IntegerType()),
    ]
)


def decode_blob_features(fmt: str, blob: bytes) -> dict:
    """Per-asset decode → signal statistics.

    PPM and WAV are *real* parses of valid containers; ``video/fake`` is
    the honest stub (no ffmpeg in this container) over raw bytes."""
    if fmt == "image/ppm":
        assert blob[:2] == b"P6"
        # header: P6 \n <w> <sp> <h> \n <maxval> \n, then raw RGB plane
        hdr, _, _ = blob.partition(b"255\n")
        dims = hdr.split()[1:3]
        w, h = int(dims[0]), int(dims[1])
        pixels = np.frombuffer(blob[-w * h * 3 :], dtype=np.uint8)
        vals = pixels.astype(np.int64)
        bins = vals >> 6
    elif fmt == "audio/wav":
        wf = wave.open(io.BytesIO(blob))
        assert wf.getsampwidth() == 2 and wf.getnchannels() == 1
        frames = wf.readframes(wf.getnframes())
        vals = np.frombuffer(frames, dtype="<i2").astype(np.int64)
        bins = (vals + 32768) >> 14
    else:
        vals = np.frombuffer(blob, dtype=np.uint8).astype(np.int64)
        bins = vals >> 6
    hist = np.bincount(bins, minlength=4)
    return {
        "n_units": int(vals.size),
        "sig_mean": round(float(vals.mean()), 6),
        "sig_min": int(vals.min()),
        "sig_max": int(vals.max()),
        "hist0": int(hist[0]),
        "hist1": int(hist[1]),
        "hist2": int(hist[2]),
        "hist3": int(hist[3]),
    }


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = mm_assets(spark, sf_dir).select(
        "doc_id", "fmt", F.unhex("blob_hex").alias("blob")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_blob_features(f, b) for f, b in zip(pdf["fmt"], pdf["blob"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "fmt", pdf["fmt"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return assets.mapInPandas(decode_batches, schema=_FEATURES_SCHEMA)


# DuckDB twin: re-parse the signal values straight out of the hex — uint8
# planes for ppm/video, little-endian *signed* 16-bit samples at the WAV
# data offset — and aggregate the identical statistics.
MM_DECODE_SQL = f"""
WITH a AS ({MM_ASSETS_SQL}),
u AS (
  SELECT doc_id, fmt, blob_hex,
         CASE fmt WHEN 'audio/wav' THEN {WAV_SAMPLES}
                  WHEN 'image/ppm' THEN {PPM_DATA_BYTES}
                  ELSE 16 * {BLOB_REPEATS} END AS n_units
  FROM a
),
vals AS (
  SELECT doc_id, fmt, n_units,
         CASE fmt
           WHEN 'audio/wav' THEN
             (CAST(('0x' || substr(blob_hex, {WAV_HDR_BYTES * 2} + 1 + 4 * k, 2)) AS INTEGER)
              + 256 * CAST(('0x' || substr(blob_hex, {WAV_HDR_BYTES * 2} + 3 + 4 * k, 2)) AS INTEGER)
              + 32768) % 65536 - 32768
           WHEN 'image/ppm' THEN
             CAST(('0x' || substr(blob_hex, {len(PPM_HDR_HEX)} + 1 + 2 * k, 2)) AS INTEGER)
           ELSE CAST(('0x' || substr(blob_hex, 1 + 2 * k, 2)) AS INTEGER)
         END AS v
  FROM u, UNNEST(range(0, n_units)) AS t(k)
),
b AS (
  SELECT doc_id, fmt, n_units, v,
         CASE WHEN fmt = 'audio/wav' THEN (v + 32768) // 16384 ELSE v // 64 END AS bin
  FROM vals
)
SELECT doc_id, fmt, CAST(n_units AS INTEGER) AS n_units,
       ROUND(AVG(v), 6) AS sig_mean,
       CAST(MIN(v) AS INTEGER) AS sig_min,
       CAST(MAX(v) AS INTEGER) AS sig_max,
       CAST(SUM(CASE WHEN bin = 0 THEN 1 ELSE 0 END) AS INTEGER) AS hist0,
       CAST(SUM(CASE WHEN bin = 1 THEN 1 ELSE 0 END) AS INTEGER) AS hist1,
       CAST(SUM(CASE WHEN bin = 2 THEN 1 ELSE 0 END) AS INTEGER) AS hist2,
       CAST(SUM(CASE WHEN bin = 3 THEN 1 ELSE 0 END) AS INTEGER) AS hist3
FROM b GROUP BY doc_id, fmt, n_units
"""
