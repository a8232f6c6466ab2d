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
* ``video/avi`` — a structurally valid uncompressed RIFF/AVI (the WAV
  trick one level up): ``RIFF('AVI ' LIST(hdrl avih strl(strh strf))
  LIST(movi 00db 00db))`` with two raw-RGB 4×2 DIB frames. Compressed
  video needs ffmpeg (absent here), but an uncompressed DIB AVI is
  codec-free: the decode is a genuine chunk walk — verify RIFF/AVI
  magic, find ``LIST movi``, iterate ``00db`` frame chunks, cross-check
  the ``avih`` header's frame geometry — all stdlib ``struct`` parsing.

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
import struct
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

# Uncompressed raw-RGB AVI: 2 frames of 4×2 BGR24 DIB (24 bytes each, 48
# payload bytes — same budget as the PPM plane). Every header byte is a
# compile-time constant, so both engines splice the identical container
# around the chain-derived frame bytes.
AVI_W, AVI_H, AVI_FRAMES = 4, 2, 2
AVI_FRAME_BYTES = AVI_W * AVI_H * 3
AVI_FPS = 25


def _build_avi_constants() -> tuple[str, str, int, int]:
    """Assemble the constant AVI scaffolding once.

    Returns (prefix_hex, mid_hex, frame0_hex_off, frame1_hex_off):
    ``blob = prefix ‖ frame0 ‖ mid ‖ frame1`` where prefix is everything
    through the first ``00db`` chunk header and mid is the second one.
    """
    fb = AVI_FRAME_BYTES
    le = lambda n: struct.pack("<I", n)  # noqa: E731
    avih = struct.pack(
        "<14I",
        1_000_000 // AVI_FPS,  # dwMicroSecPerFrame
        fb * AVI_FPS,          # dwMaxBytesPerSec
        0,                     # dwPaddingGranularity
        0x10,                  # dwFlags: AVIF_HASINDEX off, 0x10 = WASCAPTUREFILE-ish constant
        AVI_FRAMES,            # dwTotalFrames
        0,                     # dwInitialFrames
        1,                     # dwStreams
        fb,                    # dwSuggestedBufferSize
        AVI_W,
        AVI_H,
        0, 0, 0, 0,            # dwReserved
    )
    strh = (
        b"vids"                       # fccType
        + b"DIB "                     # fccHandler: uncompressed device-independent bitmap
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0,                  # flags, priority, language
            0,                        # initial frames
            1, AVI_FPS,               # scale / rate → fps
            0, AVI_FRAMES,            # start, length
            fb, 0xFFFFFFFF, 0,        # bufsize, quality(-1), samplesize
        )
        + struct.pack("<4h", 0, 0, AVI_W, AVI_H)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, AVI_W, AVI_H, 1, 24, 0, fb, 0, 0, 0, 0
    )  # BITMAPINFOHEADER, biCompression=0 (BI_RGB)
    strl = b"LIST" + le(4 + 8 + len(strh) + 8 + len(strf)) + b"strl"
    strl += b"strh" + le(len(strh)) + strh + b"strf" + le(len(strf)) + strf
    hdrl = b"LIST" + le(4 + 8 + len(avih) + len(strl)) + b"hdrl"
    hdrl += b"avih" + le(len(avih)) + avih + strl
    movi_hdr = b"LIST" + le(4 + AVI_FRAMES * (8 + fb)) + b"movi"
    total = 4 + len(hdrl) + len(movi_hdr) - 8 + AVI_FRAMES * (8 + fb) + 8
    riff = b"RIFF" + le(total) + b"AVI "
    prefix = riff + hdrl + movi_hdr + b"00db" + le(fb)
    mid = b"00db" + le(fb)
    p0 = len(prefix) * 2
    p1 = p0 + fb * 2 + len(mid) * 2
    return prefix.hex().upper(), mid.hex().upper(), p0, p1


AVI_PREFIX_HEX, AVI_MID_HEX, AVI_F0_HEXOFF, AVI_F1_HEXOFF = _build_avi_constants()
AVI_TOTAL_BYTES = (AVI_F1_HEXOFF + AVI_FRAME_BYTES * 2) // 2


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
        .otherwise("video/avi")
    )
    fhex = AVI_FRAME_BYTES * 2
    blob_hex = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(PPM_HDR_HEX), F.substring(chain, 1, PPM_DATA_BYTES * 2)),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit(WAV_HDR_HEX), F.substring(chain, 1, WAV_SAMPLES * 4)),
        )
        .otherwise(
            F.concat(
                F.lit(AVI_PREFIX_HEX),
                F.substring(chain, 1, fhex),
                F.lit(AVI_MID_HEX),
                F.substring(chain, fhex + 1, fhex),
            )
        )
    )
    width = (
        F.when(F.col("doc_id") % 3 == 0, PPM_W)
        .when(F.col("doc_id") % 3 == 2, AVI_W)
        .otherwise(0)
    )
    height = (
        F.when(F.col("doc_id") % 3 == 0, PPM_H)
        .when(F.col("doc_id") % 3 == 2, AVI_H)
        .otherwise(0)
    )
    return docs.select(
        "doc_id",
        fmt.alias("fmt"),
        blob_hex.alias("blob_hex"),
        (F.length(blob_hex) / 2).cast("long").alias("n_bytes"),
        width.cast("int").alias("width"),
        height.cast("int").alias("height"),
    )


_AVI_BLOB_SQL = (
    f"'{AVI_PREFIX_HEX}' || substr(chain, 1, {AVI_FRAME_BYTES * 2}) || "
    f"'{AVI_MID_HEX}' || substr(chain, {AVI_FRAME_BYTES * 2} + 1, {AVI_FRAME_BYTES * 2})"
)

MM_ASSETS_SQL = f"""
WITH d AS (SELECT doc_id, {_chain_hex_sql()} AS chain FROM documents)
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image/ppm' WHEN 1 THEN 'audio/wav'
            ELSE 'video/avi' END AS fmt,
       CASE doc_id % 3
            WHEN 0 THEN '{PPM_HDR_HEX}' || substr(chain, 1, {PPM_DATA_BYTES * 2})
            WHEN 1 THEN '{WAV_HDR_HEX}' || substr(chain, 1, {WAV_SAMPLES * 4})
            ELSE {_AVI_BLOB_SQL} END AS blob_hex,
       CAST(length(CASE doc_id % 3
            WHEN 0 THEN '{PPM_HDR_HEX}' || substr(chain, 1, {PPM_DATA_BYTES * 2})
            WHEN 1 THEN '{WAV_HDR_HEX}' || substr(chain, 1, {WAV_SAMPLES * 4})
            ELSE {_AVI_BLOB_SQL} END) / 2 AS BIGINT) AS n_bytes,
       CAST(CASE doc_id % 3 WHEN 0 THEN {PPM_W} WHEN 2 THEN {AVI_W} ELSE 0 END
            AS INTEGER) AS width,
       CAST(CASE doc_id % 3 WHEN 0 THEN {PPM_H} WHEN 2 THEN {AVI_H} ELSE 0 END
            AS INTEGER) AS height
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


def _decode_avi_frames(blob: bytes) -> np.ndarray:
    """Walk a RIFF/AVI container and return the concatenated raw-RGB
    frame bytes from the ``movi`` list's ``00db`` chunks.

    This is a genuine container parse (magic check, chunk-size walk with
    RIFF's odd-size padding rule, ``avih`` geometry cross-check), the
    same structure ffmpeg's RIFF demuxer walks — only the codec layer is
    trivial because the frames are uncompressed DIB."""
    assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI ", "not an AVI"
    frames: list[bytes] = []
    n_frames = w = h = None
    pos = 12
    while pos + 8 <= len(blob):
        fourcc = blob[pos : pos + 4]
        size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        body = blob[pos + 8 : pos + 8 + size]
        if fourcc == b"LIST" and body[:4] == b"hdrl":
            # avih is the first subchunk of hdrl
            assert body[4:8] == b"avih"
            avih = struct.unpack("<14I", body[12 : 12 + 56])
            n_frames, w, h = avih[4], avih[8], avih[9]
        elif fourcc == b"LIST" and body[:4] == b"movi":
            q = 4
            while q + 8 <= size:
                cc = body[q : q + 4]
                fsz = struct.unpack("<I", body[q + 4 : q + 8])[0]
                if cc == b"00db":  # uncompressed DIB frame, stream 00
                    frames.append(body[q + 8 : q + 8 + fsz])
                q += 8 + fsz + (fsz & 1)  # RIFF pads odd chunks
        pos += 8 + size + (size & 1)
    assert n_frames == len(frames) and all(len(f) == w * h * 3 for f in frames)
    return np.frombuffer(b"".join(frames), dtype=np.uint8)


def decode_blob_features(fmt: str, blob: bytes) -> dict:
    """Per-asset decode → signal statistics.

    All three modalities are *real* parses of valid codec-free
    containers: P6 header parse, stdlib ``wave`` read, RIFF/AVI chunk
    walk (``_decode_avi_frames``)."""
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
        vals = _decode_avi_frames(blob).astype(np.int64)
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
# planes at the PPM data offset and inside the AVI's two 00db movi
# chunks, little-endian *signed* 16-bit samples at the WAV data offset —
# and aggregate the identical statistics.
MM_DECODE_SQL = f"""
WITH a AS ({MM_ASSETS_SQL}),
u AS (
  SELECT doc_id, fmt, blob_hex,
         CASE fmt WHEN 'audio/wav' THEN {WAV_SAMPLES}
                  WHEN 'image/ppm' THEN {PPM_DATA_BYTES}
                  ELSE {AVI_FRAMES * AVI_FRAME_BYTES} END AS n_units
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
           ELSE CAST(('0x' || substr(blob_hex,
                  CASE WHEN k < {AVI_FRAME_BYTES}
                       THEN {AVI_F0_HEXOFF} + 1 + 2 * k
                       ELSE {AVI_F1_HEXOFF} + 1 + 2 * (k - {AVI_FRAME_BYTES}) END,
                  2)) AS INTEGER)
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
