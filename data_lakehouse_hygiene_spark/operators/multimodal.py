"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas UDFs over ``mapInPandas``.

``decode_media`` is a REAL dependency-free decoder for two container
formats — BMP (BITMAPINFOHEADER parse → width/height/bpp) and WAV (RIFF
chunk walk → sample rate/channels/sample count). Formats that need a
codec library (PNG/JPEG/MP4 …) raise ``NotImplementedError`` with the
missing dependency named; the Spark-side plumbing — binary schema, Arrow
batch shape, ``mapInPandas`` signature, partition behavior — is identical
for every format and is real and tested. ``synthesize_media`` builds
deterministic BMP/WAV payloads from the documents table so the
decode path round-trips against a SQL-expressible oracle.

Scale notes:
- ``mapInPandas`` streams Arrow record batches; per-batch Python overhead is
  amortized, payload bytes never materialize on the driver.
- Batch size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
  for multi-MB media payloads set it low (e.g. 64) so batches fit executor
  memory.
- Feature extraction is embarrassingly parallel (no shuffle); partition
  count should track input file splits.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("header_hex", StringType()),
        StructField("n_marker_bytes", LongType()),
    ]
)


def to_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text column as an opaque binary payload with typed metadata —
    the storage model for image/audio/video at rest (binary + metadata
    columns in Parquet, one row per asset)."""
    return df.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("bpp", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_channels", LongType()),
        StructField("n_samples", LongType()),
    ]
)


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal valid 24-bit uncompressed BMP (BITMAPINFOHEADER) with
    deterministic pixel bytes — used by ``synthesize_media`` and tests."""
    row = (3 * width + 3) // 4 * 4  # rows pad to 4-byte boundaries
    data = bytes((seed + i) % 256 for i in range(row * height))
    size = 54 + len(data)
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + data


def make_wav(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    """Minimal valid 8-bit mono PCM WAV with deterministic sample bytes."""
    data = bytes((seed + i) % 256 for i in range(n_samples))
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + sample_rate.to_bytes(4, "little")
        + sample_rate.to_bytes(4, "little")  # byte rate (1 ch × 8 bit)
        + (1).to_bytes(2, "little")  # block align
        + (8).to_bytes(2, "little")  # bits/sample
    )
    chunks = fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def decode_media(payload: bytes, media_type: str) -> dict:
    """Dependency-free media header decode.

    BMP: validates the ``BM`` magic and BITMAPINFOHEADER, returns
    width/height/bpp. WAV: validates ``RIFF``/``WAVE``, walks the chunk
    list to the ``fmt `` and ``data`` chunks, returns sample rate, channel
    count and per-channel sample count. Raises ``ValueError`` on corrupt
    payloads and ``NotImplementedError`` for formats that need a codec
    library (PNG/JPEG/MP4 …, not installed here).
    """
    p = bytes(payload)
    if p[:2] == b"BM":
        if len(p) < 54:
            raise ValueError("truncated BMP header")
        return {
            "width": int.from_bytes(p[18:22], "little", signed=True),
            "height": int.from_bytes(p[22:26], "little", signed=True),
            "bpp": int.from_bytes(p[28:30], "little"),
            "sample_rate": None,
            "n_channels": None,
            "n_samples": None,
        }
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        pos, rate, channels, bits, data_size = 12, None, None, None, None
        while pos + 8 <= len(p):
            cid = p[pos : pos + 4]
            clen = int.from_bytes(p[pos + 4 : pos + 8], "little")
            if cid == b"fmt ":
                channels = int.from_bytes(p[pos + 10 : pos + 12], "little")
                rate = int.from_bytes(p[pos + 12 : pos + 16], "little")
                bits = int.from_bytes(p[pos + 22 : pos + 24], "little")
            elif cid == b"data":
                data_size = clen
            pos += 8 + clen + (clen % 2)  # chunks are word-aligned
        if rate is None or data_size is None:
            raise ValueError("WAV missing fmt/data chunk")
        return {
            "width": None,
            "height": None,
            "bpp": None,
            "sample_rate": rate,
            "n_channels": channels,
            "n_samples": data_size // (channels * max(bits // 8, 1)),
        }
    raise NotImplementedError(
        f"decode of {media_type!r} requires a codec library (PIL/ffmpeg);"
        " only BMP and WAV decode natively"
    )


def extract_features(media: DataFrame, marker: bytes = b"a") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The "features" are deterministic byte-level stats (size, 8-byte header
    hex, marker-byte count) standing in for a real decoder's output; the
    batch iteration, schema contract, and zero-copy Arrow transfer are the
    production plumbing.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "header_hex": payloads.map(lambda b: bytes(b[:8]).hex()),
                    "n_marker_bytes": payloads.map(
                        lambda b: bytes(b).count(marker)
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def synthesize_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic media payloads from the documents table: even doc_ids
    become 24-bit BMPs (width 1+id%16, height 1+id%8), odd doc_ids become
    8-bit mono WAVs (rate 8000+4000·(id%4), one sample per text char).

    Runs in ``mapInPandas`` (payload bytes built executor-side, never on
    the driver); the parameters are pure functions of (doc_id, n_chars) so
    a SQL oracle can state the expected decode output without byte-level
    logic — what the round-trip test then verifies is the DECODER."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                i = int(doc_id)
                if i % 2 == 0:
                    payload = make_bmp(1 + i % 16, 1 + i % 8, seed=i)
                    mt = "image/bmp"
                else:
                    payload = make_wav(8000 + 4000 * (i % 4), len(text), seed=i)
                    mt = "audio/wav"
                rows.append((i, mt, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    return df.select("doc_id", text_col).mapInPandas(_synth, schema=MEDIA_SCHEMA)


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode over binary payloads: each batch row's
    container header is parsed by ``decode_media``; output is the typed
    per-modality feature struct (NULLs for the other modality's fields).
    Embarrassingly parallel — no shuffle, batches stream through Arrow."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(payload, mt)
                for payload, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)
