"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas UDFs over ``mapInPandas``.

The decode step for real image/audio/video (PIL/ffmpeg/torchaudio) is NOT
available in this container, so it is stubbed behind
``decode_media`` (raises ``NotImplementedError``) and a deterministic fake
feature extractor used by the declared query. The Spark-side plumbing —
binary schema, Arrow batch shape, ``mapInPandas`` signature, partition
behavior — is real and tested.

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


def decode_media(payload: bytes, media_type: str) -> object:
    """Real media decode (image raster / audio samples / video frames).

    STUB: the decode libraries (PIL, ffmpeg, torchaudio) are not installed
    in this environment. The plumbing that would call this —
    ``extract_features`` below — uses a deterministic fake instead.
    """
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg/torchaudio; not available here"
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
