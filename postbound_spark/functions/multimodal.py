"""Multimodal (image/audio/video) column plumbing.

Media payloads are **opaque ``binary`` columns + typed metadata structs**;
decode / feature-extraction runs as Arrow-batched Pandas functions over
``mapInPandas``. That is the Spark-native shape for a 100 TB multimodal
corpus:

- parquet stores the bytes inline (or a URI column for externalized blobs);
  the scan prunes metadata-only queries down to the struct columns, never
  touching the payload pages (parquet column pruning works per-column, so
  ``WHERE meta.width > 512`` reads zero payload bytes);
- ``mapInPandas`` streams Arrow record batches into Python, so the decode
  path pays one (de)serialization per *batch*, not per row, and
  backpressure is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
- partitioning: payload rows are large, so repartition by size not count
  before any shuffle (``maxPartitionBytes`` governs the scan; a decode
  stage keeps partition boundaries — no shuffle at all).

The actual codec calls (PIL/libsndfile/ffmpeg) are NOT available in this
environment, so :func:`decode_image` raises ``NotImplementedError`` by
design; :func:`binary_features` is the deterministic byte-level extractor
used to prove the plumbing (schema, batching, Arrow round-trip) end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata schema carried next to every payload column (the reference
# engine has no media model at all — this is the extension surface).
MEDIA_META_SCHEMA = StructType(
    [
        StructField("modality", StringType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

BINARY_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", IntegerType()),
        StructField("first_byte", IntegerType()),
        StructField("checksum", LongType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to an HWC uint8 array.

    STUB: the image codec stack (PIL / opencv) is not installed in this
    environment. The Spark-side contract (binary in, array + metadata out
    through a Pandas UDF) is exercised by :func:`binary_features` instead.
    """
    raise NotImplementedError(
        "image decoding requires a codec library not present in this "
        "environment; wire PIL/cv2 here in production"
    )


def binary_features(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Deterministic byte-level feature extraction over a binary column.

    Stands in for decode/resize/frame-sample: identical dataflow (Arrow
    batches of binary payloads into pandas, fixed-schema records out),
    minus the codec call. Features: payload length, first byte, byte-sum
    checksum — all reproducible by the DuckDB oracle from the md5 hex.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": payloads.map(len).astype("int32"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype(
                        "int32"
                    ),
                    "checksum": payloads.map(lambda b: sum(b)).astype("int64"),
                }
            )

    return df.mapInPandas(extract, schema=BINARY_FEATURES_SCHEMA)
