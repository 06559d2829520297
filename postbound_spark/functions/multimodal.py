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
    BinaryType,
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

    Import-gated: uses Pillow when the codec stack is installed (it is
    not, in this environment — the call then raises with a clear message).
    The Spark-side contract (binary in, array + metadata out through a
    Pandas UDF) is exercised by :func:`binary_features` either way.
    """
    try:
        import io

        import numpy as np
        from PIL import Image  # noqa: PLC0415 — deliberate runtime gate
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires a codec library (Pillow) not present "
            "in this environment; install PIL/cv2 in production"
        ) from exc
    with Image.open(io.BytesIO(payload)) as img:
        return np.asarray(img.convert("RGB"), dtype="uint8")


def binary_features(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Deterministic byte-level feature extraction over a binary column.

    Stands in for decode/resize/frame-sample: identical dataflow (Arrow
    batches of binary payloads into pandas, fixed-schema records out),
    minus the codec call. Features: payload length, first byte, byte-sum
    checksum — all reproducible by the DuckDB oracle from the md5 hex.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads arrive as None in the Arrow batch — treat as
            # empty bytes (same null contract as resize/frame-sample)
            payloads = pdf[payload_col].map(lambda b: b if b is not None else b"")
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


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize stage over an image-payload column.

    The codec call is STUBBED (no PIL/cv2 in this environment): the
    "resized" payload is a deterministic byte-fold of the input onto
    ``width * height`` bytes (``out[i] = in[i % len]``, truncated/cycled),
    so schema, batch shape, memory profile, and Arrow round-trip are all
    real — swap the fold for ``PIL.Image.resize`` in production.

    Dataflow notes for 100 TB: map-only (``mapInPandas`` preserves
    partitioning — no shuffle); output payloads are fixed-size, so
    downstream stages can size partitions exactly
    (rows_per_partition = maxPartitionBytes / (width*height))."""
    target = width * height

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]

            def fold(b: bytes) -> bytes:
                if not b:
                    return bytes(target)
                reps = (target // len(b)) + 1
                return (b * reps)[:target]

            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "out_width": width,
                    "out_height": height,
                    "payload": payloads.map(fold),
                }
            )

    return df.mapInPandas(do_resize, schema=RESIZED_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", LongType()),
        StructField("frame_checksum", LongType()),
    ]
)


def sample_frames(
    df: DataFrame,
    interval_ms: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Frame-sampling stage over a video-payload column: one output row per
    sampled timestamp (t = 0, interval, 2·interval, … < duration) — the
    1→N row expansion every video pipeline needs.

    The decoder is STUBBED: the per-frame "content" checksum is
    ``first_7_bytes_of_payload_as_int + frame_idx`` — deterministic and
    reproducible in SQL, so the whole expansion sits under the DuckDB
    oracle. In production the body calls ffmpeg/pyav per batch.

    Scale notes: expansion happens inside ``mapInPandas`` (map-only, no
    shuffle); output row count = Σ ceil(duration/interval) is known from
    metadata alone, so downstream repartitioning can be planned without
    touching payload bytes."""

    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, sums = [], [], [], []
            for doc_id, payload, duration in zip(
                pdf[id_col], pdf[payload_col], pdf[duration_col]
            ):
                base = int.from_bytes(payload[:7], "big") if payload else 0
                # a NULL duration arrives as NaN (pandas nullable-int
                # promotion); sample a single frame like a zero duration
                duration = 0 if pd.isna(duration) else int(duration)
                n_frames = max(1, -(-duration // interval_ms))
                for i in range(n_frames):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    tss.append(i * interval_ms)
                    sums.append((base % 1_000_000_007) + i)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame_checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(do_sample, schema=FRAME_SAMPLE_SCHEMA)
