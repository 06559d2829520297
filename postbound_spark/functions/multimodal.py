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

The general codec stack (PIL/libsndfile/ffmpeg) is NOT available in this
environment; :func:`decode_image` uses Pillow when installed and otherwise
falls back to a pure-stdlib PNG decoder (zlib inflate + scanline
unfiltering per the public PNG spec), so the decode path is genuinely
exercisable here. Non-PNG formats without Pillow raise
``NotImplementedError`` with a clear message. :func:`binary_features` is
the deterministic byte-level extractor used to prove the plumbing
(schema, batching, Arrow round-trip) end to end.
"""

from __future__ import annotations

import struct
import zlib
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
    """Decode an image payload to an HWC uint8 RGB array.

    Uses Pillow when the codec stack is installed; without it, PNG
    payloads decode through :func:`_decode_png_stdlib` (zlib + scanline
    unfiltering — no third-party codec), and other formats raise
    ``NotImplementedError`` with a clear message. The Spark-side contract
    (binary in, array + metadata out through a Pandas UDF) is exercised
    by :func:`binary_features` either way.
    """
    try:
        import io

        import numpy as np
        from PIL import Image  # noqa: PLC0415 — deliberate runtime gate
    except ImportError:
        return _decode_png_stdlib(payload)
    with Image.open(io.BytesIO(payload)) as img:
        return np.asarray(img.convert("RGB"), dtype="uint8")


_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (PNG spec §4.1.1)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png_stdlib(payload: bytes) -> "object":
    """Minimal PNG decoder (public spec: 8-bit depth, color types
    gray/RGB/gray+alpha/RGBA, no interlace) → HWC uint8 RGB array.

    Python-loop unfiltering is fine at test/fixture scale; production
    clusters install Pillow and take the vectorized path above. Kept
    dependency-free on purpose so the decode stage has a green test in
    codec-less environments."""
    import numpy as np

    if not payload.startswith(_PNG_SIGNATURE):
        raise NotImplementedError(
            "only PNG decodes without a codec library — install Pillow "
            "for JPEG/WebP/... in production"
        )
    width = height = None
    bit_depth = color_type = interlace = 0
    idat = bytearray()
    pos = len(_PNG_SIGNATURE)
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("malformed PNG: missing IHDR chunk")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace:
        raise NotImplementedError(
            f"stdlib PNG fallback supports 8-bit non-interlaced images "
            f"(got depth={bit_depth}, color_type={color_type}, "
            f"interlace={interlace}) — install Pillow for the rest"
        )
    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("malformed PNG: scanline payload size mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = [0] * stride
    for y in range(height):
        offset = y * (stride + 1)
        ftype = raw[offset]
        row = list(raw[offset + 1 : offset + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                row[i] = (row[i] + row[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            row = [(v + p) & 0xFF for v, p in zip(row, prev)]
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                diag = prev[i - channels] if i >= channels else 0
                row[i] = (row[i] + _paeth(left, prev[i], diag)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"malformed PNG: unknown filter type {ftype}")
        out[y] = row
        prev = row
    img = out.reshape(height, width, channels)
    if color_type == 0:  # gray -> RGB
        return np.repeat(img, 3, axis=2)
    if color_type == 4:  # gray+alpha -> drop alpha, replicate gray
        return np.repeat(img[:, :, :1], 3, axis=2)
    if color_type == 6:  # RGBA -> drop alpha (Pillow convert("RGB") parity)
        return np.ascontiguousarray(img[:, :, :3])
    return img


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


def encode_png(array) -> bytes:
    """Minimal stdlib PNG encoder (8-bit RGB, filter 0 rows, one IDAT)
    — the write half of :func:`_decode_png_stdlib`, used to build
    genuine video-frame containers in codec-less environments. The
    encode→decode round trip is pixel-exact (``tests/test_multimodal``)
    and the ``mm_video_decode`` oracle pins it cross-engine."""
    import numpy as np

    arr = np.asarray(array, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_png expects an HWC RGB uint8 array")
    height, width, _ = arr.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(height))
    return (
        _PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


FRAME_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixel_sum", LongType()),
        StructField("pixel_count", LongType()),
        StructField("first_pixel", IntegerType()),
        StructField("last_pixel", IntegerType()),
    ]
)


def decode_video_frames(
    df: DataFrame,
    *,
    stride: int = 1,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """GENUINE frame decode over a video-container column: each payload
    is a concatenation of ``[4-byte BE length][PNG bytes]`` frames; the
    stage splits the container, decodes every ``stride``-th frame with
    the spec-compliant stdlib PNG decoder (zlib inflate + scanline
    unfiltering), and emits per-frame digests of the DECODED pixels
    (sum / count / first / last) — numbers that only come out right if
    the decode is bit-correct end to end.

    Scale shape: map-only inside ``mapInPandas`` (Arrow batches in,
    fixed-schema records out, no shuffle); stride-sampling drops whole
    frames before any pixel work. Production swaps the per-frame PNG
    decode for an ffmpeg/pyav batch call with the identical dataflow."""

    def do_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame_idx", "width", "height",
                                   "pixel_sum", "pixel_count",
                                   "first_pixel", "last_pixel")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = payload if payload is not None else b""
                pos, idx = 0, 0
                while pos + 4 <= len(payload):
                    (length,) = struct.unpack(">I", payload[pos : pos + 4])
                    png = payload[pos + 4 : pos + 4 + length]
                    pos += 4 + length
                    if idx % stride == 0:
                        img = _decode_png_stdlib(png)
                        flat = img.reshape(-1)
                        out["doc_id"].append(int(doc_id))
                        out["frame_idx"].append(idx)
                        out["width"].append(int(img.shape[1]))
                        out["height"].append(int(img.shape[0]))
                        out["pixel_sum"].append(int(flat.sum(dtype="int64")))
                        out["pixel_count"].append(int(flat.size))
                        out["first_pixel"].append(int(flat[0]))
                        out["last_pixel"].append(int(flat[-1]))
                    idx += 1
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "pixel_sum": pd.Series(out["pixel_sum"], dtype="int64"),
                    "pixel_count": pd.Series(out["pixel_count"], dtype="int64"),
                    "first_pixel": pd.Series(out["first_pixel"], dtype="int32"),
                    "last_pixel": pd.Series(out["last_pixel"], dtype="int32"),
                }
            )

    return df.mapInPandas(do_decode, schema=FRAME_DECODE_SCHEMA)
