"""Multimodal plumbing: schema, Arrow batch shapes, real PNG decode."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from postbound_spark.functions import multimodal as MM


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _filter_row(ftype, row, prev, channels):
    """Forward PNG filter — an independent implementation of the spec's
    encode side, so the round trip genuinely cross-checks the decoder."""
    out = []
    for i, v in enumerate(row):
        left = row[i - channels] if i >= channels else 0
        up = prev[i]
        diag = prev[i - channels] if i >= channels else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) // 2
        else:
            pred = MM._paeth(left, up, diag)
        out.append((v - pred) & 0xFF)
    return out


def _encode_png(pixels: np.ndarray, color_type: int, filters=None) -> bytes:
    height, width, channels = pixels.shape
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = [0] * (width * channels)
    for y in range(height):
        row = [int(v) for v in pixels[y].reshape(-1)]
        ftype = filters[y % len(filters)] if filters else 0
        raw.append(ftype)
        raw.extend(_filter_row(ftype, row, prev, channels))
        prev = row
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.fixture
def no_pillow(monkeypatch):
    """Force decode_image onto the stdlib path regardless of whether the
    host happens to have Pillow — these tests pin the stdlib decoder's
    behavior, which would otherwise silently lose its only coverage on a
    codec-equipped machine."""
    import sys

    monkeypatch.setitem(sys.modules, "PIL", None)


def test_decode_image_rejects_non_png_without_codec(no_pillow):
    # without Pillow only PNG payloads decode; anything else fails loudly
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_decode_png_rgb_all_filter_types(no_pillow):
    rng = np.random.RandomState(7)
    pixels = rng.randint(0, 256, size=(5, 4, 3)).astype(np.uint8)
    # one row per PNG filter type (None/Sub/Up/Average/Paeth)
    payload = _encode_png(pixels, color_type=2, filters=[0, 1, 2, 3, 4])
    decoded = MM.decode_image(payload)
    assert decoded.shape == (5, 4, 3) and decoded.dtype == np.uint8
    assert np.array_equal(decoded, pixels)


def test_decode_png_gray_and_rgba(no_pillow):
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    out = MM.decode_image(_encode_png(gray, color_type=0))
    assert out.shape == (3, 4, 3)
    assert np.array_equal(out, np.repeat(gray, 3, axis=2))

    rgba = np.arange(48, dtype=np.uint8).reshape(3, 4, 4)
    out = MM.decode_image(_encode_png(rgba, color_type=6, filters=[4]))
    assert np.array_equal(out, rgba[:, :, :3])


def test_decode_png_inside_pandas_batch(spark):
    """The production shape: binary payloads through mapInPandas, decoded
    per Arrow batch, fixed-schema stats out."""
    import pandas as pd

    imgs = {
        1: np.full((2, 3, 3), 9, dtype=np.uint8),
        2: np.full((4, 2, 3), 250, dtype=np.uint8),
    }
    rows = [(k, bytearray(_encode_png(v, color_type=2, filters=[1, 2]))) for k, v in imgs.items()]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    def stats(batches):
        for pdf in batches:
            decoded = [MM.decode_image(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "height": [d.shape[0] for d in decoded],
                    "width": [d.shape[1] for d in decoded],
                    "px_sum": [int(d.sum()) for d in decoded],
                }
            )

    got = {
        r.doc_id: r
        for r in df.mapInPandas(
            stats, "doc_id long, height int, width int, px_sum long"
        ).collect()
    }
    for k, v in imgs.items():
        assert (got[k].height, got[k].width) == v.shape[:2]
        assert got[k].px_sum == int(v.sum())


def test_media_meta_schema_fields():
    assert [f.name for f in MM.MEDIA_META_SCHEMA.fields] == [
        "modality", "mime", "width", "height", "duration_ms",
    ]


def test_binary_features_roundtrip(spark):
    rows = [(1, b"\x01\x02\x03"), (2, b""), (3, bytes(range(256)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in MM.binary_features(df).collect()}
    assert out[1].byte_len == 3 and out[1].first_byte == 1 and out[1].checksum == 6
    assert out[2].byte_len == 0 and out[2].first_byte == -1 and out[2].checksum == 0
    assert out[3].byte_len == 256 and out[3].checksum == sum(range(256))


def test_binary_features_preserves_partitioning(spark):
    df = (
        spark.range(100)
        .select(F.col("id").alias("doc_id"), F.unhex(F.md5(F.col("id").cast("string"))).alias("payload"))
        .repartition(4)
    )
    out = MM.binary_features(df)
    # mapInPandas is map-only: partition count is preserved, no shuffle
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == 100


def test_resize_images_shapes(spark, sf_small):
    """Resize stage: fixed-size output payloads, map-only plan (no
    exchange), schema as declared."""
    from pyspark.sql import functions as F

    from postbound_spark.catalog import load_table
    from postbound_spark.functions.multimodal import resize_images

    docs = load_table(spark, sf_small, "documents").filter(F.col("doc_id") < 50)
    payloads = docs.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    out = resize_images(payloads, width=8, height=4)
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(r.payload) == 32 for r in rows)
    assert all(r.out_width == 8 and r.out_height == 4 for r in rows)
    # map-only: no shuffle exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_sample_frames_expansion(spark, sf_small):
    """Frame sampling is a deterministic 1→N expansion: row count equals
    Σ ceil(duration/interval), indexes are dense per doc."""
    from pyspark.sql import functions as F

    from postbound_spark.catalog import load_table
    from postbound_spark.functions.multimodal import sample_frames

    docs = load_table(spark, sf_small, "documents").limit(20)
    videos = docs.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        F.greatest(F.col("n_chars"), F.lit(1)).cast("long").alias("duration_ms"),
    )
    out = sample_frames(videos, interval_ms=100).collect()
    import math

    expected = sum(
        max(1, math.ceil(r.duration_ms / 100)) for r in videos.collect()
    )
    assert len(out) == expected
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for idxs in by_doc.values():
        assert sorted(idxs) == list(range(len(idxs)))


class TestPngEncodeDecodeRoundtrip:
    """Round-7: the stdlib PNG encoder (encode_png) paired with the
    stdlib decoder must be a pixel-exact identity — the property the
    mm_video_decode oracle pins cross-engine."""

    def test_roundtrip_pixel_exact(self):
        import numpy as np

        from postbound_spark.functions.multimodal import (
            _decode_png_stdlib,
            encode_png,
        )

        rng = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
        assert np.array_equal(_decode_png_stdlib(encode_png(rng)), rng)
        # non-square + extreme values
        arr = np.full((3, 5, 3), 255, dtype=np.uint8)
        arr[0, 0] = [0, 1, 2]
        assert np.array_equal(_decode_png_stdlib(encode_png(arr)), arr)

    def test_encoder_rejects_non_rgb(self):
        import numpy as np
        import pytest as _pytest

        from postbound_spark.functions.multimodal import encode_png

        with _pytest.raises(ValueError, match="HWC RGB"):
            encode_png(np.zeros((4, 4), dtype=np.uint8))

    def test_decode_video_frames_stride_and_digests(self, spark):
        import struct

        import numpy as np

        from postbound_spark.functions.multimodal import (
            decode_video_frames,
            encode_png,
        )

        frames = [
            np.full((2, 2, 3), v, dtype=np.uint8) for v in (10, 20, 30)
        ]
        container = b"".join(
            struct.pack(">I", len(p)) + p
            for p in (encode_png(f) for f in frames)
        )
        df = spark.createDataFrame(
            [(1, bytearray(container))], "doc_id long, payload binary"
        )
        rows = {
            r.frame_idx: r
            for r in decode_video_frames(df, stride=2).collect()
        }
        assert set(rows) == {0, 2}  # stride drops frame 1
        assert rows[0].pixel_sum == 10 * 12 and rows[2].pixel_sum == 30 * 12
        assert rows[0].pixel_count == 12
        assert rows[0].width == 2 and rows[0].height == 2
