"""Multimodal plumbing: schema, Arrow batch shapes, stubbed decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postbound_spark.functions import multimodal as MM


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG")


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
