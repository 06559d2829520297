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
