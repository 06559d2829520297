"""Streaming exact dedup (dropDuplicatesWithinWatermark) == batch distinct
on the finite fixture: same surviving key set, one row per key. Which
physical row survives per key is order-dependent (first-seen wins), so the
equivalence is on keys, not full rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from postbound_spark.catalog import load_table
from postbound_spark.streaming.windows import dedup_stream, run_available_now, stream_events


def test_stream_dedup_matches_batch_distinct(spark, sf_small):
    stream = stream_events(spark, sf_small).select("user_id", "event_type", "ts")
    result = dedup_stream(stream, ["user_id", "event_type"])
    got = run_available_now(result, "t_dedup", output_mode="append")

    batch = (
        load_table(spark, sf_small, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    want_keys = {(r.user_id, r.event_type) for r in batch.collect()}
    got_rows = [(r.user_id, r.event_type) for r in got.collect()]
    assert len(got_rows) == len(want_keys)  # exactly one survivor per key
    assert set(got_rows) == want_keys
    assert len(want_keys) > 0
