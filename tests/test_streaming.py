"""Structured Streaming == batch equivalence on the finite events fixture
(the streaming analog of the registry's DB-as-oracle pattern)."""

from __future__ import annotations

from postbound_spark.queries import load_all
from postbound_spark.streaming.windows import (
    run_available_now,
    stream_events,
    windowed_event_counts,
)


def test_streaming_window_agg_matches_batch(spark, sf_small):
    stream = stream_events(spark, sf_small)
    assert stream.isStreaming
    result = run_available_now(windowed_event_counts(stream), "t_stream_win")

    batch = load_all()["events_window_agg"].builder(spark, sf_small)
    key = ["window_start", "event_type", "n_events", "total_value"]
    got = sorted(tuple(r) for r in result.select(*key).collect())
    want = sorted(tuple(r) for r in batch.select(*key).collect())
    assert got == want and len(got) > 0
