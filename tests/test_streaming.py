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


def test_stream_stream_join_matches_batch(spark, sf_small):
    """Stream-stream join (watermarked, time-range-bounded) produces the
    same pairs as the equivalent batch self-join — the stream==batch
    oracle pattern applied to the binary stateful operator."""
    from pyspark.sql import functions as F

    from postbound_spark.catalog import load_table
    from postbound_spark.streaming.windows import (
        run_available_now,
        stream_events,
        stream_stream_join,
    )

    events = stream_events(spark, sf_small)
    joined = stream_stream_join(events, events, join_window="5 minutes")
    # stream-stream joins emit in append mode only; aggregate the drained
    # result batch-side
    drained = run_available_now(joined, output_mode="append")
    got = {
        (r["l_user"], r["count"])
        for r in drained.groupBy("l_user").count().collect()
    }

    batch = load_table(spark, sf_small, "events")
    l = batch.select(
        F.col("user_id").alias("l_user"), F.col("ts").alias("l_ts")
    )
    r = batch.select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts")
    )
    want = {
        (row["l_user"], row["count"])
        for row in (
            l.join(
                r,
                (F.col("l_user") == F.col("r_user"))
                & (F.col("r_ts") > F.col("l_ts"))
                & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 5 minutes")),
            )
            .groupBy("l_user")
            .count()
        ).collect()
    }
    assert got == want and len(got) > 0


def test_output_mode_detection_ignores_aggregate_like_aliases(spark, sf_small):
    """A non-aggregating streaming projection whose alias contains the word
    'Aggregate' must default to append mode, not crash in complete mode."""
    from pyspark.sql import functions as F

    from postbound_spark.streaming.windows import run_available_now, stream_events

    s = stream_events(spark, sf_small).select(
        F.col("value").alias("AggregateValue"), "ts"
    )
    got = run_available_now(s, "t_alias_mode")
    assert got.count() > 0  # append mode started and drained successfully
