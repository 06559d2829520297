"""applyInPandasWithState sessionization == batch sessionization on the
finite fixture.

Event-time-timeout semantics make the expectation exact: a session closed
by a later same-user event always emits; a user's final open session
emits iff the final watermark (global max ``ts``, with a 0-second delay)
strictly passed its ``end + gap``. Everything else stays in state — which
is correct streaming behavior, not data loss."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postbound_spark.catalog import load_table
from postbound_spark.streaming.stateful import GAP_MS, sessionize_stream
from postbound_spark.streaming.windows import run_available_now, stream_events


def _batch_sessions(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        F.lag("ts").over(w).isNull() | (gap_us > GAP_MS * 1000), 1
    ).otherwise(0)
    sess_id = F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        ev.select("user_id", "ts", sess_id.alias("sid"))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )


def test_stateful_sessionize_matches_batch(spark, sf_small):
    stream = stream_events(spark, sf_small).select("user_id", "ts")
    result = sessionize_stream(stream, watermark="0 seconds")
    # no explicit output_mode: the plan-shape default must detect
    # FlatMapGroupsWithState and pick "update" (the sessionizer declares it)
    got_df = run_available_now(result, "t_sessions")
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in got_df.collect()
    )

    batch = _batch_sessions(spark, sf_small)
    max_ts_ms = batch.agg(
        (F.max(F.unix_micros("session_end")) / 1000).cast("long")
    ).collect()[0][0]
    last = batch.groupBy("user_id").agg(F.max("session_start").alias("last_start"))
    emitted = batch.join(last, "user_id").filter(
        # closed by a later event, or final-open but past the watermark
        (F.col("session_start") != F.col("last_start"))
        | ((F.unix_micros("session_end") / 1000).cast("long") + GAP_MS < max_ts_ms)
    )
    want = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in emitted.collect()
    )
    assert len(got) > 0
    assert got == want
