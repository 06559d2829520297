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


class _FakeState:
    """Minimal GroupState stand-in for closure-level unit tests."""

    def __init__(self, value=None):
        self._value = value
        self.hasTimedOut = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, value):
        self._value = value

    def remove(self):
        self._value = None

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms

    def getCurrentWatermarkMs(self):
        return 0


def test_sessionizer_late_event_before_open_session_splits():
    """A late in-watermark event more than gap BEFORE the open session's
    start must become its own (earlier, closed) session — batch semantics —
    not be min()-swallowed into the open one."""
    import pandas as pd

    from postbound_spark.streaming.stateful import make_sessionizer

    gap_ms = 30 * 60 * 1000
    fn = make_sessionizer(gap_ms=gap_ms)
    t0 = pd.Timestamp("2024-01-01 12:00:00")
    state = _FakeState((int(t0.value // 1000), int(t0.value // 1000), 1))
    late = t0 - pd.Timedelta(hours=1)  # 1h before start, gap is 30 min
    out = list(fn((7,), iter([pd.DataFrame({"ts": [late]})]), state))
    assert len(out) == 1, "the late event must close as its own session"
    row = out[0].iloc[0]
    assert row["session_start"] == late and row["session_end"] == late
    assert row["n_events"] == 1
    # the open session is untouched in state
    assert state.get == (int(t0.value // 1000), int(t0.value // 1000), 1)


def test_sessionizer_timeout_never_fires_before_end_plus_gap():
    """The event-time timeout must CEIL the µs session end to ms — flooring
    lets the session flush up to 1 ms before end + gap provably elapsed."""
    import pandas as pd

    from postbound_spark.streaming.stateful import make_sessionizer

    gap_ms = 1000
    fn = make_sessionizer(gap_ms=gap_ms)
    state = _FakeState()
    ts = pd.Timestamp("2024-01-01 00:00:00") + pd.Timedelta(microseconds=500)
    list(fn((1,), iter([pd.DataFrame({"ts": [ts]})]), state))
    end_us = state.get[1]
    assert state.timeout_ms * 1000 >= end_us + gap_ms * 1000
