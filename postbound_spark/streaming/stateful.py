"""Custom stateful streaming operators via ``applyInPandasWithState``.

The escape hatch for streaming semantics Spark's built-in windowed
aggregations can't express (SURVEY.md §2.8 marks streaming as the engine's
extension surface; the brief's operator taxonomy puts custom stateful ops
here). The pattern demonstrated: **gap-based sessionization** — the same
semantics as the batch ``events_sessionize`` registry query, but computed
incrementally with per-key state and watermark-driven session emission.

Mechanics that matter at scale:
- state is partitioned by the grouping key (one shuffle), held in the
  state store, and bounded by the event-time timeout — no unbounded
  growth;
- each micro-batch hands the operator Arrow-batched pandas frames per key,
  so the Python crossing is per-batch-per-key, not per-row;
- sessions close on the **event-time** gap (``gap_ms`` between
  consecutive events of a key); the open session flushes when the
  watermark passes ``session_end + gap_ms`` — i.e. the gap provably
  can't be beaten by any in-watermark event, so emission is
  deterministic, replay-stable, and independent of wall-clock.

Why ``EventTimeTimeout`` and not ``ProcessingTimeTimeout``: besides
non-determinism, Spark's ``FlatMapGroupsWithStateExec.
shouldRunAnotherBatch`` always answers *true* under processing-time
timeouts, so a ``Trigger.AvailableNow`` drain schedules state-cleanup
micro-batches forever (observed empirically: 130+ empty batches and
counting on a drained source). Under event-time timeouts another batch
runs only while the watermark advances — a finite backlog therefore
terminates after one cleanup batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

GAP_MS = 30 * 60 * 1000  # 30-minute session gap, matching events_sessionize


def make_sessionizer(
    gap_ms: int = GAP_MS,
) -> Callable[[Any, Iterator[pd.DataFrame], GroupState], Iterator[pd.DataFrame]]:
    """Build the per-user session accumulator.

    Batch events extend the open session (or close it and open a new one
    when the event-time gap exceeds ``gap_ms``); the event-time timeout
    flushes the open session once the watermark passes its end + gap.
    """

    def sessionize(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield _session_row(user_id, start_us, end_us, n)
            return

        # Fold the open-state session and the batch events in GLOBAL time
        # order via interval clustering: events are point intervals, the
        # state session an [start, end] interval; consecutive intervals
        # merge when the start-to-previous-end gap is within gap_ms. This
        # matches batch sessionization for late in-watermark events that
        # precede the open session — a point more than gap before
        # session_start forms its own (earlier, already-closed) session
        # instead of being min()-swallowed into the open one. Sorting
        # spans ALL Arrow chunks — per-chunk order is not global order for
        # groups larger than maxRecordsPerBatch.
        intervals = [
            (int(pd.Timestamp(ts).value // 1000),) * 2 + (1,)
            for pdf in pdfs
            for ts in pdf["ts"]
        ]
        if state.exists:
            s0, e0, n0 = state.get
            intervals.append((s0, e0, n0))
        intervals.sort()
        merged: list[tuple[int, int, int]] = []
        for s, e, c in intervals:
            if merged and s - merged[-1][1] <= gap_ms * 1000:
                ps, pe, pc = merged[-1]
                merged[-1] = (ps, max(pe, e), pc + c)
            else:
                merged.append((s, e, c))
        if merged:
            start_us, end_us, n = merged[-1]  # newest stays open in state
            state.update((start_us, end_us, n))
            # flush once no in-watermark event can extend the session;
            # ceil the µs end to ms so the timeout can never fire BEFORE
            # end + gap has provably elapsed, and stay strictly above the
            # current watermark or Spark rejects the call (possible when
            # late data sneaks in just under the allowed lateness)
            timeout_ms = -(-end_us // 1000) + gap_ms
            state.setTimeoutTimestamp(
                max(timeout_ms, state.getCurrentWatermarkMs() + 1)
            )
        for s, e, c in merged[:-1]:
            yield _session_row(user_id, s, e, c)

    return sessionize


def _session_row(user_id: int, start_us: int, end_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us * 1000)],
            "session_end": [pd.Timestamp(end_us * 1000)],
            "n_events": [n],
        }
    )


def sessionize_stream(
    events: DataFrame, gap_ms: int = GAP_MS, watermark: str = "10 minutes"
) -> DataFrame:
    """events stream -> closed-session stream (update output mode).

    ``watermark`` is the allowed event-time lateness: larger values
    tolerate more out-of-order data but delay session emission (a session
    flushes when the watermark — max observed ``ts`` minus this delay —
    passes its end + gap). Sessions still open when the stream ends stay
    in the state store; they flush on the next watermark advance.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
