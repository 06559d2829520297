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

        start_us, end_us, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, int, int]] = []
        # sort across ALL Arrow chunks — per-chunk order is not global
        # order for groups larger than maxRecordsPerBatch, and a regressed
        # end_us would corrupt the session boundary and its timeout
        all_ts = sorted(
            int(pd.Timestamp(ts).value // 1000) for pdf in pdfs for ts in pdf["ts"]
        )
        for ts_us in all_ts:
            if start_us is None:
                start_us, end_us, n = ts_us, ts_us, 1
            elif ts_us - end_us > gap_ms * 1000:
                closed.append((start_us, end_us, n))
                start_us, end_us, n = ts_us, ts_us, 1
            else:
                # min/max accumulation: a late in-watermark event inside
                # the gap extends the session, never rewinds it
                start_us = min(start_us, ts_us)
                end_us = max(end_us, ts_us)
                n += 1
        if start_us is not None:
            state.update((start_us, end_us, n))
            # flush once no in-watermark event can extend the session;
            # must stay strictly above the current watermark or Spark
            # rejects the call (possible when late data sneaks in just
            # under the allowed lateness)
            timeout_ms = end_us // 1000 + gap_ms
            state.setTimeoutTimestamp(
                max(timeout_ms, state.getCurrentWatermarkMs() + 1)
            )
        for s, e, c in closed:
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
