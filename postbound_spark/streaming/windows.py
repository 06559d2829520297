"""Structured Streaming surface: windowed aggregation with watermarks.

The reference has **no** streaming capability (SURVEY.md §2.8 — batch,
read-only SELECT world), so this module is the engine's forward-looking
extension: the same windowed aggregations the batch registry oracle-checks
(``events_window_agg``), expressed as an incremental streaming plan.

Semantics guarantees that matter at scale:

- **watermark** bounds state: groups older than ``watermark`` behind the
  max observed event time are finalized and evicted — without it, a
  windowed agg on an unbounded stream accumulates state forever;
- **exactly-once** comes from the checkpoint + idempotent sink contract
  (file sources record offsets per micro-batch);
- ``Trigger.AvailableNow`` drains the backlog with streaming semantics —
  letting the test suite verify stream == batch on a finite fixture, the
  same oracle pattern the batch registry uses.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet.

    The file source needs an explicit schema (no inference mid-stream) and
    a directory; ``pathGlobFilter`` narrows it to the events file. The
    ``ts`` column arrives as int64 (TIMESTAMP(NANOS) fixtures, via
    nanosAsLong) or timestamp_ntz (newer fixtures) and is normalized to a
    proper event-time column by the same helper the batch catalog uses
    (:func:`postbound_spark.catalog.normalize_event_ts`).
    """
    from postbound_spark.catalog import normalize_event_ts

    # session-global ON PURPOSE and never restored: the batch catalog
    # (catalog.load_table) sets the same flag, cached DataFrames resolve
    # lazily against it, and without it Spark REJECTS TIMESTAMP(NANOS)
    # parquet outright — so the only observable effect is making the
    # events fixtures readable (normalize_event_ts handles the int64 form)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    stream = (
        spark.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(stream)


def windowed_event_counts(
    events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling-window count/sum per event type with late-data handling.

    Identical logical shape to the batch ``events_window_agg`` registry
    query — Structured Streaming runs it incrementally with partial
    aggregates per micro-batch and state eviction past the watermark.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias(
                "total_value"
            ),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def windowed_type_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Hourly event counts per type with late-data handling — the
    streaming half of the volume-anomaly detector.

    The split matters: counts are the ASSOCIATIVE state (windowed
    partial aggregates merge by sum across micro-batches, watermark
    evicts finalized windows), while the z-score readout is a derived
    view over the drained counts computed by the SAME helper the batch
    registry query uses
    (:func:`postbound_spark.queries.pipeline.anomaly_zscores_over_counts`
    — shared code, so formula and threshold cannot drift). The per-type
    normalization is deliberately NOT part of the stream: it is a second
    stateful aggregation Structured Streaming cannot chain behind a
    windowed agg in this mode, and statistically it must see every
    window anyway — re-scoring history as the distribution shifts is the
    correct semantics for a population z-score."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "event_type",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
        )
    )


def run_available_now(
    result: DataFrame, query_name: str | None = None, output_mode: str | None = None
) -> DataFrame:
    """Drain the stream with ``Trigger.AvailableNow`` into a memory sink and
    return the materialized result as a batch DataFrame.

    ``output_mode`` defaults per plan shape: ``complete`` for aggregating
    streams (re-emits every window once the backlog drains), ``update``
    for ``flatMapGroupsWithState`` plans (the sessionizer declares
    Update output mode, and Spark rejects a mismatch at start), ``append``
    otherwise — Spark rejects complete mode on append-only plans like
    ``dedup_stream``/``stream_stream_join``, so a fixed default would
    crash half this module's operators. Checkpoints live in a throwaway
    temp dir — a real deployment points this at durable storage for
    exactly-once restart.
    """
    spark = result.sparkSession
    if output_mode is None:
        analyzed = result._jdf.queryExecution().analyzed().toString()
        # match node NAMES at line starts (after the tree-drawing prefix),
        # not raw substrings: 'Aggregate' can appear inside an alias like
        # `x AS AggregateValue` and must not flip an append-only plan to
        # complete mode
        def has_node(name: str) -> bool:
            # prefix class covers tree-drawing chars plus the ~ streaming
            # marker and the ' unresolved marker
            return re.search(rf"(?m)^[\s+:|~'-]*{name}\b", analyzed) is not None

        if has_node("FlatMapGroupsWithState") or has_node(
            "FlatMapGroupsInPandasWithState"
        ):
            output_mode = "update"
        elif has_node("Aggregate"):
            output_mode = "complete"
        else:
            output_mode = "append"
    name = query_name or f"avail_now_{uuid.uuid4().hex[:8]}"
    # throwaway checkpoint, removed after the drain — state-store files per
    # call would otherwise accumulate under /tmp for the process lifetime
    checkpoint = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    try:
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(checkpoint, ignore_errors=True)
    return spark.table(name)


def dedup_stream(
    events: DataFrame, keys: list[str], watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming exact deduplication with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps one row per key and — unlike
    plain ``dropDuplicates`` on a stream — evicts a key's state once the
    watermark passes its event time, so state size tracks the duplicate
    *window*, not the stream's lifetime key cardinality. This is the
    streaming tier of the batch ``dedup_exact`` operator: at 100 TB/day of
    training-data ingest, unbounded dedup state is the thing that kills
    the job on day three; the watermark bound is what makes exact dedup
    viable as a continuous process (duplicates arriving further apart
    than the watermark are the accepted false-negative trade).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    watermark: str = "30 minutes",
    join_window: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join with watermark-bounded buffering.

    Joins each event to *later* events of the same user within
    ``join_window`` (the canonical "action followed by reaction" shape).
    Both sides carry a watermark AND the join condition carries a
    time-range bound — both are required: the watermark lets Spark evict
    buffered rows once no future match is possible, and the range bound
    defines how long a row must stay buffered. Without either, a
    stream-stream join buffers its entire input forever.

    At scale: state size ≈ input-rate × join_window per side, independent
    of stream lifetime — the property that makes the operator viable as a
    continuous process.
    """
    l = (
        left.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("event_type").alias("l_type"),
            F.col("ts").alias("l_ts"),
        )
    )
    r = (
        right.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_type").alias("r_type"),
            F.col("ts").alias("r_ts"),
        )
    )
    return l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {join_window}")),
        "inner",
    )


def hll_register_stream(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Incremental HLL distinct-token registers over a document stream.

    Same kernel as the batch sketch
    (:func:`postbound_spark.queries.pipeline.hll_token_registers` — one
    definition, zero drift): tokens hash map-side into (bucket, rank) and
    the streaming aggregation keeps the per-bucket MAX as its state.
    max() is associative, commutative, and idempotent, so arrival order
    and micro-batch boundaries cannot change the registers — the sketch
    over a drained stream equals the batch sketch over the same corpus,
    whatever the file/trigger split. State is exactly 64 longs no matter
    how many tokens stream through, the cheapest stateful operator in
    the module.

    ``maxFilesPerTrigger=1`` makes every input file its own micro-batch,
    so a multi-file corpus genuinely exercises cross-batch state merge.
    """
    from postbound_spark.queries.pipeline import hll_token_registers
    from postbound_spark.streaming.curation import DOCS_SCHEMA

    # the one documents schema every streaming reader declares
    # (curation/neardup use the same constant) — no eager batch read just
    # to infer it, so an empty not-yet-populated directory starts cleanly
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(docs_dir)
    )
    return hll_token_registers(stream)
