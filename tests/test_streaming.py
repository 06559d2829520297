"""Structured Streaming == batch equivalence on the finite events fixture
(the streaming analog of the registry's DB-as-oracle pattern)."""

from __future__ import annotations

import pytest

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


def test_watermark_drops_late_events_in_append_mode(spark, tmp_path):
    """The late-data semantics the watermark exists for, pinned end to
    end: an event arriving AFTER the watermark passed its window is
    dropped from the appended aggregate; the identical batch aggregate
    (no watermark) still counts it — so a regression that stops
    advancing or applying the watermark flips this test."""
    import datetime as dt

    from pyspark.sql import functions as F

    from postbound_spark.streaming.windows import run_available_now

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def rows(*minutes):
        return [(i, t0 + dt.timedelta(minutes=m), "view") for i, m in enumerate(minutes)]

    schema = "event_id long, ts timestamp, event_type string"
    src = tmp_path / "in"
    src.mkdir()
    # measured Spark semantics (traced via numRowsDroppedByWatermark):
    # a late row is DROPPED only once its window's state has been evicted
    # in an EARLIER batch — a late row landing in the same batch as the
    # eviction still merges. So the sequence needs five batches:
    #   b0 on-time events -> b1 advances the watermark past the window ->
    #   b2 evicts + emits the window (n=5) -> b3 late arrival (dropped) ->
    #   b4 sentinel flushes the remaining windows
    batches = [
        (0, 1, 2, 3, 4),  # the 10:00 window
        (40,),            # watermark -> 10:30 for the next batch
        (41,),            # eviction batch: 10:00 window emitted here
        (2,),             # LATE: state gone -> dropped by watermark
        (90,),            # flush sentinel
    ]
    for i, ms in enumerate(batches):
        spark.createDataFrame(rows(*ms), schema).coalesce(1).write.parquet(
            str(src / f"b{i}"), mode="overwrite"
        )
    import glob
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    import os

    for i in range(len(batches)):
        (part,) = glob.glob(str(src / f"b{i}" / "part-*.parquet"))
        dst = flat / f"{i:02d}.parquet"
        shutil.copy(part, str(dst))
        # FileStreamSource orders batches by MODIFICATION TIME, not name;
        # fast copies can tie mtimes and flip the late file ahead of the
        # watermark-advancing one — pin strictly increasing mtimes
        os.utime(dst, (1000 * (i + 1), 1000 * (i + 1)))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("start"), "n")
    )
    got = {
        r.start: r.n
        for r in run_available_now(agg, "t_late", output_mode="append").collect()
    }
    # the 10:00 window was emitted at eviction with its on-time count;
    # the later replay of minute 2 was dropped by the watermark
    assert got[t0] == 5
    assert got[t0 + dt.timedelta(minutes=40)] == 2  # advancer + evictor

    # the batch path (no watermark) counts all 8 rows including the late one
    batch = spark.read.parquet(str(flat))
    batch_counts = {
        r.start: r.n
        for r in batch.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("start"), "n")
        .collect()
    }
    assert batch_counts[t0] == 6


def test_streaming_anomaly_scores_match_batch(spark, sf_small):
    """The anomaly detector's stream/batch split: hourly counts stream
    incrementally (associative, watermarked), the z-score readout runs
    on the drained counts through the SAME helper as the batch registry
    query — outputs must be identical."""
    from postbound_spark.queries.pipeline import anomaly_zscores_over_counts
    from postbound_spark.streaming.windows import (
        run_available_now,
        stream_events,
        windowed_type_counts,
    )

    stream = stream_events(spark, sf_small)
    counts = windowed_type_counts(stream)
    assert counts.isStreaming
    drained = run_available_now(counts, "t_stream_anomaly")
    got = sorted(
        tuple(r) for r in anomaly_zscores_over_counts(drained).collect()
    )

    batch = load_all()["events_anomaly_zscore"].builder(spark, sf_small)
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want and len(got) > 0
    # the flag column is live on the fixture: at least one anomaly exists
    assert any(r[-1] == 1 for r in got)


def test_streaming_hll_registers_match_batch(spark, sf_small, tmp_path):
    """The incremental HLL sketch: documents split across 4 parquet files,
    drained one file per micro-batch (maxFilesPerTrigger=1), must produce
    EXACTLY the batch registers — max() state merge is order- and
    batching-invariant, which is the property that makes the sketch
    streamable at all. The register kernel is shared with the batch
    registry entry, so the two cannot drift."""
    from postbound_spark.catalog import load_table
    from postbound_spark.queries.pipeline import hll_token_registers
    from postbound_spark.streaming.windows import (
        hll_register_stream,
        run_available_now,
    )

    docs_dir = str(tmp_path / "docs_multi")
    docs = load_table(spark, sf_small, "documents")
    docs.repartition(4).write.mode("overwrite").parquet(docs_dir)

    stream = hll_register_stream(spark, docs_dir)
    assert stream.isStreaming
    got = sorted(
        tuple(r) for r in run_available_now(stream, "t_hll_stream").collect()
    )
    want = sorted(
        tuple(r)
        for r in hll_token_registers(
            spark.read.parquet(docs_dir)
        ).collect()
    )
    assert got == want and len(got) > 0


@pytest.mark.parametrize("n_files", [1, 4, 7])
def test_streaming_kmv_sketch_matches_batch(spark, sf_small, tmp_path, n_files):
    """The incremental KMV sketch: documents split across n parquet
    files, drained one per micro-batch, must produce EXACTLY the batch
    bottom-k sketch — bottom-k-of-union is associative, commutative and
    idempotent, the property that makes the sketch maintainable with
    k rows per source of durable state. Parametrized over the
    single-batch edge (the merge's identity case) and uneven many-batch
    splits (every source present in every batch vs. only some). Kernels
    shared with the batch registry entry, so the two cannot drift."""
    from postbound_spark.catalog import load_table
    from postbound_spark.queries.pipeline import kmv_bottom_k, kmv_source_hashes
    from postbound_spark.streaming.sketches import run_kmv_stream

    docs_dir = str(tmp_path / "docs_multi_kmv")
    docs = load_table(spark, sf_small, "documents")
    docs.repartition(n_files).write.mode("overwrite").parquet(docs_dir)

    sink = run_kmv_stream(spark, docs_dir, str(tmp_path / "kmv_state"))
    got = sorted(tuple(r) for r in sink.sketch().collect())
    want = sorted(
        tuple(r)
        for r in kmv_bottom_k(
            kmv_source_hashes(spark.read.parquet(docs_dir))
        ).collect()
    )
    assert got == want and len(got) > 0


def test_streaming_countmin_cells_match_batch(spark, sf_small, tmp_path):
    """The incremental count-min sketch: documents split across 4 files,
    drained one per micro-batch, must produce EXACTLY the batch cells —
    cell-wise count is associative/commutative, so batching cannot change
    the sketch, and state is d×w = 1024 counters. Kernel shared with
    sketch_countmin_tokens."""
    from postbound_spark.catalog import load_table
    from postbound_spark.queries.pipeline import countmin_cells
    from postbound_spark.streaming.sketches import countmin_cell_stream
    from postbound_spark.streaming.windows import run_available_now

    docs_dir = str(tmp_path / "docs_multi_cm")
    load_table(spark, sf_small, "documents").repartition(4).write.mode(
        "overwrite"
    ).parquet(docs_dir)

    stream = countmin_cell_stream(spark, docs_dir)
    assert stream.isStreaming
    got = sorted(tuple(r) for r in run_available_now(stream, "t_cm").collect())
    from pyspark.sql import functions as F
    from postbound_spark.functions import text as T

    tok = spark.read.parquet(docs_dir).select(
        F.explode(T.tokens(F.col("text"))).alias("token")
    )
    want = sorted(tuple(r) for r in countmin_cells(tok).collect())
    assert got == want and len(got) > 0


def test_streaming_bloom_bits_match_batch(spark, sf_small, tmp_path):
    """The incremental Bloom filter: the drained stream's bit SET equals
    the batch filter's distinct bits (bit-OR merge subsumed by the
    grouped count; state bounded by m=256), and per-bit hit counts sum
    to exactly 2 hashes x token occurrences."""
    from postbound_spark.catalog import load_table
    from postbound_spark.queries.pipeline import bloom_bit_stream
    from postbound_spark.streaming.sketches import bloom_bit_count_stream
    from postbound_spark.streaming.windows import run_available_now

    docs_dir = str(tmp_path / "docs_multi_bloom")
    load_table(spark, sf_small, "documents").repartition(4).write.mode(
        "overwrite"
    ).parquet(docs_dir)

    stream = bloom_bit_count_stream(spark, docs_dir)
    drained = run_available_now(stream, "t_bloom")
    got_bits = sorted(r[0] for r in drained.select("bit").collect())
    from pyspark.sql import functions as F
    from postbound_spark.functions import text as T

    tok = spark.read.parquet(docs_dir).select(
        F.explode(T.tokens(F.col("text"))).alias("token")
    )
    want_bits = sorted(
        r[0] for r in bloom_bit_stream(tok).distinct().collect()
    )
    assert got_bits == want_bits and len(got_bits) > 0
    n_tok = tok.count()
    assert drained.agg(F.sum("n_hits")).collect()[0][0] == 2 * n_tok
