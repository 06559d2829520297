"""Incremental corpus curation: the keep-list composite as a stream.

A production corpus does not arrive as one batch — it ingests
continuously, and the curation pipeline (exact dedup → repetition filter
→ per-source cap) has to run incrementally without ever re-reading the
full history. This module runs the SAME stage logic as the batch
``pipeline_keep_list`` query (``queries/pipeline.py`` — the helpers are
shared, so the tokenization and thresholds cannot drift) through
Structured Streaming ``foreachBatch``:

- each micro-batch is filtered per-row (repetition is a pure map — no
  state needed);
- exact dedup maintains a compacted **survivor pool** (min ``doc_id``
  per content hash seen so far). Min-per-key is associative and
  commutative, so folding batch after batch into the pool converges to
  exactly the batch answer regardless of arrival order, and replaying a
  batch after a crash is idempotent — the checkpoint/restart story falls
  out of the algebra instead of custom recovery code;
- the per-source cap is applied to the (small, post-filter) pool when
  the keep list is read out — a global top-N-per-group is not
  incrementally decomposable row-by-row, but the pool it reads is
  already deduplicated and orders of magnitude smaller than the stream.

State lives in a ping-pong pair of parquet directories (write the next
generation, then atomically swap) because a parquet path cannot be
overwritten while a plan is still reading it. On a real cluster the pool
would be a table format with upserts (Delta/Iceberg MERGE); the
per-batch dataflow is identical.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postbound_spark.queries.pipeline import (
    _repetition_metrics,
    _ws_bigram_projection,
)

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _survivors(batch: DataFrame) -> DataFrame:
    """Per-row stages of one micro-batch: repetition filter, then project
    down to (doc_id, lang, source, th) — the narrow-shuffle discipline of
    the batch query (only ids + keys ever reach the pool)."""
    base = _ws_bigram_projection(
        batch, "doc_id", "lang", "source", F.md5("text").alias("th")
    )
    *_, repetitive = _repetition_metrics()
    return base.filter(~repetitive).select("doc_id", "lang", "source", "th")


class StreamingKeepList:
    """foreachBatch sink folding each micro-batch into the survivor pool."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir
        self._pool = os.path.join(state_dir, "pool")
        self._next = os.path.join(state_dir, "pool_next")
        self._prev = os.path.join(state_dir, "pool_prev")
        os.makedirs(state_dir, exist_ok=True)

    def _recover(self) -> None:
        """Finish an interrupted swap — newest complete generation first:
        a crash in process_batch can leave (a) pool_next complete
        (_SUCCESS present) with pool already retired to pool_prev —
        finish the swap; (b) pool_next partial — restore pool_prev. The
        streaming checkpoint then replays the unfolded batch into that
        state (min-per-key is idempotent), so no committed survivor is
        lost. Called ONLY from process_batch (single-threaded with the
        swap): a reader performing these renames could steal pool_next
        from under a concurrently swapping writer."""
        if not os.path.exists(self._pool):
            if os.path.exists(os.path.join(self._next, "_SUCCESS")):
                os.replace(self._next, self._pool)
            elif os.path.exists(self._prev):
                os.replace(self._prev, self._pool)

    def _read_pool(self) -> DataFrame | None:
        # pure read — serves the newest complete generation even inside a
        # writer's swap window, without mutating any state
        for candidate in (self._pool, self._next, self._prev):
            if os.path.exists(os.path.join(candidate, "_SUCCESS")):
                return self.spark.read.parquet(candidate)
        return None

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        self._recover()
        combined = _survivors(batch)
        pool = self._read_pool()
        if pool is not None:
            combined = combined.unionByName(pool)
        # min doc_id per content hash — associative fold, idempotent replay
        w = Window.partitionBy("th").orderBy("doc_id")
        compacted = (
            combined.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        compacted.write.mode("overwrite").parquet(self._next)
        # swap via atomic renames only — there is no instant where every
        # complete generation is gone (the rmtree-then-replace form had a
        # window that lost the whole pool if the process died between)
        shutil.rmtree(self._prev, ignore_errors=True)
        if os.path.exists(self._prev):
            # a held file handle (e.g. an uncollected keep_list frame)
            # survived the rmtree; os.replace onto the non-empty directory
            # would raise ENOTEMPTY and wedge the stream with an opaque
            # error — name the stuck generation instead
            raise RuntimeError(
                f"cannot retire pool generation: {self._prev} is still "
                f"populated after cleanup (an open reader is pinning it); "
                f"collect keep_list() results before the next batch"
            )
        if os.path.exists(self._pool):
            os.replace(self._pool, self._prev)
        os.replace(self._next, self._pool)
        shutil.rmtree(self._prev, ignore_errors=True)

    def keep_list(self, per_source_cap: int = 15) -> DataFrame:
        """The current keep list: per-source cap over the survivor pool
        (identical semantics to the batch ``pipeline_keep_list``).

        The result is eagerly materialized (``localCheckpoint``) so the
        returned frame is detached from the pool path — a later
        ``process_batch`` swaps generations and deletes the directory a
        lazy frame would still be bound to, which could fail mid-collect
        or silently serve a newer generation."""
        pool = self._read_pool()
        if pool is None:
            raise FileNotFoundError("no batches processed yet — pool is empty")
        cap_w = Window.partitionBy("source").orderBy("doc_id")
        return (
            pool.withColumn("rn", F.row_number().over(cap_w))
            .filter(F.col("rn") <= per_source_cap)
            .select("doc_id", "lang", "source")
            .localCheckpoint(eager=True)
        )


def run_keep_list_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    files_per_trigger: int = 1,
) -> StreamingKeepList:
    """Consume every parquet file currently in ``input_dir`` as a stream
    (one micro-batch per ``files_per_trigger`` files, availableNow
    semantics) and fold it into the keep-list state. Returns the sink for
    reading the keep list / feeding more data later."""
    sink = StreamingKeepList(spark, state_dir)
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(input_dir)
    )
    query = (
        stream.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", os.path.join(state_dir, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return sink
