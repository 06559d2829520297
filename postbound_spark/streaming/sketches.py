"""Incremental mergeable-sketch maintenance over a document stream.

The KMV bottom-k sketch composes under union (bottom-k of a union equals
bottom-k of the union of bottom-ks — associative, commutative,
idempotent), which makes it maintainable incrementally with k·S rows of
durable state (S = source count): each micro-batch's hashes merge into
the stored sketch and the result is bit-identical to the batch sketch
over everything ingested so far, whatever the file/trigger split or
arrival order. Kernels are shared with the batch registry entry
(``queries.pipeline.kmv_source_hashes`` / ``kmv_bottom_k``) so the two
surfaces cannot drift — the same contract as the streaming HLL
(``streaming.windows.hll_register_stream``).

Pattern: ``foreachBatch`` + versioned parquet snapshots (the
``StreamingNearDup`` index idiom) rather than ``applyInPandasWithState``
— sketch state is a *relation* (k rows per source), the merge is pure
DataFrame algebra (union → WindowGroupLimit), and snapshot-per-batch
overwrite keeps replays idempotent. No Python state crossing at all.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from postbound_spark.functions import text as T
from postbound_spark.queries.pipeline import (
    _KMV_K,
    bloom_bit_stream,
    countmin_cells,
    kmv_bottom_k,
    kmv_source_hashes,
)
from postbound_spark.streaming.curation import DOCS_SCHEMA


class StreamingKmvSketch:
    """foreachBatch sink maintaining the per-source KMV bottom-k sketch."""

    def __init__(self, spark: SparkSession, state_dir: str, k: int = _KMV_K):
        self.spark = spark
        self.state_dir = state_dir
        self.k = k
        os.makedirs(os.path.join(state_dir, "sketch"), exist_ok=True)

    def _snapshots(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.state_dir, "sketch", "batch=*")))

    def _snapshot_dir(self, batch_id: int) -> str:
        return os.path.join(self.state_dir, "sketch", f"batch={batch_id:06d}")

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Merge one micro-batch: bottom-k(previous sketch ∪ batch hashes).

        The batch side is pre-shrunk to its own bottom-k before the merge
        (WindowGroupLimit partials per partition), so the union never
        carries more than 2·k rows per source into the final cut. A
        replayed batch id overwrites its own snapshot — idempotent under
        checkpoint recovery; re-merging already-ingested hashes is a
        no-op by idempotence of the merge itself."""
        new_sk = kmv_bottom_k(kmv_source_hashes(batch), self.k)
        snaps = [p for p in self._snapshots() if p < self._snapshot_dir(batch_id)]
        if snaps:
            prev = self.spark.read.parquet(snaps[-1])
            # the distinct gives replay idempotence AND matches the batch
            # kernel exactly: kmv_source_hashes dedupes on (source, th)
            # too, so stream == batch even across 60-bit hash collisions
            merged = kmv_bottom_k(prev.unionByName(new_sk).distinct(), self.k)
        else:
            merged = new_sk
        merged.write.mode("overwrite").parquet(self._snapshot_dir(batch_id))

    def sketch(self) -> DataFrame:
        """The current per-source bottom-k sketch (latest snapshot)."""
        snaps = self._snapshots()
        if not snaps:
            raise FileNotFoundError("no batches processed yet")
        return self.spark.read.parquet(snaps[-1])


def run_kmv_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    files_per_trigger: int = 1,
    k: int = _KMV_K,
) -> StreamingKmvSketch:
    """Consume the parquet files in ``input_dir`` as a stream and fold
    each micro-batch into the KMV sketch; returns the sink for reading
    the sketch / feeding more data later."""
    sink = StreamingKmvSketch(spark, state_dir, k)
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


def _token_stream(spark: SparkSession, docs_dir: str) -> DataFrame:
    """The document stream's raw token column, one file per micro-batch —
    the common front of the built-in-aggregation sketch drains below."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(docs_dir)
    )
    return stream.select(F.explode(T.tokens(F.col("text"))).alias("token"))


def countmin_cell_stream(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Incremental count-min cells over a document stream: the SAME cell
    kernel as the batch sketch (``queries.pipeline.countmin_cells`` —
    one definition, zero drift) run as a streaming aggregation. Count is
    associative and commutative, so arrival order and micro-batch splits
    cannot change the cells, and state is d×w = 1024 counters no matter
    how many tokens stream through — cell-wise sum IS the count-min
    merge, performed by the state store itself."""
    return countmin_cells(_token_stream(spark, docs_dir))


def bloom_bit_count_stream(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Incremental Bloom bit set over a document stream: the SAME bit
    kernel as the batch filter (``queries.pipeline.bloom_bit_stream``),
    grouped-counted so state is bounded by m=256 bits. The bit SET
    (projection of the keys) equals the batch filter's distinct bits —
    bit-OR merge subsumed by the grouped count; the counts additionally
    give the per-bit collision load a deployment watches to decide when
    to grow m."""
    return bloom_bit_stream(_token_stream(spark, docs_dir)).groupBy("bit").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
