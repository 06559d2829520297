"""Incremental MinHash-LSH near-duplicate detection.

The batch operator (``queries/pipeline.py`` ``dedup_minhash_lsh``) answers
"which near-dup pairs exist in this corpus"; a production corpus INGESTS —
new documents arrive continuously and each must be checked against
everything already indexed without rescanning the corpus. This module is
that shape on Structured Streaming ``foreachBatch``:

- per micro-batch, compute shingle sets → MinHash signatures → band keys
  for the NEW documents only (the same ``functions.text`` kernels as the
  batch operator, so the two tiers cannot drift);
- append the batch's band postings and shingle sets to a parquet state
  store, keyed by batch id (overwrite-per-batch-directory, so checkpoint
  replays are idempotent — a re-run batch overwrites its own files and
  re-derives the same pairs);
- candidate pairs for the batch = new postings ⋈ ALL postings on the band
  key (salted, same as batch tier) — each unordered pair surfaces exactly
  once, in the batch where its LATER document arrives;
- exact-Jaccard verification joins only the colliding pairs back to the
  shingle store.

At 100 TB the state store is the LSH index every vector database
maintains; the per-batch cost is proportional to the batch's collisions,
never to corpus size.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postbound_spark.functions import text as T
from postbound_spark.operators.skew import salted_join
from postbound_spark.streaming.curation import DOCS_SCHEMA

__all__ = ["StreamingNearDup", "run_near_dup_stream"]


def _batch_features(batch: DataFrame) -> DataFrame:
    """(doc_id, sh, sig) per micro-batch document — identical kernels and
    parameters (8 hashes, 4×2 bands) to the batch operator. Callers
    persist this frame before deriving the shingle and posting shards so
    the tokenize→shingle→md5→MinHash lineage evaluates once."""
    toks = batch.select("doc_id", T.tokens(F.col("text")).alias("toks")).filter(
        F.size(F.col("toks")) >= 3
    )
    d = toks.select("doc_id", T.word_shingles(F.col("toks")).alias("sh")).withColumn(
        "hs", T.shingle_hashes31(F.col("sh"))
    )
    return d.select(
        "doc_id", "sh", T.minhash_signature_from_hashes(F.col("hs"), 8).alias("sig")
    )


class StreamingNearDup:
    """foreachBatch sink maintaining the LSH index + verified-pair log."""

    def __init__(self, spark: SparkSession, state_dir: str, threshold: float = 0.3):
        self.spark = spark
        self.state_dir = state_dir
        self.threshold = threshold
        for sub in ("postings", "shingles", "pairs"):
            os.makedirs(os.path.join(state_dir, sub), exist_ok=True)

    def _store(self, name: str) -> DataFrame | None:
        paths = sorted(glob.glob(os.path.join(self.state_dir, name, "batch=*")))
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def _batch_dir(self, name: str, batch_id: int) -> str:
        return os.path.join(self.state_dir, name, f"batch={batch_id:06d}")

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        # land this batch's index shards first (overwrite = idempotent
        # replay), then join the batch against the WHOLE index including
        # itself — within-batch pairs and batch-vs-history pairs fall out
        # of one salted band join. The two shard writes derive from ONE
        # persisted evaluation of the tokenize→shingle→md5→MinHash
        # lineage — the kernel cost the module docstring calls the
        # expensive part would otherwise be paid twice per batch
        sig = _batch_features(batch).persist()
        try:
            sig.select("doc_id", "sh").write.mode("overwrite").parquet(
                self._batch_dir("shingles", batch_id)
            )
            sig.select(
                "doc_id",
                F.explode(T.lsh_band_keys(F.col("sig"), 4, 2)).alias("bkey"),
            ).write.mode("overwrite").parquet(
                self._batch_dir("postings", batch_id)
            )
        finally:
            sig.unpersist()

        new_post = self.spark.read.parquet(self._batch_dir("postings", batch_id))
        all_post = self._store("postings")
        a = new_post.select(F.col("doc_id").alias("doc_a"), "bkey")
        b = all_post.select(F.col("doc_id").alias("doc_b"), "bkey")
        cand = (
            salted_join(a, b, on=["bkey"], salt=8, salt_on=["doc_a", "bkey"])
            # each unordered pair is emitted exactly once — in the batch
            # where its later-ARRIVING member lands (the other member is
            # already indexed; old-vs-old pairs surfaced in an earlier
            # batch) — normalized to ascending id order
            .filter(F.col("doc_a") != F.col("doc_b"))
            .select(
                F.least("doc_a", "doc_b").alias("doc_a"),
                F.greatest("doc_a", "doc_b").alias("doc_b"),
            )
            .distinct()
        )
        store = self._store("shingles")
        x = store.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
        y = store.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        j = inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter)
        verified = (
            cand.join(x, "doc_a")
            .join(y, "doc_b")
            .select("doc_a", "doc_b", F.round(j, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= self.threshold)
        )
        verified.write.mode("overwrite").parquet(self._batch_dir("pairs", batch_id))

    def pairs(self) -> DataFrame:
        """All verified near-dup pairs found so far. Distinct across
        batches: a pair could re-surface on replayed/overlapping batches,
        and the columns are a natural key."""
        store = self._store("pairs")
        if store is None:
            raise FileNotFoundError("no batches processed yet")
        return store.distinct()


def run_near_dup_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    files_per_trigger: int = 1,
    threshold: float = 0.3,
) -> StreamingNearDup:
    """Consume the parquet files in ``input_dir`` as a stream and fold
    each micro-batch into the LSH index; returns the sink for reading
    pairs / feeding more data later."""
    sink = StreamingNearDup(spark, state_dir, threshold)
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
