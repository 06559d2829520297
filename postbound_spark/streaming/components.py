"""Incremental connected components over the streaming near-dup pairs.

The batch operator (``queries/pipeline.py`` ``dedup_components``) labels
the whole corpus's near-dup graph in one min-label-propagation run; a
production corpus INGESTS, and each micro-batch's new pairs must fold
into the existing cluster labels without re-propagating over the whole
graph. This module is that fold, completing "every dedup stage has an
incremental form" (the MinHash index in :mod:`streaming.neardup` already
surfaces each batch's new candidate pairs):

- **contract, don't re-propagate**: map the batch's new edges onto the
  CURRENT component representatives (one keyed join against the label
  store); edges whose endpoints already share a representative are
  no-ops. The survivors form a CONTRACTED graph whose nodes are
  representatives — bounded by the batch's merge count, never by corpus
  size.
- run the same min-label loop as the batch tier on that tiny contracted
  graph (O(merge-chain diameter) rounds over batch-sized data,
  ``localCheckpoint`` truncating lineage exactly like the batch kernel);
- apply the resulting ``old_rep → new_rep`` mapping to the full label
  store with ONE broadcast join (the mapping is merge-count-sized), and
  self-label the batch's brand-new nodes.

State is a versioned parquet snapshot per batch
(``labels/v=NNNNNN``, overwrite = idempotent replay: a re-run batch
reads the snapshot BELOW its id and rewrites its own deterministically).
Per-batch cost ∝ new pairs + one map-side relabel of the store; at
100 TB the store rewrite is the only corpus-sized term and it is a
shuffle-free broadcast-join scan — the same cost class as the keep-list
anti-join every ingesting dedup pipeline already pays per batch.

Stream == batch is PINNED: folding the per-batch pair shards of
``StreamingNearDup`` must reproduce ``dedup_components``'s labels
exactly (tests/test_streaming_neardup.py).
"""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postbound_spark.operators.graph import min_label_components

__all__ = ["StreamingComponents", "fold_near_dup_components"]


def _contracted_cc(edges: DataFrame, max_rounds: int = 15) -> DataFrame:
    """Min-label propagation over the contracted representative graph —
    the shared pointer-doubling kernel (operators/graph.py, r12) on
    merge-count-sized data. Returns (node, lbl)."""
    # both directions explode from one edge row (one evaluation of the
    # contracted-edge subtree, not one per union branch — r12-opt, same
    # as the batch CC build)
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst").localCheckpoint(eager=False)
    return min_label_components(sym, max_rounds=max_rounds)


class StreamingComponents:
    """Persisted (doc_id → component) labeling folded batch by batch."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir
        os.makedirs(os.path.join(state_dir, "labels"), exist_ok=True)

    # -- state ---------------------------------------------------------

    def _snapshot_dirs(self) -> list[tuple[int, str]]:
        out = []
        for p in glob.glob(os.path.join(self.state_dir, "labels", "v=*")):
            m = re.fullmatch(r"v=(\d+)", os.path.basename(p))
            if m:
                out.append((int(m.group(1)), p))
        return sorted(out)

    def _labels_before(self, batch_id: int) -> DataFrame | None:
        """Latest snapshot STRICTLY below ``batch_id`` — a replayed batch
        folds from the same prior state it saw the first time."""
        prior = [p for v, p in self._snapshot_dirs() if v < batch_id]
        return self.spark.read.parquet(prior[-1]) if prior else None

    def labels(self) -> DataFrame:
        """Current (doc_id, component) labeling."""
        snaps = self._snapshot_dirs()
        if not snaps:
            raise FileNotFoundError("no batches folded yet")
        return self.spark.read.parquet(snaps[-1][1])

    # -- fold ------------------------------------------------------------

    def process_pairs(self, new_pairs: DataFrame, batch_id: int) -> None:
        """Fold a batch of verified near-dup pairs (doc_a, doc_b) into
        the labeling. Component ids are the min doc_id of the component
        (the batch tier's canonical-representative convention) —
        min-label is merge-order-independent, so the incremental fold
        lands on the identical labeling the batch run produces."""
        pairs = new_pairs.select("doc_a", "doc_b").distinct()
        prev = self._labels_before(batch_id)
        if prev is None:
            prev = self.spark.createDataFrame(
                [], "doc_id long, component long"
            )
        # endpoints → current representatives (new nodes represent
        # themselves); the label store is component-count-bounded but
        # corpus-sized in the worst case, so the pair side broadcasts
        la = F.coalesce(F.col("ca.component"), F.col("doc_a")).alias("la")
        lb = F.coalesce(F.col("cb.component"), F.col("doc_b")).alias("lb")
        reps = (
            F.broadcast(pairs)
            .join(prev.alias("ca"), pairs["doc_a"] == F.col("ca.doc_id"), "left")
            .join(prev.alias("cb"), pairs["doc_b"] == F.col("cb.doc_id"), "left")
            .select("doc_a", "doc_b", la, lb)
            .localCheckpoint()
        )
        contracted = (
            reps.filter(F.col("la") != F.col("lb"))
            .select(
                F.least("la", "lb").alias("src"),
                F.greatest("la", "lb").alias("dst"),
            )
            .distinct()
        )
        rep_map = (
            _contracted_cc(contracted)
            .filter(F.col("node") != F.col("lbl"))
            .select(F.col("node").alias("old_rep"), F.col("lbl").alias("new_rep"))
            if contracted.limit(1).count()
            else None
        )
        # brand-new nodes from this batch, labeled by their (possibly
        # merged) representative
        new_nodes = (
            reps.select(F.col("doc_a").alias("doc_id"), F.col("la").alias("component"))
            .union(
                reps.select(
                    F.col("doc_b").alias("doc_id"), F.col("lb").alias("component")
                )
            )
            .join(prev.select("doc_id"), "doc_id", "left_anti")
            .groupBy("doc_id")
            .agg(F.min("component").alias("component"))
        )
        merged = prev.unionByName(new_nodes)
        if rep_map is not None:
            # ONE broadcast relabel of the store — the merge mapping is
            # merge-count-sized, the store scan is shuffle-free
            merged = (
                merged.join(
                    F.broadcast(rep_map),
                    merged["component"] == rep_map["old_rep"],
                    "left",
                )
                .select(
                    "doc_id",
                    F.coalesce("new_rep", "component").alias("component"),
                )
            )
        out = os.path.join(self.state_dir, "labels", f"v={batch_id:06d}")
        merged.write.mode("overwrite").parquet(out)


def fold_near_dup_components(
    spark: SparkSession, neardup_state_dir: str, state_dir: str
) -> StreamingComponents:
    """Fold every per-batch verified-pair shard of a
    :class:`streaming.neardup.StreamingNearDup` state store into an
    incremental labeling, in batch order — the glue that runs the CC fold
    behind the same foreachBatch ingest."""
    sink = StreamingComponents(spark, state_dir)
    shards = sorted(
        glob.glob(os.path.join(neardup_state_dir, "pairs", "batch=*"))
    )
    for shard in shards:
        batch_id = int(os.path.basename(shard).split("=")[1])
        sink.process_pairs(spark.read.parquet(shard), batch_id)
    return sink
