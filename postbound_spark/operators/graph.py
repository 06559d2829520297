"""Distributed connected components: min-label propagation with pointer
doubling.

Shared by the batch dedup-cluster kernel (``queries/pipeline.py``
``_build_duplicate_components``) and the streaming contracted-graph fold
(``streaming/components.py``). Semantics: every node ends up labeled with
the SMALLEST node id in its connected component (the canonical-
representative convention both tiers pin with oracles and stream==batch
tests).

Round structure (r12-opt): plain min-label propagation moves a label one
hop per round — O(component diameter) rounds, each a full edge join. The
classic pointer-doubling step (label ← label-of-label, the large-star/
small-star family) composes the current labeling with itself after each
propagation, so round k covers 2^k hops and a chain of diameter d
converges in O(log d) rounds instead of O(d). Each round costs one extra
label⋈label join over the node-sized frame — negligible next to the
edge-sized propagation join whose round COUNT is the scale lever
(near-dup graphs are shallow, but sliding-boilerplate chains are exactly
the shape that used to exhaust the round cap).

Exactness: with init lbl(v) = v, both steps only ever REPLACE a label by
a smaller node id reachable in the component (propagation: a neighbor's
label; doubling: the label's own label — reachable by composition), so
labels are monotone non-increasing, bounded below by the component
minimum, and the fixpoint of the propagation step alone is "every label
is the component minimum" — doubling accelerates reaching it without
changing it. Convergence detection rides the monotone label sum (exact
DECIMAL(38,0): doc-id sums at 100-TB node counts overflow BIGINT): the
sum strictly decreases iff ANY node changed this round, and the sum
aggregate is the first action on each lazily-checkpointed frame, so the
checkpoint materializes in the same job — one job per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["min_label_components"]


def min_label_components(
    sym_edges: DataFrame,
    max_rounds: int = 15,
    round_counter: list | None = None,
) -> DataFrame:
    """(node, lbl) labeling of the graph given as SYMMETRIC edges
    (src, dst) — callers union both directions first. ``round_counter``,
    when given, receives the number of propagation rounds executed
    (appended once) so tests can pin the O(log d) round law."""
    labels = (
        sym_edges.select(F.col("src").alias("node")).distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=False)
    )

    def label_sum(frame) -> object:
        return frame.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sum = label_sum(labels)
    changed = 0
    rounds = 0
    for _round in range(max_rounds):
        rounds += 1
        neighbor_lbls = (
            sym_edges.join(labels, sym_edges["dst"] == labels["node"])
            .select(F.col("src").alias("node"), "lbl")
        )
        propagated = (
            labels.unionByName(neighbor_lbls)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
        # pointer doubling: shortcut each node's label to its label's
        # label. Every label value IS a node of the graph (labels start
        # as node ids and min() picks among them), so the lookup is a
        # plain self-join; least() keeps monotonicity explicit.
        lookup = propagated.select(
            F.col("node").alias("ptr_node"), F.col("lbl").alias("ptr_lbl")
        )
        new_labels = (
            propagated.join(
                lookup, propagated["lbl"] == lookup["ptr_node"], "left"
            )
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("ptr_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=False)
        )
        new_sum = label_sum(new_labels)
        changed = int(new_sum != prev_sum)
        prev_sum = new_sum
        labels = new_labels
        if changed == 0:
            break
    if round_counter is not None:
        round_counter.append(rounds)
    if changed:
        # a component with effective diameter > 2^max_rounds would
        # otherwise emit wrong labels with no signal — fail loudly; the
        # cap exists only to bound a buggy non-converging graph
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} rounds "
            "(the label sum was still decreasing); raise the round cap "
            "for pathologically deep graphs"
        )
    return labels
