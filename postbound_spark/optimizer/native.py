"""Native (Catalyst-delegating) optimizer stages.

Re-expresses the reference's ``opt/native.py`` (``NativeCostModel`` :57 —
cost a forced plan via backend EXPLAIN; ``NativeCardinalityEstimator``
:413; ``NativeOptimizer`` :524 — let the target system decide everything
and read its decisions back). In Spark the "backend" is Catalyst itself:
estimates come from ``optimizedPlan().stats`` (sizeInBytes always,
rowCount when CBO statistics exist), and the natively-chosen join order is
parsed back out of the optimized plan with the plan→artifact converters
(:mod:`postbound_spark.optimizer.qep`).

None of this executes data jobs — every stage here is plan-time only
(contrast :class:`~postbound_spark.optimizer.cardinalities.
PreciseCardinalities`, which pays one COUNT(*) job per intermediate).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from postbound_spark.optimizer.hints import compile_join_tree
from postbound_spark.optimizer.jointree import JoinTree
from postbound_spark.optimizer.qep import jointree_from_plan, optimized_plan
from postbound_spark.optimizer.stages import (
    CardinalityEstimator,
    CostModel,
    JoinOrderOptimization,
    PlanParameterization,
    QuerySpec,
)

__all__ = [
    "CatalystCardinalityEstimator",
    "CatalystCostModel",
    "CatalystNativeOptimizer",
]


class CatalystCardinalityEstimator(CardinalityEstimator):
    """ref ``NativeCardinalityEstimator`` opt/native.py:413: ask the
    backend's optimizer for its estimate of an intermediate. Plan-time
    only — builds the join subtree, reads ``optimizedPlan().stats``.
    rowCount needs ANALYZE'd tables + CBO; the sizeInBytes fallback
    divides by an assumed row width (Catalyst's own fallback logic)."""

    def __init__(self, assumed_row_bytes: float = 100.0):
        self.assumed_row_bytes = assumed_row_bytes

    def estimate_cardinality(
        self,
        spec: QuerySpec,
        intermediate: frozenset[str],
        tables: dict[str, DataFrame],
    ) -> float:
        tree = JoinTree.left_deep(sorted(intermediate))
        df = compile_join_tree(tables, tree, list(spec.edges))
        root = optimized_plan(df)
        if not math.isnan(root.estimated_rows):
            return root.estimated_rows
        if not math.isnan(root.size_bytes):
            return max(1.0, root.size_bytes / self.assumed_row_bytes)
        return math.nan


class CatalystCostModel(CostModel):
    """ref ``NativeCostModel`` opt/native.py:57: cost a *forced* plan by
    handing it to the backend and reading the estimate off the plan —
    here, the optimized plan's root sizeInBytes (Catalyst's cost currency
    for join strategy choices). Constructed per query (spec + tables),
    like the reference binds its cost model to a database connection."""

    def __init__(self, spec: QuerySpec, tables: dict[str, DataFrame]):
        self.spec = spec
        self.tables = tables

    def cost(self, tree: JoinTree, params: PlanParameterization) -> float:
        df = compile_join_tree(self.tables, tree, list(self.spec.edges))
        root = optimized_plan(df)
        return root.size_bytes


class CatalystNativeOptimizer(JoinOrderOptimization):
    """ref ``NativeOptimizer`` opt/native.py:524: delegate the decision to
    the target system, then read its choice back as an artifact. Builds
    the unordered join, lets Catalyst reorder/plan it, and parses the
    chosen join order out of the executed plan — the join tree other
    stages can then perturb or enforce."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def optimize_join_order(
        self, spec: QuerySpec, tables: dict[str, DataFrame]
    ) -> JoinTree:
        tree = JoinTree.left_deep(sorted(spec.tables))
        df = compile_join_tree(tables, tree, list(spec.edges))
        return jointree_from_plan(df)
