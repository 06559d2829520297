"""Textbook dynamic-programming join enumeration.

Re-implements the *algorithm* of the reference's
``DynamicProgrammingEnumerator`` (rbergm/PostBOUND ``postbound/opt/
dynprog.py:79``; same documented limitations ``:92-106``: SPJ, inner
equi-joins, no interesting-order reasoning) over our JoinGraph/JoinTree
artifacts. Nothing copied — this is the classic Selinger bottom-up DP:

    best[{t}]   = leaf
    best[S]     = argmin over connected splits (L, R) of
                  cost(best[L]) + cost(best[R]) + cost_of_join(L, R)

Cardinalities come from any :class:`CardinalityEstimator` (precise counts,
replayed numbers, or a distortion wrapper — the research loop's knob), and
the cost model defaults to C_out (sum of intermediate cardinalities), the
standard research baseline. The winning JoinTree is enforced by
construction like every other ordering stage.

Complexity is the usual 3^n subset DP — fine for the ≤10-relation queries
optimizer research actually studies; the exhaustive/random enumerators
(enumeration.py) cover sampling larger spaces.
"""

from __future__ import annotations

import itertools
import math

from pyspark.sql import DataFrame

from postbound_spark.optimizer.jointree import JoinTree
from postbound_spark.optimizer.stages import (
    PlanEnumerator,
    CardinalityEstimator,
    JoinOrderOptimization,
    QuerySpec,
)


class DynamicProgrammingEnumerator(JoinOrderOptimization):
    """``cost_model=None`` optimizes C_out (the textbook default). An
    external :class:`CostModel` is applied to every candidate subtree with
    its intermediate cardinalities injected as ``PlanParameterization`` —
    note the usual caveat: DP is only guaranteed optimal for cost functions
    with optimal substructure; an arbitrary model makes this a best-effort
    heuristic over the DP's candidate space."""

    def __init__(
        self,
        cardinality_estimator: CardinalityEstimator,
        bushy: bool = True,
        cost_model=None,
    ):
        self.estimator = cardinality_estimator
        self.bushy = bushy
        self.cost_model = cost_model

    def optimize_join_order(self, spec: QuerySpec, tables: dict[str, DataFrame]) -> JoinTree:
        names = sorted(spec.tables)
        edges = list(spec.edges)

        def connected(left: frozenset[str], right: frozenset[str]) -> bool:
            return any(
                len(e.tables() & left) == 1 and len(e.tables() & right) == 1
                for e in edges
            )

        card: dict[frozenset[str], float] = {}

        def cardinality(subset: frozenset[str]) -> float:
            if subset not in card:
                got = self.estimator.estimate_cardinality(spec, subset, tables)
                if math.isnan(got):
                    # NaN poisons every cost comparison: min() would then
                    # return an arbitrary "optimal" order with no warning
                    raise ValueError(
                        f"cardinality estimator returned NaN for "
                        f"{sorted(subset)} — DP cannot rank plans on "
                        "unknown cardinalities; fix the estimator input"
                    )
                card[subset] = got
            return card[subset]

        # best[S] = (cost, tree); cost = C_out = Σ |intermediate|
        best: dict[frozenset[str], tuple[float, JoinTree]] = {}
        for t in names:
            s = frozenset((t,))
            best[s] = (0.0, JoinTree.leaf(t, cardinality(s)))

        for size in range(2, len(names) + 1):
            for combo in itertools.combinations(names, size):
                subset = frozenset(combo)
                candidates: list[tuple[float, JoinTree]] = []
                for left_tuple in _proper_subsets(combo):
                    left = frozenset(left_tuple)
                    right = subset - left
                    if left not in best or right not in best:
                        continue
                    if not self.bushy and len(right) > 1 and len(left) > 1:
                        continue
                    if not connected(left, right):
                        continue  # never enumerate cross products (ref :92)
                    out_rows = cardinality(subset)
                    tree = JoinTree.join(best[left][1], best[right][1], out_rows)
                    if self.cost_model is None:
                        cost = best[left][0] + best[right][0] + out_rows
                    else:
                        from postbound_spark.optimizer.stages import (
                            PlanParameterization,
                        )

                        params = PlanParameterization()
                        for j in tree.joins():
                            key = frozenset(j.tables())
                            params.set_cardinality(key, cardinality(key))
                        cost = self.cost_model.cost(tree, params)
                    candidates.append((cost, tree))
                if candidates:
                    best[subset] = min(candidates, key=lambda ct: (ct[0], str(ct[1])))

        full = frozenset(names)
        if full not in best:
            raise ValueError("join graph is disconnected — DP needs a connected SPJ query")
        return best[full][1]

    def plan_cost(self, spec: QuerySpec, tables: dict[str, DataFrame]) -> float:
        tree = self.optimize_join_order(spec, tables)
        return sum(
            j.cardinality for j in tree.joins() if not math.isnan(j.cardinality)
        )


def _proper_subsets(combo: tuple[str, ...]):
    for size in range(1, len(combo)):
        yield from itertools.combinations(combo, size)


class SelingerPlanEnumerator(PlanEnumerator):
    """Concrete PlanEnumerator (ref ``_stages.py:849``): DP join ordering
    (access-path × join-path bottom-up, as in ``opt/dynprog.py:79``)
    followed by cost-based physical operator choice — broadcast-hash when
    the estimated build side fits the broadcast budget, sort-merge
    otherwise (the two strategies that matter at cluster scale)."""

    def __init__(self, broadcast_threshold_rows: float = 1_000_000):
        self.broadcast_threshold_rows = broadcast_threshold_rows

    def generate_execution_plan(
        self,
        spec: QuerySpec,
        tables: dict[str, DataFrame],
        cost_model,
        cardinality_estimator: CardinalityEstimator,
    ):
        from postbound_spark.optimizer.hints import (
            JoinOperator,
            PhysicalOperatorAssignment,
        )

        tree = DynamicProgrammingEnumerator(
            cardinality_estimator, cost_model=cost_model
        ).optimize_join_order(spec, tables)
        assignment = PhysicalOperatorAssignment()
        for join in tree.joins():
            inner_tables = frozenset(join.inner.tables())
            est = cardinality_estimator.estimate_cardinality(
                spec, inner_tables, tables
            )
            op = (
                JoinOperator.BROADCAST_HASH
                if est <= self.broadcast_threshold_rows
                else JoinOperator.SORT_MERGE
            )
            assignment.set_join_operator(frozenset(join.tables()), op)
        return tree, assignment
