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
        """Bitmask subset DP. Subsets are integer masks over the sorted
        table list, connectivity checks are adjacency-mask intersections,
        and the linear (``bushy=False``) mode enumerates only splits with
        a single-table side — O(n·2^n) instead of the 3^n submask walk —
        which is what lets the DP plan 14-17-table JOB queries instead of
        topping out at ~10 (the corpus-scale gap the frozenset version
        had)."""
        names = sorted(spec.tables)
        n = len(names)
        index = {t: i for i, t in enumerate(names)}
        adjacency = [0] * n
        for e in spec.edges:
            ts = sorted(e.tables())
            if len(ts) == 2 and ts[0] in index and ts[1] in index:
                i, j = index[ts[0]], index[ts[1]]
                adjacency[i] |= 1 << j
                adjacency[j] |= 1 << i

        def bit_indices(mask: int):
            while mask:
                low = mask & -mask
                yield low.bit_length() - 1
                mask ^= low

        def connected(left: int, right: int) -> bool:
            # any edge crossing the cut ⟺ some right table neighbors left
            return any(adjacency[i] & left for i in bit_indices(right))

        card: dict[int, float] = {}

        def cardinality(mask: int) -> float:
            if mask not in card:
                subset = frozenset(names[i] for i in bit_indices(mask))
                got = self.estimator.estimate_cardinality(spec, subset, tables)
                if math.isnan(got):
                    # NaN poisons every cost comparison: min() would then
                    # return an arbitrary "optimal" order with no warning
                    raise ValueError(
                        f"cardinality estimator returned NaN for "
                        f"{sorted(subset)} — DP cannot rank plans on "
                        "unknown cardinalities; fix the estimator input"
                    )
                card[mask] = got
            return card[mask]

        # best[mask] = (cost, tree); cost = C_out = Σ |intermediate|
        best: dict[int, tuple[float, JoinTree]] = {}
        for i, t in enumerate(names):
            best[1 << i] = (0.0, JoinTree.leaf(t, cardinality(1 << i)))

        full = (1 << n) - 1
        # increasing int order: every proper submask of m is < m, so all
        # subproblems are solved before m is reached — no popcount sort
        for mask in range(3, full + 1):
            if mask & (mask - 1) == 0:
                continue  # singleton — already seeded
            if self.bushy:
                sub = (mask - 1) & mask
                splits = []
                while sub:
                    splits.append((sub, mask ^ sub))
                    sub = (sub - 1) & mask
            else:
                # linear trees: one side is always a single table (covers
                # left-deep AND right-deep steps, i.e. zig-zag shapes —
                # the same space the old both-sides>1 filter admitted)
                splits = []
                for i in bit_indices(mask):
                    single = 1 << i
                    rest = mask ^ single
                    splits.append((rest, single))
                    splits.append((single, rest))
            candidates: list[tuple[float, int, int]] = []
            for left, right in splits:
                if left not in best or right not in best:
                    continue
                if not connected(left, right):
                    continue  # never enumerate cross products (ref :92)
                out_rows = cardinality(mask)
                if self.cost_model is None:
                    cost = best[left][0] + best[right][0] + out_rows
                else:
                    from postbound_spark.optimizer.stages import (
                        PlanParameterization,
                    )

                    tree = JoinTree.join(best[left][1], best[right][1], out_rows)
                    params = PlanParameterization()
                    for j in tree.joins():
                        jmask = 0
                        for t in j.tables():
                            jmask |= 1 << index[t]
                        params.set_cardinality(
                            frozenset(j.tables()), cardinality(jmask)
                        )
                    cost = self.cost_model.cost(tree, params)
                candidates.append((cost, left, right))
            if candidates:
                # min by cost, then by the tree's string form among ties —
                # the deterministic tie-break of the frozenset version,
                # but trees are only BUILT for cost-tied candidates
                low = min(c for c, _, _ in candidates)
                tied = [
                    JoinTree.join(best[l][1], best[r][1], cardinality(mask))
                    for c, l, r in candidates
                    if c == low
                ]
                tree = min(tied, key=str) if len(tied) > 1 else tied[0]
                best[mask] = (low, tree)

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
