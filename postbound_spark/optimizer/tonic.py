"""TONIC-style learned physical-operator selection (QEP-S prefix trie).

Re-implements the *idea* of the reference's TONIC stage
(rbergm/PostBOUND ``postbound/opt/tonic.py:1270`` ``TonicOperatorSelection``
over a QEP-S trie ``:196-1019``; Hertzschuch et al.): learn, per join
*prefix* (the sequence of intermediates a left-deep plan builds), which
physical join operator was cheapest in past executions, and recommend those
operators for new queries sharing the prefix. Nothing is copied — this is
the published trie-of-prefixes recommendation scheme over our
JoinTree/PhysicalOperatorAssignment artifacts.

Training signal: any per-join cost — measured runtimes from
``executed_plan`` metrics, or cardinalities as a proxy. Recommendations are
enforced through the standard hint path (hints.py), so an experiment loop
is: run → record → re-optimize → compare, exactly the reference's
train/replay cycle (``tests/test_tonic_optimization.py`` pattern).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from postbound_spark.optimizer.hints import JoinOperator, PhysicalOperatorAssignment
from postbound_spark.optimizer.jointree import JoinTree
from postbound_spark.optimizer.stages import PhysicalOperatorSelection, QuerySpec


@dataclass
class QepsNode:
    """One trie node = one join prefix; children keyed by the next base
    table joined in; per-operator cost observations at this step."""

    children: dict[str, "QepsNode"] = field(default_factory=dict)
    operator_costs: dict[JoinOperator, tuple[float, int]] = field(default_factory=dict)

    def observe(self, operator: JoinOperator, cost: float) -> None:
        total, count = self.operator_costs.get(operator, (0.0, 0))
        self.operator_costs[operator] = (total + cost, count + 1)

    def recommendation(self) -> JoinOperator | None:
        if not self.operator_costs:
            return None
        return min(
            self.operator_costs,
            key=lambda op: (
                self.operator_costs[op][0] / self.operator_costs[op][1],
                op.value,
            ),
        )


def _prefix_steps(join_order: JoinTree) -> list[tuple[str, frozenset[str]]]:
    """(next-table, joined-set-after) per join, in build order. Bushy trees
    are linearized by their post-order join sequence (the reference's trie
    is likewise prefix-sequence-keyed)."""
    steps: list[tuple[str, frozenset[str]]] = []
    seen: set[str] = set()
    for join in join_order.joins():
        tables = set(join.tables())
        new = sorted(tables - seen)
        seen |= tables
        # the table(s) that entered at this join; left-deep ⇒ exactly one
        steps.append((new[-1] if new else sorted(tables)[-1], frozenset(seen)))
    return steps


class TonicOperatorSelection(PhysicalOperatorSelection):
    def __init__(self):
        self.root = QepsNode()

    # -- training -----------------------------------------------------------

    def record_plan(
        self,
        join_order: JoinTree,
        operators: dict[frozenset[str], JoinOperator],
        costs: dict[frozenset[str], float],
    ) -> None:
        """Insert one executed plan: per join step, file the used operator
        and its observed cost under the prefix node."""
        node = self.root
        start = join_order.tables()[0]
        node = node.children.setdefault(start, QepsNode())
        for table, joined in _prefix_steps(join_order):
            node = node.children.setdefault(table, QepsNode())
            op = operators.get(joined)
            if op is not None and joined in costs:
                node.observe(op, costs[joined])

    # -- recommendation (the PhysicalOperatorSelection stage) ---------------

    def select_physical_operators(
        self, spec: QuerySpec, join_order: JoinTree
    ) -> PhysicalOperatorAssignment:
        assignment = PhysicalOperatorAssignment()
        node = self.root.children.get(join_order.tables()[0])
        if node is None:
            return assignment  # unseen prefix — defer to Catalyst
        for table, joined in _prefix_steps(join_order):
            node = node.children.get(table)
            if node is None:
                break  # prefix diverges from everything learned
            rec = node.recommendation()
            if rec is not None:
                assignment.set_join_operator(joined, rec)
        return assignment
