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

import json
import os
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

    # -- persistence (ref: QEP-S save/load, opt/tonic.py:196-1019) ----------

    def to_dict(self) -> dict:
        return {
            "children": {name: c.to_dict() for name, c in self.children.items()},
            "operator_costs": {
                op.value: [total, count]
                for op, (total, count) in self.operator_costs.items()
            },
        }

    @classmethod
    def from_dict(cls, data: dict) -> "QepsNode":
        node = cls()
        node.children = {
            name: cls.from_dict(c) for name, c in data.get("children", {}).items()
        }
        node.operator_costs = {
            # legacy persisted files spelled BROADCAST_NL by its old
            # (incorrect) hint string — map it forward on load
            JoinOperator(
                "broadcast_nl" if op == "shuffle_replicate_nl" else op
            ): (float(total), int(count))
            for op, (total, count) in data.get("operator_costs", {}).items()
        }
        return node


def _prefix_steps(
    join_order: JoinTree, start: str | None = None
) -> list[tuple[str, frozenset[str]]]:
    """(next-table, joined-set-after) per join, in build order. Bushy trees
    are linearized by their post-order join sequence (the reference's trie
    is likewise prefix-sequence-keyed). ``start`` seeds the joined set so
    the first join keys by the table that ENTERED, never the start table
    itself (``sorted()[-1]`` previously collided distinct first joins when
    the start table sorted last)."""
    steps: list[tuple[str, frozenset[str]]] = []
    seen: set[str] = {start} if start is not None else set()
    for join in join_order.joins():
        tables = set(join.tables())
        new = sorted(tables - seen)
        seen |= tables
        # key each step by the join node's OWN subtree table set, not the
        # running accumulation: in a bushy tree the branch join (C ⋈ D)
        # reached after {A, B} must key {C, D} — frozenset(seen) would key
        # {A, B, C, D} (the root's set), silently dropping/misattributing
        # branch observations and emitting hints compile_join_tree's
        # operator_for({C, D}) lookup can never find. Left-deep trees are
        # unaffected (each join's subtree IS the accumulation there).
        steps.append((new[-1] if new else sorted(tables)[-1], frozenset(tables)))
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
        for table, joined in _prefix_steps(join_order, start):
            node = node.children.setdefault(table, QepsNode())
            op = operators.get(joined)
            if op is not None and joined in costs:
                node.observe(op, costs[joined])

    # -- recommendation (the PhysicalOperatorSelection stage) ---------------

    def select_physical_operators(
        self, spec: QuerySpec, join_order: JoinTree
    ) -> PhysicalOperatorAssignment:
        assignment = PhysicalOperatorAssignment()
        start = join_order.tables()[0]
        node = self.root.children.get(start)
        if node is None:
            return assignment  # unseen prefix — defer to Catalyst
        for table, joined in _prefix_steps(join_order, start):
            node = node.children.get(table)
            if node is None:
                break  # prefix diverges from everything learned
            rec = node.recommendation()
            if rec is not None:
                assignment.set_join_operator(joined, rec)
        return assignment

    # -- persistence: the train -> save -> load -> replay loop survives
    #    sessions (ref QEP-S serialization, opt/tonic.py:196-1019) ----------

    FORMAT_VERSION = 2  # v2: first-join trie keys fixed (no start-table collision)

    def save(self, path: str) -> None:
        """Write the trie as JSON (atomic: temp file + rename, so a crashed
        writer never leaves a torn trie for the next session)."""
        payload = {"version": self.FORMAT_VERSION, "root": self.root.to_dict()}
        tmp = f"{path}.tmp"
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "TonicOperatorSelection":
        with open(path) as fh:
            payload = json.load(fh)
        version = payload.get("version")
        if version != cls.FORMAT_VERSION:
            raise ValueError(
                f"unsupported QEP-S trie version {version!r} in {path}"
            )
        selection = cls()
        selection.root = QepsNode.from_dict(payload["root"])
        return selection
