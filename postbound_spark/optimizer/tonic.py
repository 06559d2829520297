"""TONIC-style learned physical-operator selection (QEP-S prefix trie).

Re-implements the *ideas* of the reference's TONIC stage
(rbergm/PostBOUND ``postbound/opt/tonic.py:1270`` ``TonicOperatorSelection``
over a QEP-S trie ``:196-1019``; Hertzschuch et al., "Turbo-Charging SPJ
Query Plans with Learned Physical Join Operator Selections", VLDB 2022):
learn, per join *prefix* (the sequence of intermediates a plan builds),
which physical join operator was cheapest in past executions, and
recommend those operators for new queries sharing the prefix. Nothing is
copied — this is the published recommendation scheme over our
JoinTree/PhysicalOperatorAssignment artifacts.

Reference capabilities mirrored here (each ref-cited inline):

- **Recency-weighted costs** (``update_costs`` ref ``:716-734``): a node
  stores ``cost + gamma * previous`` per operator — a discounted
  accumulation that biases toward recent observations (workloads drift;
  a regressed operator must be able to win back).
- **Filter-aware QEP-S** (``QepsIdentifier.filter_predicate`` ref
  ``:257-266``, ``_make_identifier`` ref ``:798``): trie child keys can
  carry the base table's filter fingerprint, so ``title[kind=movie]``
  and ``title[kind=tv]`` learn separate recommendations — the same
  physical table behaves like different relations under different
  selectivities.
- **Unknown-cost detection + exploration feedback**
  (``detect_unknown_costs`` ref ``:604``, ``simulate_feedback`` ref
  ``:1369``): walk a join order, report which (prefix, operator) cells
  have never been costed — the active-learning signal TONIC uses to
  decide what to execute next — and optionally fill them from a cost
  estimate instead of an execution.
- **Trie inspection** (``inspect`` ref ``:736``): indented dump for
  debugging a learned model.

Training signal: any per-join cost — measured runtimes from
``executed_plan`` metrics, or cardinalities as a proxy. Recommendations
are enforced through the standard hint path (hints.py), so an experiment
loop is: run → record → re-optimize → compare, exactly the reference's
train/replay cycle (the five-strategy matrices over the JOB and
Stats-CEB corpora, ``experiments.run_optimizer_loop``).

One deliberate divergence: the reference's ``current_recommendation``
returns ``None`` unless a node has costs for MORE THAN ONE operator
("not enough information", ref ``:704-714``). Our experiment loop
trains from executed Spark plans where most prefixes see one operator
(Catalyst already picked the winner), so the default here recommends
from a single observation; pass ``min_operators=2`` for the
reference-faithful conservative behavior.
"""

from __future__ import annotations

import json
import math
import os
from collections.abc import Iterable, Mapping
from dataclasses import dataclass, field

from postbound_spark.optimizer.hints import JoinOperator, PhysicalOperatorAssignment
from postbound_spark.optimizer.jointree import JoinTree
from postbound_spark.optimizer.stages import PhysicalOperatorSelection, QuerySpec

def _weight_sum(n: int, gamma: float) -> float:
    """Σ γ^i for i in [0, n): the total weight a gamma-discounted
    accumulation of n observations carries (n itself when γ=1)."""
    if gamma == 1.0:
        return float(max(n, 1))
    return (1.0 - gamma ** max(n, 1)) / (1.0 - gamma)


#: the operators exploration considers when hunting un-costed cells
DEFAULT_CANDIDATES: tuple[JoinOperator, ...] = (
    JoinOperator.BROADCAST_HASH,
    JoinOperator.SHUFFLE_HASH,
    JoinOperator.SORT_MERGE,
)


@dataclass
class QepsNode:
    """One trie node = one join prefix; children keyed by the next base
    table joined in (plus its filter fingerprint in filter-aware mode);
    per-operator discounted cost + observation count at this step."""

    children: dict[str, "QepsNode"] = field(default_factory=dict)
    operator_costs: dict[JoinOperator, float] = field(default_factory=dict)
    observations: dict[JoinOperator, int] = field(default_factory=dict)

    def observe(self, operator: JoinOperator, cost: float, gamma: float = 0.8) -> None:
        """Recency-weighted update (ref ``update_costs`` opt/tonic.py:716):
        ``cost + gamma * previous``. Rejects NaN/inf like the reference —
        a poisoned cell would silently win or lose every comparison."""
        if math.isnan(cost) or math.isinf(cost):
            raise ValueError(f"cost for {operator} must be finite, got {cost!r}")
        prev = self.operator_costs.get(operator, 0.0)
        self.operator_costs[operator] = cost + gamma * prev
        self.observations[operator] = self.observations.get(operator, 0) + 1

    def normalized_cost(self, operator: JoinOperator, gamma: float = 0.8) -> float:
        """The discounted accumulation divided by its total weight
        Σγ^i — an exponentially-weighted AVERAGE. Comparing the raw
        accumulations (as the reference's argmin does) biases toward
        rarely-observed operators: a steady cost c observed n times
        accumulates toward c/(1-γ) (5c at γ=0.8) while a single
        observation sits at c, so the reference formula can prefer a
        once-observed 2×-more-expensive operator over a proven one.
        Normalizing keeps the recency weighting and removes the
        observation-count bias — a deliberate, documented divergence."""
        return self.operator_costs[operator] / _weight_sum(
            self.observations.get(operator, 1), gamma
        )

    def recommendation(
        self, min_operators: int = 1, gamma: float = 0.8
    ) -> JoinOperator | None:
        if len(self.operator_costs) < max(1, min_operators):
            return None
        return min(
            self.operator_costs,
            key=lambda op: (self.normalized_cost(op, gamma), op.value),
        )

    def missing_operators(
        self, candidates: Iterable[JoinOperator]
    ) -> list[JoinOperator]:
        """Operators with no cost at this node (ref ``detect_unknown_costs``
        opt/tonic.py:604) — the cells an exploration run should fill."""
        return [op for op in candidates if op not in self.operator_costs]

    # -- persistence (ref: QEP-S save/load, opt/tonic.py:196-1019) ----------

    def to_dict(self) -> dict:
        return {
            "children": {name: c.to_dict() for name, c in self.children.items()},
            "operator_costs": {
                op.value: [self.operator_costs[op], self.observations.get(op, 1)]
                for op in self.operator_costs
            },
        }

    @classmethod
    def from_dict(
        cls, data: dict, *, legacy_mean: bool = False, gamma: float = 0.8
    ) -> "QepsNode":
        node = cls()
        node.children = {
            name: cls.from_dict(c, legacy_mean=legacy_mean, gamma=gamma)
            for name, c in data.get("children", {}).items()
        }
        for op_value, (first, second) in data.get("operator_costs", {}).items():
            # legacy persisted files spelled BROADCAST_NL by its old
            # (incorrect) hint string — map it forward on load
            op = JoinOperator(
                "broadcast_nl" if op_value == "shuffle_replicate_nl" else op_value
            )
            count = int(second)
            if legacy_mean and count:
                # v2 tries stored (total, count) mean-cost pairs; seed the
                # accumulation at mean x Σγ^i so the NORMALIZED cost (the
                # comparison quantity) equals the old mean exactly and new
                # observations smooth forward from there
                cost = (float(first) / count) * _weight_sum(count, gamma)
            else:
                cost = float(first)
            node.operator_costs[op] = cost
            node.observations[op] = count
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


def filter_fingerprints(parsed) -> dict[str, str]:
    """Per-FROM-identifier filter fingerprints for filter-aware tries
    (ref ``QepsIdentifier.filter_predicate`` opt/tonic.py:257): the
    table's single-table filter conjuncts, rendered to SQL and sorted so
    the fingerprint is independent of predicate order. Identifiers with
    no filters get no entry — their trie key stays the bare name."""
    preds = parsed.predicates()
    out: dict[str, str] = {}
    for table in parsed.from_tables:
        ident = table.identifier
        filters = sorted(p.to_sql() for p in preds.filters_for(ident))
        if filters:
            out[ident] = " AND ".join(filters)
    return out


class TonicOperatorSelection(PhysicalOperatorSelection):
    def __init__(
        self,
        filter_aware: bool = False,
        gamma: float = 0.8,
        *,
        min_operators: int = 1,
    ):
        self.root = QepsNode()
        self.filter_aware = filter_aware
        self.gamma = gamma
        self.min_operators = min_operators
        #: the unit of every cost in the trie ("cardinality", "runtime",
        #: ...) — set by the first cost filed; mixing units in one trie
        #: makes every comparison meaningless, so a mismatch raises
        self.cost_unit: str | None = None

    def _check_unit(self, unit: str) -> None:
        if self.cost_unit is None:
            self.cost_unit = unit
        elif self.cost_unit != unit:
            raise ValueError(
                f"trie already holds {self.cost_unit!r} costs; filing "
                f"{unit!r} costs into the same trie would make every "
                "operator comparison meaningless — reset() it or use a "
                "separate TonicOperatorSelection for the other unit"
            )

    def reset(self) -> None:
        """Drop every learned cost and the unit (ref ``reset``
        opt/tonic.py:1459) — configuration (gamma, filter_aware,
        min_operators) survives."""
        self.root = QepsNode()
        self.cost_unit = None

    def _child_key(self, table: str, filters: Mapping[str, str] | None) -> str:
        """Trie key for the next table (ref ``_make_identifier``
        opt/tonic.py:798): the bare name, or ``name[filter]`` in
        filter-aware mode when the table carries a filter."""
        if self.filter_aware and filters:
            fp = filters.get(table)
            if fp:
                return f"{table}[{fp}]"
        return table

    # -- training -----------------------------------------------------------

    def record_plan(
        self,
        join_order: JoinTree,
        operators: dict[frozenset[str], JoinOperator],
        costs: dict[frozenset[str], float],
        *,
        filters: Mapping[str, str] | None = None,
        unit: str = "cardinality",
    ) -> None:
        """Insert one executed plan: per join step, file the used operator
        and its observed cost under the prefix node (discounted by
        ``gamma`` against earlier observations). ``unit`` names what the
        costs measure — the loop files per-join output rows
        ("cardinality"), exploration files wall-clock ("runtime") — and
        the trie refuses to mix units."""
        if costs:
            self._check_unit(unit)
        node = self.root
        start = join_order.tables()[0]
        node = node.children.setdefault(self._child_key(start, filters), QepsNode())
        for table, joined in _prefix_steps(join_order, start):
            node = node.children.setdefault(
                self._child_key(table, filters), QepsNode()
            )
            op = operators.get(joined)
            if op is not None and joined in costs:
                node.observe(op, costs[joined], self.gamma)

    # -- recommendation (the PhysicalOperatorSelection stage) ---------------

    def select_physical_operators(
        self,
        spec: QuerySpec,
        join_order: JoinTree,
        *,
        filters: Mapping[str, str] | None = None,
    ) -> PhysicalOperatorAssignment:
        assignment = PhysicalOperatorAssignment()
        start = join_order.tables()[0]
        node = self.root.children.get(self._child_key(start, filters))
        if node is None:
            return assignment  # unseen prefix — defer to Catalyst
        for table, joined in _prefix_steps(join_order, start):
            node = node.children.get(self._child_key(table, filters))
            if node is None:
                break  # prefix diverges from everything learned
            rec = node.recommendation(self.min_operators, self.gamma)
            if rec is not None:
                assignment.set_join_operator(joined, rec)
        return assignment

    # -- exploration (ref detect_unknown_costs :604, simulate_feedback :1369)

    def unknown_costs(
        self,
        join_order: JoinTree,
        *,
        candidates: Iterable[JoinOperator] = DEFAULT_CANDIDATES,
        filters: Mapping[str, str] | None = None,
    ) -> dict[frozenset[str], list[JoinOperator]]:
        """Which (prefix, operator) cells along ``join_order`` have never
        been costed — the signal an exploration run uses to pick what to
        force-execute next. Like the reference, walking an unseen path
        CREATES its trie nodes so later costs have a place to land."""
        candidates = tuple(candidates)
        out: dict[frozenset[str], list[JoinOperator]] = {}
        start = join_order.tables()[0]
        node = self.root.children.setdefault(
            self._child_key(start, filters), QepsNode()
        )
        for table, joined in _prefix_steps(join_order, start):
            node = node.children.setdefault(
                self._child_key(table, filters), QepsNode()
            )
            missing = node.missing_operators(candidates)
            if missing:
                out[joined] = missing
        return out

    def simulate_feedback(
        self,
        join_order: JoinTree,
        cost_of,
        *,
        candidates: Iterable[JoinOperator] = DEFAULT_CANDIDATES,
        filters: Mapping[str, str] | None = None,
        unit: str = "cardinality",
    ) -> int:
        """Fill every un-costed cell along ``join_order`` from a cost
        estimate instead of an execution (ref ``simulate_feedback``
        opt/tonic.py:1369 — the affordable warm-start when forcing every
        unexplored operator is too expensive). ``cost_of(joined_set,
        operator) -> float`` supplies the estimate; returns how many
        cells were filled. ``unit`` must match what the trie already
        holds (see :meth:`record_plan`)."""
        self._check_unit(unit)
        filled = 0
        unknown = self.unknown_costs(
            join_order, candidates=candidates, filters=filters
        )
        start = join_order.tables()[0]
        node = self.root.children[self._child_key(start, filters)]
        for table, joined in _prefix_steps(join_order, start):
            node = node.children[self._child_key(table, filters)]
            for op in unknown.get(joined, ()):
                node.observe(op, float(cost_of(joined, op)), self.gamma)
                filled += 1
        return filled

    # -- introspection (ref inspect, opt/tonic.py:736) -----------------------

    def inspect(self) -> str:
        """Indented dump of the learned trie: one line per node with its
        per-operator discounted costs and observation counts, the
        recommended operator starred."""
        lines: list[str] = []

        def walk(node: QepsNode, name: str, depth: int) -> None:
            rec = node.recommendation(self.min_operators, self.gamma)
            costs = ", ".join(
                f"{op.value}={node.normalized_cost(op, self.gamma):.4g}"
                f"(n={node.observations.get(op, 0)})"
                + ("*" if op is rec else "")
                for op in sorted(node.operator_costs, key=lambda o: o.value)
            )
            lines.append("  " * depth + name + (f" :: {costs}" if costs else ""))
            for child_name in sorted(node.children):
                walk(node.children[child_name], child_name, depth + 1)

        for child_name in sorted(self.root.children):
            walk(self.root.children[child_name], child_name, 0)
        return "\n".join(lines)

    # -- persistence: the train -> save -> load -> replay loop survives
    #    sessions (ref QEP-S serialization, opt/tonic.py:196-1019) ----------

    FORMAT_VERSION = 3  # v3: gamma-discounted costs (+gamma/filter_aware);
    #                      v2 (mean-cost pairs) still loads, upgraded

    def save(self, path: str) -> None:
        """Write the trie as JSON (atomic: temp file + rename, so a crashed
        writer never leaves a torn trie for the next session)."""
        payload = {
            "version": self.FORMAT_VERSION,
            "gamma": self.gamma,
            "filter_aware": self.filter_aware,
            "min_operators": self.min_operators,
            "cost_unit": self.cost_unit,
            "root": self.root.to_dict(),
        }
        tmp = f"{path}.tmp"
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "TonicOperatorSelection":
        with open(path) as fh:
            payload = json.load(fh)
        version = payload.get("version")
        if version not in (2, cls.FORMAT_VERSION):
            raise ValueError(
                f"unsupported QEP-S trie version {version!r} in {path}"
            )
        selection = cls(
            filter_aware=bool(payload.get("filter_aware", False)),
            gamma=float(payload.get("gamma", 0.8)),
            min_operators=int(payload.get("min_operators", 1)),
        )
        selection.cost_unit = payload.get("cost_unit")
        selection.root = QepsNode.from_dict(
            payload["root"], legacy_mean=(version == 2), gamma=selection.gamma
        )
        return selection
