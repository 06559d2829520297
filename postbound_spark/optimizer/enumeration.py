"""Join-order enumerators: exhaustive and randomized.

Mirrors the reference's ``opt/enumeration.py`` (:109 all join orders as a
generator) and ``opt/randomized.py`` (:131 uniform random bushy trees).
Both respect the join graph (no cross products unless the graph is
disconnected) and emit :class:`JoinTree` artifacts for the compiler.
Random choice is seeded-``random.Random`` based — reproducible, never
global-state RNG.
"""

from __future__ import annotations

import random
from typing import Iterator

from postbound_spark.optimizer.joingraph import JoinGraph
from postbound_spark.optimizer.jointree import JoinTree
from postbound_spark.optimizer.stages import QuerySpec


def all_linear_join_orders(spec: QuerySpec) -> Iterator[JoinTree]:
    """Every connected left-deep order (ref ``opt/enumeration.py:109``).
    Generator — callers prune; the space is n! in the worst case."""

    def extend(order: list[str], graph: JoinGraph) -> Iterator[list[str]]:
        if not graph.free_tables():
            yield order
            return
        nexts = sorted(
            {t for e in graph.available_joins() for t in e.tables() if t in graph.free_tables()}
        )
        if not nexts:  # disconnected graph: allow any free table (cross product)
            nexts = sorted(graph.free_tables())
        for t in nexts:
            sub = JoinGraph(graph.tables, graph.edges)
            for j in graph.joined_tables() | {t}:
                sub.mark_joined(j)
            yield from extend(order + [t], sub)

    for start in sorted(spec.tables):
        graph = spec.join_graph()
        graph.mark_joined(start)
        yield from (JoinTree.left_deep(o) for o in extend([start], graph))


def random_bushy_join_order(spec: QuerySpec, seed: int = 0) -> JoinTree:
    """Uniform-ish random bushy tree over connected components (ref
    ``opt/randomized.py:131``): repeatedly merge two joinable subtrees."""
    rng = random.Random(seed)
    graph = spec.join_graph()
    forests: dict[frozenset[str], JoinTree] = {
        frozenset((t,)): JoinTree.leaf(t) for t in spec.tables
    }
    while len(forests) > 1:
        keys = sorted(forests, key=sorted)
        pairs = [
            (a, b)
            for i, a in enumerate(keys)
            for b in keys[i + 1 :]
            if any(len(e.tables() & a) == 1 and len(e.tables() & b) == 1 for e in spec.edges)
        ]
        if not pairs:  # disconnected: merge arbitrary components
            pairs = [(keys[0], keys[1])]
        a, b = pairs[rng.randrange(len(pairs))]
        if rng.random() < 0.5:
            a, b = b, a
        forests[a | b] = JoinTree.join(forests.pop(a), forests.pop(b))
    return next(iter(forests.values()))


def all_operator_assignments(
    spec: QuerySpec, tree: JoinTree, operators: list | None = None
) -> Iterator:
    """Every physical-operator assignment for the joins of ``tree`` (ref
    ``opt/enumeration.py:209`` all operator assignments as a generator).
    Cartesian product of the operator vocabulary over the tree's joins —
    callers prune; the space is |ops|^n_joins."""
    from itertools import product

    from postbound_spark.optimizer.hints import (
        JoinOperator,
        PhysicalOperatorAssignment,
    )

    ops = operators or [
        JoinOperator.BROADCAST_HASH,
        JoinOperator.SHUFFLE_HASH,
        JoinOperator.SORT_MERGE,
    ]
    intermediates = [frozenset(j.tables()) for j in tree.joins()]
    for combo in product(ops, repeat=len(intermediates)):
        assignment = PhysicalOperatorAssignment()
        for tables, op in zip(intermediates, combo):
            assignment.set_join_operator(tables, op)
        yield assignment


def random_operator_assignment(
    spec: QuerySpec, tree: JoinTree, seed: int = 0, operators: list | None = None
):
    """Uniform random operator assignment for ``tree``'s joins (ref
    ``opt/randomized.py:288``)."""
    from postbound_spark.optimizer.hints import (
        JoinOperator,
        PhysicalOperatorAssignment,
    )

    rng = random.Random(seed)
    ops = operators or [
        JoinOperator.BROADCAST_HASH,
        JoinOperator.SHUFFLE_HASH,
        JoinOperator.SORT_MERGE,
    ]
    assignment = PhysicalOperatorAssignment()
    for j in tree.joins():
        assignment.set_join_operator(frozenset(j.tables()), rng.choice(ops))
    return assignment


def random_plan(spec: QuerySpec, seed: int = 0):
    """Random (join order, operator assignment) pair — the reference's
    random *plan* sampler (``opt/randomized.py:456-582``)."""
    tree = random_bushy_join_order(spec, seed)
    return tree, random_operator_assignment(spec, tree, seed)
