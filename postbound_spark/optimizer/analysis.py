"""Plan-space analysis utilities.

Mirrors the reference's ``opt/_analysis.py``: ``possible_plans_bound``
(:30 — size of the join-order search space), join-tree similarity
(:241-371), and plan diffing (:562). Pure Python over our artifacts;
research bookkeeping, no Spark involvement.
"""

from __future__ import annotations

import math

from postbound_spark.optimizer.jointree import JoinTree
from postbound_spark.optimizer.stages import QuerySpec


def possible_plans_bound(spec: QuerySpec, shape: str = "bushy") -> int:
    """Upper bound on the number of join orders (ref ``:30``): n! for
    left-deep trees, n! · C(n-1) (Catalan) for bushy — the clique-graph
    worst case; the true count for sparser graphs is lower."""
    n = len(spec.tables)
    if n == 0:
        return 0
    if shape == "left-deep":
        return math.factorial(n)
    catalan = math.comb(2 * (n - 1), n - 1) // n if n > 0 else 1
    return math.factorial(n) * catalan


def jointree_similarity(a: JoinTree, b: JoinTree) -> float:
    """Containment similarity of the two trees' intermediate-result sets
    (the reference's bottom-up similarity idea, ``:241``): |common
    intermediates| / |intermediates|. 1.0 iff identical shapes over the
    same tables (modulo commutativity — sides are unordered here, like the
    reference's default)."""
    ia = {frozenset(j.tables()) for j in a.joins()}
    ib = {frozenset(j.tables()) for j in b.joins()}
    if not ia and not ib:
        return 1.0
    return len(ia & ib) / max(len(ia), len(ib))


def plan_diff(a: JoinTree, b: JoinTree) -> dict[str, list[frozenset[str]]]:
    """Intermediates unique to each plan (ref plan diffing ``:562``)."""
    ia = {frozenset(j.tables()) for j in a.joins()}
    ib = {frozenset(j.tables()) for j in b.joins()}
    return {
        "only_left": sorted(ia - ib, key=sorted),
        "only_right": sorted(ib - ia, key=sorted),
        "shared": sorted(ia & ib, key=sorted),
    }
