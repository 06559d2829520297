"""Query-level optimization pre-checks over the qal IR.

Re-expresses the reference's validation catalog
(rbergm/PostBOUND ``postbound/validation.py:219-711`` — e.g.
``EquiJoinPreCheck`` :464, ``DependentSubqueryPreCheck`` :631): each check
inspects a *parsed query* and reports whether the optimizer stages can
handle its shape. The spec-level :class:`~postbound_spark.optimizer.stages.
EquiJoinPreCheck` guards the stage pipeline; these guards sit one layer
earlier, at the SQL front door, so a research loop can skip/flag queries
before any statistics work happens (exactly where the reference runs them,
``_pipelines.py:985-988``).
"""

from __future__ import annotations

from dataclasses import dataclass

from postbound_spark.plans import qal as Q

__all__ = [
    "QueryPreCheckResult",
    "QueryPreCheck",
    "ImplicitQueryPreCheck",
    "EquiJoinQueryPreCheck",
    "DependentSubqueryPreCheck",
    "SetQueryPreCheck",
    "CompositePreCheck",
    "default_prechecks",
]


@dataclass(frozen=True)
class QueryPreCheckResult:
    """ref ``PreCheckResult`` shape: passed flag + failure reasons."""

    passed: bool
    reasons: tuple[str, ...] = ()

    @staticmethod
    def ok() -> "QueryPreCheckResult":
        return QueryPreCheckResult(True)

    @staticmethod
    def fail(*reasons: str) -> "QueryPreCheckResult":
        return QueryPreCheckResult(False, tuple(reasons))


class QueryPreCheck:
    def check(self, query: "Q.SqlQuery | Q.SetQuery") -> QueryPreCheckResult:
        raise NotImplementedError


class SetQueryPreCheck(QueryPreCheck):
    """Join-ordering stages consume a single join graph; set queries have
    two (optimize the operands separately)."""

    def check(self, query):
        if isinstance(query, Q.SetQuery):
            return QueryPreCheckResult.fail(
                "set query: optimize each operand separately"
            )
        return QueryPreCheckResult.ok()


class ImplicitQueryPreCheck(QueryPreCheck):
    """All FROM entries must be plain table references (the implicit-FROM
    SPJ shape the ordering algorithms assume — ref validation.py:219
    region)."""

    def check(self, query):
        if isinstance(query, Q.SetQuery):
            return QueryPreCheckResult.ok()
        offenders = [
            t.identifier
            for t in query.from_tables
            if not isinstance(t, Q.TableReference)
        ]
        if offenders:
            return QueryPreCheckResult.fail(
                f"non-table FROM sources: {offenders}"
            )
        return QueryPreCheckResult.ok()


class EquiJoinQueryPreCheck(QueryPreCheck):
    """Every join predicate must be a binary equality between two columns
    (ref ``EquiJoinPreCheck`` validation.py:464). Theta joins still
    *execute* (ThetaJoin → BNLJ), but bound-based ordering algorithms
    (UES) have no frequency model for them."""

    def check(self, query):
        if isinstance(query, Q.SetQuery):
            return QueryPreCheckResult.ok()
        bad: list[str] = []
        for pred in query.predicates().joins():
            is_equi = (
                isinstance(pred, Q.BinaryPredicate)
                and pred.operation is Q.LogicalOperator.EQ
                and len(pred.lhs.columns) == 1
                and len(pred.rhs.columns) == 1
            )
            if not is_equi:
                bad.append(pred.to_sql())
        if bad:
            return QueryPreCheckResult.fail(*[f"non-equi join: {b}" for b in bad])
        return QueryPreCheckResult.ok()


class DependentSubqueryPreCheck(QueryPreCheck):
    """Reject correlated (dependent) subqueries — the shape the reference's
    ``DependentSubqueryPreCheck`` (validation.py:631) guards: predicates
    referencing tables that are not part of the subquery's own FROM."""

    def check(self, query):
        if isinstance(query, Q.SetQuery):
            return QueryPreCheckResult.ok()
        reasons: list[str] = []

        def scan(q: Q.SqlQuery, ancestor_ids: frozenset[str]):
            """``ancestor_ids`` carries EVERY enclosing scope, not just the
            immediate parent: a subquery two levels down referencing the
            grandparent's table is just as dependent."""
            own = {t.identifier for t in q.from_tables} | {
                name for name, _ in q.ctes
            }
            scopes = ancestor_ids | own
            for pred in q.predicates()._leaves if q.where else []:
                sub = getattr(pred, "subquery", None)
                if isinstance(sub, Q.SqlQuery):
                    sub_own = {t.identifier for t in sub.from_tables} | {
                        name for name, _ in sub.ctes
                    }
                    for leaf in (
                        sub.predicates()._leaves if sub.where is not None else []
                    ):
                        outside = leaf.tables() - sub_own
                        if outside and outside & scopes:
                            reasons.append(
                                f"dependent subquery references {sorted(outside)}"
                            )
                    scan(sub, frozenset(scopes))

        scan(query, frozenset())
        if reasons:
            return QueryPreCheckResult.fail(*reasons)
        return QueryPreCheckResult.ok()


class CompositePreCheck(QueryPreCheck):
    """AND-combination of checks, aggregating every failure reason (the
    reference merges pre-checks the same way)."""

    def __init__(self, checks: list[QueryPreCheck]):
        self.checks = checks

    def check(self, query):
        reasons: list[str] = []
        for c in self.checks:
            result = c.check(query)
            reasons.extend(result.reasons)
        return (
            QueryPreCheckResult.fail(*reasons)
            if reasons
            else QueryPreCheckResult.ok()
        )


def default_prechecks() -> CompositePreCheck:
    """The bundle the UES-style pipelines assume (implicit SPJ, equi-joins,
    no dependent subqueries)."""
    return CompositePreCheck(
        [ImplicitQueryPreCheck(), EquiJoinQueryPreCheck(), DependentSubqueryPreCheck()]
    )
