"""Pure IR-to-IR query transformations.

Mirrors the reference's ``postbound/transform.py`` (~2450 LoC of pure
functions over the qal; SURVEY.md §2.6). The workhorses re-expressed here
over :mod:`postbound_spark.plans.qal`:

- ``as_count_star_query`` (ref ``:696``) — the cardinality ground-truthing
  wrapper (``PreciseCardinalities`` executes these);
- ``as_star_query`` (ref ``:672``);
- ``flatten_and_predicate`` (ref ``:125``);
- ``add_ec_predicates`` (ref ``:641``) — densify with equivalence-class
  joins;
- clause surgery ``add/drop/replace`` (ref ``:833/:873/:916``);
- ``remove_predicate`` (ref ``:789``);
- ``rename_table`` (ref ``:2343``).

All functions return new immutable queries; none touch Spark.
"""

from __future__ import annotations

from dataclasses import replace

from postbound_spark.plans.qal import (
    AbstractPredicate,
    BaseProjection,
    CompoundOperator,
    CompoundPredicate,
    SqlExpression,
    SqlQuery,
    TableReference,
    and_,
    star,
)


def as_star_query(query: SqlQuery) -> SqlQuery:
    """ref transform.py:672 — SELECT * with the same body."""
    return replace(query, select=(star(),), distinct=False)


def as_count_star_query(query: SqlQuery) -> SqlQuery:
    """ref transform.py:696 — SELECT COUNT(*), dropping presentation-only
    clauses (ORDER BY/LIMIT cannot change the count; GROUP BY must be
    preserved via a subquery in the reference — here we keep the common
    SPJ case and assert on it)."""
    if query.group_by:
        raise ValueError("count-star wrapping of grouped queries needs a subquery")
    return replace(
        query,
        select=(BaseProjection(SqlExpression("count(*)"), "count_star"),),
        order_by=(),
        limit=None,
        offset=None,
        distinct=False,
    )


def flatten_and_predicate(pred: AbstractPredicate) -> AbstractPredicate:
    """ref transform.py:125 — collapse nested ANDs."""
    if isinstance(pred, CompoundPredicate) and pred.operation is CompoundOperator.AND:
        children = [flatten_and_predicate(c) for c in pred.children]
        return and_(*children)
    if isinstance(pred, CompoundPredicate):
        return CompoundPredicate(
            pred.operation, tuple(flatten_and_predicate(c) for c in pred.children)
        )
    return pred


def add_ec_predicates(query: SqlQuery) -> SqlQuery:
    """ref transform.py:641 — conjoin all equivalence-class-implied
    equi-joins (already-present ones are deduplicated by SQL text)."""
    if query.where is None:
        return query
    existing = {p.to_sql() for p in query.predicates().joins()}
    extra = [
        p
        for p in query.predicates().equivalence_class_predicates()
        if p.to_sql() not in existing
    ]
    if not extra:
        return query
    return replace(query, where=and_(query.where, *extra))


def remove_predicate(query: SqlQuery, target: AbstractPredicate) -> SqlQuery:
    """ref transform.py:789 — drop one leaf predicate from the WHERE tree."""

    def prune(pred: AbstractPredicate) -> AbstractPredicate | None:
        if pred == target:
            return None
        if isinstance(pred, CompoundPredicate):
            kept = [p for p in (prune(c) for c in pred.children) if p is not None]
            if not kept:
                return None
            if len(kept) == 1 and pred.operation is not CompoundOperator.NOT:
                return kept[0]
            return CompoundPredicate(pred.operation, tuple(kept))
        return pred

    return replace(query, where=prune(query.where) if query.where else None)


def add_where(query: SqlQuery, pred: AbstractPredicate) -> SqlQuery:
    """ref transform.py:833 (add_clause for WHERE)."""
    new = pred if query.where is None else and_(query.where, pred)
    return replace(query, where=new)


def drop_clause(query: SqlQuery, clause: str) -> SqlQuery:
    """ref transform.py:873 — clause by name: where/group_by/having/
    order_by/limit/offset/ctes."""
    empty = {
        "where": None,
        "group_by": (),
        "having": None,
        "order_by": (),
        "limit": None,
        "offset": None,
        "ctes": (),
    }
    if clause not in empty:
        raise ValueError(f"unknown clause: {clause}")
    return replace(query, **{clause: empty[clause]})


def replace_clause(query: SqlQuery, **clauses) -> SqlQuery:
    """ref transform.py:916."""
    return replace(query, **clauses)


def rename_table(query: SqlQuery, old: str, new_alias: str) -> SqlQuery:
    """ref transform.py:2343 — re-alias one FROM entry (predicate SQL
    fragments referencing the old identifier are *not* rewritten — the
    reference rebinds its column objects; our fragments bind by alias, so
    renames are only valid before predicates reference the table)."""
    new_tables = tuple(
        replace(t, alias=new_alias) if t.identifier == old else t
        for t in query.from_tables
    )
    return replace(query, from_tables=new_tables)


def table_ref(name: str, alias: str | None = None) -> TableReference:
    return TableReference(name, alias)
