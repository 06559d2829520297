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
- ``rename_table`` (ref ``:2343``);
- ``replace_expressions`` (ref ``:1208``) + ``rename_columns_in_query``
  (ref ``:1336``) and ``merge_tables`` (ref ``:2419``) built on it;
- ``extract_query_fragment`` (ref ``:296``) / ``expand_to_query``
  (ref ``:500``) / ``move_into_subquery`` (ref ``:519``);
- ``as_explain`` / ``as_explain_analyze`` (ref ``:749``/``:772``).

- ``add_clause`` (ref ``:833``) and ``explicit_to_implicit`` (ref ``:172``,
  for IR-built INNER/CROSS chains — the parser normalizes inline; outer
  joins refuse, their semantics cannot move into WHERE).

Not carried over: ``drop_hints`` (ref ``:720``) — hints live outside the IR
here, in ``optimizer.hints`` assignments, where dropping is plain object
surgery.

All functions return new immutable queries; none touch Spark.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterable
from dataclasses import replace

from postbound_spark.plans.qal import (
    AbstractPredicate,
    BaseProjection,
    BetweenPredicate,
    BinaryPredicate,
    ColumnReference,
    CompoundOperator,
    CompoundPredicate,
    InPredicate,
    LogicalOperator,
    SqlExpression,
    SqlQuery,
    TableReference,
    UnaryPredicate,
    and_,
    star,
)


def as_star_query(query: SqlQuery) -> SqlQuery:
    """ref transform.py:672 — SELECT * with the same body."""
    return replace(query, select=(star(),), distinct=False)


def as_count_star_query(query: SqlQuery) -> SqlQuery:
    """ref transform.py:696 — the cardinality ground-truthing wrapper.

    Plain SPJ queries rewrite in place (ORDER BY drops — it cannot change
    the count). Clauses that DO change the result count — GROUP BY,
    DISTINCT [ON], LIMIT, OFFSET — are preserved by counting over the
    original query as a CTE body instead of being silently dropped
    (``SELECT DISTINCT x ... LIMIT 3`` must count min(3, #distinct), not
    the raw row count)."""
    count_select = (BaseProjection(SqlExpression("count(*)"), "count_star"),)
    count_changing = (
        query.group_by
        or query.distinct
        or query.distinct_on
        or query.limit is not None
        or query.offset is not None
    )
    if count_changing:
        return SqlQuery(
            select=count_select,
            from_tables=(TableReference("__count_base", virtual=True),),
            ctes=(("__count_base", query),),
        )
    return replace(
        query,
        select=count_select,
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


def replace_predicate(
    query: SqlQuery,
    target: AbstractPredicate,
    replacement: AbstractPredicate,
) -> SqlQuery:
    """ref transform.py:1281 — swap one predicate (leaf OR compound
    subtree) for another, in both WHERE and HAVING. Matching is by value
    equality on the IR; like the reference, the replacement may be a
    different predicate type entirely (e.g. a conjunction in place of a
    single join condition), the rewrite is top-level only (subqueries and
    CTE bodies are untouched), and a missing target is a no-op."""

    def swap(pred: AbstractPredicate | None) -> AbstractPredicate | None:
        if pred is None:
            return None
        if pred == target:
            return replacement
        if isinstance(pred, CompoundPredicate):
            return CompoundPredicate(
                pred.operation, tuple(swap(c) for c in pred.children)
            )
        return pred

    return replace(query, where=swap(query.where), having=swap(query.having))


def add_where(query: SqlQuery, pred: AbstractPredicate) -> SqlQuery:
    """ref transform.py:833 (add_clause for WHERE) — thin delegate."""
    return add_clause(query, "where", pred)


def add_clause(query: SqlQuery, clause: str, value) -> SqlQuery:
    """ref transform.py:833 — generic named-clause insertion. WHERE and
    HAVING merge conjunctively with an existing predicate (the reference's
    behavior for re-addable clauses); everything else replaces."""
    if clause in ("where", "having"):
        current = getattr(query, clause)
        value = value if current is None else and_(current, value)
    elif not hasattr(query, clause):
        raise ValueError(f"unknown clause: {clause}")
    return replace(query, **{clause: value})


def explicit_to_implicit(query: SqlQuery) -> SqlQuery:
    """ref transform.py:172 — JOIN … ON chains to comma FROM + WHERE.

    The parser already normalizes INNER/CROSS joins inline; this standalone
    rewrite handles queries carrying an explicit ``joins`` chain (from IR
    construction or mutation). Only INNER/CROSS links are convertible —
    outer/natural semantics cannot move into WHERE, matching the
    reference's scope (it predates outer-join modeling too)."""
    from postbound_spark.plans.qal import JoinType

    if not query.joins:
        return query
    tables = list(query.from_tables)
    preds = []
    for j in query.joins:
        if getattr(j, "using", ()):
            # USING merges its key columns into ONE output column; a WHERE
            # equality keeps both and changes the star projection —
            # dropping the list silently would cross-product the join
            raise ValueError(
                "JOIN ... USING cannot be normalized to implicit form "
                "(the merged-key output column has no WHERE equivalent)"
            )
        if j.join_type is JoinType.INNER:
            if j.condition is not None:
                preds.append(j.condition)
        elif j.join_type is not JoinType.CROSS:
            raise ValueError(
                f"{j.join_type.value} cannot be normalized to implicit form"
            )
        tables.append(j.source)
    where = query.where
    for p in preds:
        where = p if where is None else and_(where, p)
    return replace(query, from_tables=tuple(tables), joins=(), where=where)


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


def _reject_explicit_joins(query: SqlQuery, op: str) -> None:
    """FROM-rebuilding transforms predate the explicit-join chain; applying
    them across an outer join would silently drop or re-associate the
    joined sources, so they refuse instead (normalize inner chains with
    :func:`explicit_to_implicit` first)."""
    if query.joins:
        raise ValueError(
            f"{op} does not support queries with an explicit join chain; "
            "apply explicit_to_implicit first (outer joins cannot be "
            "restructured this way)"
        )


def rename_table(query: SqlQuery, old: str, new_alias: str) -> SqlQuery:
    """ref transform.py:2343 — re-alias one FROM entry (predicate SQL
    fragments referencing the old identifier are *not* rewritten — the
    reference rebinds its column objects; our fragments bind by alias, so
    renames are only valid before predicates reference the table)."""
    _reject_explicit_joins(query, "rename_table")
    new_tables = tuple(
        replace(t, alias=new_alias) if t.identifier == old else t
        for t in query.from_tables
    )
    return replace(query, from_tables=new_tables)


def table_ref(name: str, alias: str | None = None) -> TableReference:
    return TableReference(name, alias)


# ---------------------------------------------------------------------------
# expression-level rewrites (ref transform.py:1208 replace_expressions and
# the rename/merge helpers built on it)
# ---------------------------------------------------------------------------


def replace_expressions(
    query: SqlQuery, fn: Callable[[SqlExpression], SqlExpression]
) -> SqlQuery:
    """ref transform.py:1208 — apply ``fn`` to every expression in every
    clause (select, where, group by, having, order by). CTE bodies are
    left untouched — they are separate query scopes."""

    def pred(p: AbstractPredicate | None) -> AbstractPredicate | None:
        if p is None:
            return None
        if isinstance(p, BinaryPredicate):
            return replace(p, lhs=fn(p.lhs), rhs=fn(p.rhs))
        if isinstance(p, BetweenPredicate):
            return replace(p, expr=fn(p.expr), lower=fn(p.lower), upper=fn(p.upper))
        if isinstance(p, InPredicate):
            return replace(p, expr=fn(p.expr), values=tuple(fn(v) for v in p.values))
        if isinstance(p, UnaryPredicate):
            return replace(p, expr=fn(p.expr)) if p.expr is not None else p
        if isinstance(p, CompoundPredicate):
            return replace(p, children=tuple(pred(c) for c in p.children))
        return p

    return replace(
        query,
        select=tuple(replace(bp, expr=fn(bp.expr)) for bp in query.select),
        where=pred(query.where),
        group_by=tuple(fn(e) for e in query.group_by),
        having=pred(query.having),
        order_by=tuple(replace(o, expr=fn(o.expr)) for o in query.order_by),
    )


def _sub_ref(sql: str, old: ColumnReference, new: ColumnReference) -> str:
    """Replace one column reference inside a SQL fragment. The guards keep a
    bare name from matching inside ``other.name`` or a longer identifier."""
    return re.sub(
        rf"(?<![\w.]){re.escape(old.to_sql())}(?![\w])", new.to_sql(), sql
    )


def rename_columns_in_query(query: SqlQuery, mapping: dict[str, str]) -> SqlQuery:
    """ref transform.py:1336 — rename columns by name everywhere they are
    referenced (SQL fragments are rewritten reference-by-reference)."""

    def rw(e: SqlExpression) -> SqlExpression:
        sql, cols = e.sql, []
        for c in e.columns:
            if c.name in mapping:
                nc = ColumnReference(mapping[c.name], c.table)
                sql = _sub_ref(sql, c, nc)
                cols.append(nc)
            else:
                cols.append(c)
        return SqlExpression(sql, tuple(cols))

    return replace_expressions(query, rw)


def merge_tables(query: SqlQuery, keep: str, merge: str) -> SqlQuery:
    """ref transform.py:2419 — collapse FROM entry ``merge`` into ``keep``
    (self-join elimination): every ``merge``-qualified reference is
    re-bound to ``keep``, ``merge`` leaves the FROM list, and predicates
    that the rewrite turned into trivial self-equalities (``x = x``) are
    dropped."""
    _reject_explicit_joins(query, "merge_tables")
    keep_ref = next(t for t in query.from_tables if t.identifier == keep)

    def rw(e: SqlExpression) -> SqlExpression:
        sql, cols = e.sql, []
        for c in e.columns:
            if c.table and c.table.identifier == merge:
                nc = ColumnReference(c.name, keep_ref)
                sql = _sub_ref(sql, c, nc)
                cols.append(nc)
            else:
                cols.append(c)
        return SqlExpression(sql, tuple(cols))

    merged = replace_expressions(query, rw)
    merged = replace(
        merged,
        from_tables=tuple(t for t in merged.from_tables if t.identifier != merge),
    )
    if merged.where is not None:
        for leaf in list(merged.where.conjuncts()):
            if (
                isinstance(leaf, BinaryPredicate)
                and leaf.operation is LogicalOperator.EQ
                and leaf.lhs.to_sql() == leaf.rhs.to_sql()
            ):
                merged = remove_predicate(merged, leaf)
    return merged


# ---------------------------------------------------------------------------
# query-structure rewrites
# ---------------------------------------------------------------------------


def extract_query_fragment(query: SqlQuery, tables: Iterable[str]) -> SqlQuery:
    """ref transform.py:296 — the SPJ sub-query touching only ``tables``:
    their FROM entries plus every WHERE leaf fully covered by them
    (table-free leaves — pure constants — are kept). Presentation and
    aggregation clauses do not survive fragment extraction."""
    _reject_explicit_joins(query, "extract_query_fragment")
    wanted = {t.lower() for t in tables}
    from_tables = tuple(t for t in query.from_tables if t.identifier in wanted)
    if not from_tables:
        raise ValueError(f"no FROM entry matches {sorted(wanted)}")
    kept: list[AbstractPredicate] = []
    if query.where is not None:
        kept = [p for p in query.where.conjuncts() if p.tables() <= wanted]
    return SqlQuery(
        select=(star(),),
        from_tables=from_tables,
        where=and_(*kept) if kept else None,
        ctes=query.ctes,
    )


def expand_to_query(pred: AbstractPredicate) -> SqlQuery:
    """ref transform.py:500 — the minimal query evaluating ``pred``:
    SELECT * over exactly the tables it references."""
    refs: dict[str, TableReference] = {}
    for c in pred.columns():
        if c.table is not None:
            refs.setdefault(c.table.identifier, c.table)
    if not refs:
        raise ValueError("predicate references no tables")
    return SqlQuery(
        select=(star(),),
        from_tables=tuple(refs[k] for k in sorted(refs)),
        where=pred,
    )


def move_into_subquery(query: SqlQuery, table: str) -> SqlQuery:
    """ref transform.py:519 — push one FROM entry and its single-table
    filters into a CTE named after the table's identifier. Outer
    references keep resolving because the CTE inherits the identifier;
    Catalyst then plans the CTE body as a filtered scan, i.e. the filters
    are applied "inside the subquery" exactly as the reference describes.
    """
    _reject_explicit_joins(query, "move_into_subquery")
    target = next(t for t in query.from_tables if t.identifier == table)
    moved: list[AbstractPredicate] = []
    remaining = query
    if query.where is not None:
        moved = [
            p
            for p in query.where.conjuncts()
            if p.tables() == {target.identifier}
        ]
        for p in moved:
            remaining = remove_predicate(remaining, p)
    body = SqlQuery(
        select=(star(),),
        from_tables=(target,),
        where=and_(*moved) if moved else None,
    )
    return replace(
        remaining,
        from_tables=tuple(
            TableReference(t.identifier, virtual=True) if t.identifier == table else t
            for t in remaining.from_tables
        ),
        ctes=remaining.ctes + ((target.identifier, body),),
    )


# ---------------------------------------------------------------------------
# EXPLAIN wrappers (ref transform.py:749/:772)
# ---------------------------------------------------------------------------


def as_explain(query: SqlQuery, mode: str = "FORMATTED") -> str:
    """ref transform.py:749 — EXPLAIN SQL text. Spark modes: FORMATTED,
    EXTENDED, COST, CODEGEN (COST is the closest to the reference's
    cardinality-bearing EXPLAIN)."""
    return f"EXPLAIN {mode.upper()}\n{query.to_sql()}"


def as_explain_analyze(query: SqlQuery) -> str:
    """ref transform.py:772 — Spark has no EXPLAIN ANALYZE statement; the
    equivalent protocol is run-then-introspect (execute the query, read
    per-operator metrics off ``df.queryExecution``), which
    ``optimizer.qep.executed_plan`` implements. The returned text is the
    plan-with-costs form, the closest single-statement analog."""
    return as_explain(query, mode="COST")


def drop_hints(query: SqlQuery) -> SqlQuery:
    """Strip the hint block (ref ``drop_hints`` transform.py:720)."""
    return replace(query, hint=None)


def add_hint(query: SqlQuery, hint: str) -> SqlQuery:
    """Attach/replace the hint block (the enforcement text a pipeline's
    hint-generation step produces — ref ``generate_hints``
    _pipelines.py:1016)."""
    return replace(query, hint=hint)
