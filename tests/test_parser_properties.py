"""Property-based parser tests (hypothesis): generate random qal IR queries,
render them, and assert the parser reaches a fixpoint and preserves the
predicate structure. The reference relies on hand-enumerated round-trip
cases (tests/test_qal.py:437-600); generation covers the combinatorial
space those cases sample."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from postbound_spark.plans import qal as Q
from postbound_spark.plans.parser import parse_query

TABLES = [
    Q.TableReference("customer", "c"),
    Q.TableReference("orders", "o"),
    Q.TableReference("nation", "n"),
]
COLUMNS = {
    "c": ["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    "o": ["o_orderkey", "o_custkey", "o_totalprice"],
    "n": ["n_nationkey", "n_name"],
}


@st.composite
def column_expr(draw, tables):
    tab = draw(st.sampled_from(tables))
    name = draw(st.sampled_from(COLUMNS[tab.alias]))
    return Q.col(name, tab)


@st.composite
def literal_expr(draw):
    value = draw(
        st.one_of(
            st.integers(-1000, 1000),
            st.sampled_from(["BUILDING", "ASIA", "x'y", "a%b"]),
            st.booleans(),
            st.none(),
        )
    )
    return Q.lit(value)


@st.composite
def arith_expr(draw, tables):
    left = draw(column_expr(tables))
    right = draw(st.one_of(literal_expr(), column_expr(tables)))
    op = draw(st.sampled_from(["+", "-", "*"]))
    return Q.SqlExpression(
        f"{left.to_sql()} {op} {right.to_sql()}", left.columns + right.columns
    )


@st.composite
def simple_predicate(draw, tables):
    kind = draw(st.sampled_from(["binary", "between", "in", "null"]))
    expr = draw(column_expr(tables))
    if kind == "binary":
        op = draw(st.sampled_from(list(Q.LogicalOperator)))
        if op in (Q.LogicalOperator.LIKE, Q.LogicalOperator.NOT_LIKE,
                  Q.LogicalOperator.ILIKE, Q.LogicalOperator.NOT_ILIKE):
            rhs = Q.lit("%x%")
        else:
            rhs = draw(st.one_of(literal_expr(), column_expr(tables)))
        return Q.BinaryPredicate(op, expr, rhs)
    if kind == "between":
        lo = draw(st.integers(-100, 0))
        hi = draw(st.integers(1, 100))
        return Q.BetweenPredicate(expr, Q.lit(lo), Q.lit(hi))
    if kind == "in":
        values = tuple(
            Q.lit(v) for v in draw(st.lists(st.integers(0, 9), min_size=1, max_size=3))
        )
        negated = draw(st.booleans())
        return Q.InPredicate(expr, values=values, negated=negated)
    op = draw(st.sampled_from([Q.UnaryOperation.IS_NULL, Q.UnaryOperation.IS_NOT_NULL]))
    return Q.UnaryPredicate(op, expr)


@st.composite
def predicate(draw, tables, depth=2):
    if depth == 0 or draw(st.booleans()):
        return draw(simple_predicate(tables))
    kind = draw(st.sampled_from(["and", "or", "not"]))
    if kind == "not":
        return Q.CompoundPredicate(
            Q.CompoundOperator.NOT, (draw(predicate(tables, depth - 1)),)
        )
    children = tuple(
        draw(st.lists(predicate(tables, depth - 1), min_size=2, max_size=3))
    )
    if kind == "and":
        return Q.and_(*children)
    return Q.CompoundPredicate(Q.CompoundOperator.OR, children)


@st.composite
def sql_query(draw):
    n_tables = draw(st.integers(1, 3))
    tables = TABLES[:n_tables]
    n_proj = draw(st.integers(1, 3))
    select = []
    for i in range(n_proj):
        expr = draw(st.one_of(column_expr(tables), arith_expr(tables)))
        alias = f"col{i}" if draw(st.booleans()) or " " in expr.sql else None
        select.append(Q.BaseProjection(expr, alias))
    where = draw(st.one_of(st.none(), predicate(tables)))
    order_by = tuple(
        Q.OrderByExpression(
            draw(column_expr(tables)),
            draw(st.booleans()),
            draw(st.sampled_from([None, True, False])),
        )
        for _ in range(draw(st.integers(0, 2)))
    )
    limit = draw(st.one_of(st.none(), st.integers(1, 100)))
    return Q.SqlQuery(
        select=tuple(select),
        from_tables=tuple(tables),
        where=where,
        order_by=order_by,
        limit=limit,
        distinct=draw(st.booleans()),
    )


@settings(max_examples=150, deadline=None)
@given(sql_query())
def test_parser_fixpoint(query):
    """parse(render(q)) reaches a fixpoint after one round."""
    q1 = parse_query(query.to_sql())
    q2 = parse_query(q1.to_sql())
    assert q1 == q2


@settings(max_examples=150, deadline=None)
@given(sql_query())
def test_parser_preserves_predicate_structure(query):
    """Join/filter leaf counts and table sets survive the round trip."""
    q1 = parse_query(query.to_sql())
    assert q1.tables() == query.tables()
    p0, p1 = query.predicates(), q1.predicates()
    assert len(p0.joins()) == len(p1.joins())
    assert len(p0.filters()) == len(p1.filters())
    assert q1.limit == query.limit
    assert q1.distinct == query.distinct
    assert len(q1.order_by) == len(query.order_by)
