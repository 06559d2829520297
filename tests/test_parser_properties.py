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


@st.composite
def outer_join_query(draw):
    """SqlQuery with an explicit outer-join chain (round-2 surface)."""
    base = TABLES[0]
    n_joins = draw(st.integers(1, 2))
    joins = []
    for i in range(1, n_joins + 1):
        src = TABLES[i]
        # a leading INNER/CROSS link normalizes into the implicit FROM (by
        # design); only outer/natural links start an explicit chain
        first_kinds = [
            Q.JoinType.LEFT, Q.JoinType.RIGHT, Q.JoinType.FULL, Q.JoinType.NATURAL,
        ]
        later_kinds = first_kinds + [Q.JoinType.CROSS]
        jt = draw(st.sampled_from(first_kinds if i == 1 else later_kinds))
        cond = None
        if not jt.natural and jt is not Q.JoinType.CROSS:
            cond = Q.eq(
                draw(column_expr([base])), draw(column_expr([src]))
            )
        joins.append(Q.JoinedTable(jt, src, cond))
    select = (Q.BaseProjection(draw(column_expr([base])), "c0"),)
    return Q.SqlQuery(select=select, from_tables=(base,), joins=tuple(joins))


@settings(max_examples=80, deadline=None)
@given(outer_join_query())
def test_outer_join_fixpoint(query):
    q1 = parse_query(query.to_sql())
    q2 = parse_query(q1.to_sql())
    assert q1 == q2
    assert [j.join_type for j in q1.joins] == [j.join_type for j in query.joins]
    assert q1.tables() == query.tables()


@st.composite
def distinct_on_query(draw):
    base = TABLES[0]
    key = draw(column_expr([base]))
    tiebreak = draw(column_expr([base]))
    return Q.SqlQuery(
        select=(
            Q.BaseProjection(key, "k"),
            Q.BaseProjection(tiebreak, "v"),
        ),
        from_tables=(base,),
        distinct_on=(key,),
        order_by=(
            Q.OrderByExpression(key, True, None),
            Q.OrderByExpression(tiebreak, draw(st.booleans()), None),
        ),
    )


@settings(max_examples=50, deadline=None)
@given(distinct_on_query())
def test_distinct_on_fixpoint(query):
    q1 = parse_query(query.to_sql())
    assert parse_query(q1.to_sql()) == q1
    assert len(q1.distinct_on) == 1 and not q1.distinct


def test_truncated_inputs_fail_controlled_never_crash():
    """Parser robustness: random prefixes of valid queries either parse
    (a prefix can be complete SQL) or raise the parser's own error types
    — never an internal IndexError/AttributeError/RecursionError. 600
    fragments per run."""
    import random

    from postbound_spark.plans.parser import UnsupportedSqlError, parse_query
    from postbound_spark.querygen import QueryGenerator

    rng = random.Random(42)
    crashes = []
    for _label, sql in QueryGenerator(seed=77).generate(150).items():
        for _ in range(4):
            frag = sql[: rng.randrange(5, len(sql))]
            try:
                parse_query(frag)
            except (UnsupportedSqlError, ValueError):
                pass  # controlled rejection
            except Exception as exc:  # pragma: no cover - the regression
                crashes.append((type(exc).__name__, frag[-60:]))
    assert not crashes, crashes[:5]


def test_mutated_inputs_fail_controlled_never_crash():
    """Single-character mutations of valid queries (the complement of the
    truncation sweep above): parse or controlled rejection, never an
    internal crash."""
    import random
    import string

    from postbound_spark.plans.parser import UnsupportedSqlError, parse_query
    from postbound_spark.querygen import QueryGenerator

    rng = random.Random(7)
    crashes = []
    for _label, sql in QueryGenerator(seed=88).generate(150).items():
        for _ in range(4):
            pos = rng.randrange(len(sql))
            ch = rng.choice(string.ascii_letters + "()',.%*= ")
            frag = sql[:pos] + ch + sql[pos + 1 :]
            try:
                parse_query(frag)
            except (UnsupportedSqlError, ValueError):
                pass
            except Exception as exc:  # pragma: no cover - the regression
                crashes.append((type(exc).__name__, frag[:80]))
    assert not crashes, crashes[:5]


@st.composite
def named_window_query(draw):
    """Queries with 1-3 named windows referenced by 1-4 window calls —
    the WINDOW-clause inlining must be a fixpoint whatever the
    name/reference pattern (incl. names that are prefixes of each other,
    the round-6 marker-collision regression)."""
    tables = [TABLES[1]]  # orders
    names = draw(
        st.lists(
            st.sampled_from(["w", "win", "w2", "w_x", "wx"]),
            min_size=1, max_size=3, unique=True,
        )
    )
    defs = []
    for nm in names:
        part = draw(st.sampled_from(["", "PARTITION BY o.o_custkey "]))
        key = draw(st.sampled_from(["o.o_orderkey", "o.o_totalprice"]))
        defs.append(f"{nm} AS ({part}ORDER BY {key})")
    fns = draw(
        st.lists(
            st.sampled_from(["rank()", "dense_rank()", "row_number()",
                             "sum(o.o_totalprice)"]),
            min_size=1, max_size=4,
        )
    )
    items = ", ".join(
        f"{fn} OVER {draw(st.sampled_from(names))} AS a{i}"
        for i, fn in enumerate(fns)
    )
    return (
        f"SELECT o.o_orderkey, {items} FROM orders o WINDOW {', '.join(defs)}"
    )


@settings(max_examples=120, deadline=None)
@given(named_window_query())
def test_named_window_inlining_fixpoint(sql):
    """Every OVER reference inlines its definition, no marker survives,
    and the rendered SQL is a parse fixpoint."""
    q1 = parse_query(sql)
    rendered = q1.to_sql()
    assert "WINDOW" not in rendered and "\x00" not in rendered
    assert "OVER (" in rendered
    q2 = parse_query(rendered)
    assert q1 == q2


@st.composite
def ansi_call_query(draw):
    """The keyword-argument call forms mixed with their comma twins."""
    col = draw(st.sampled_from(["c_name", "c_mktsegment"]))
    call = draw(
        st.sampled_from(
            [
                f"POSITION('a' IN {col})",
                f"position('a', {col})",
                f"substring({col} FROM 2 FOR 3)",
                f"substring({col} FROM 2)",
                f"substring({col}, 2, 3)",
                f"TRIM(BOTH 'x' FROM {col})",
                f"TRIM(LEADING 'x' FROM {col})",
                f"TRIM(BOTH FROM {col})",
                f"TRIM('x' FROM {col})",
                f"trim({col})",
            ]
        )
    )
    bool_test = draw(
        st.sampled_from(
            [
                "",
                " WHERE (c_acctbal > 0) IS TRUE",
                " WHERE (c_acctbal > 0) IS NOT UNKNOWN",
                " WHERE c_acctbal IS NOT NULL",
            ]
        )
    )
    return f"SELECT {call} AS v FROM customer{bool_test}"


@settings(max_examples=120, deadline=None)
@given(ansi_call_query())
def test_ansi_call_forms_fixpoint(sql):
    q1 = parse_query(sql)
    q2 = parse_query(q1.to_sql())
    assert q1 == q2
    assert q1.to_sql() == q2.to_sql()
