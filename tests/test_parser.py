"""Parser + algebra tests, mirroring the reference's ParserTests feature
matrix (rbergm/PostBOUND tests/test_qal.py:437-600) and its SQL→relalg
conversion tests (tests/test_relalg.py), plus the round-trip property
parse→str→parse the reference asserts throughout."""

from __future__ import annotations

import duckdb
import pytest

from postbound_spark.catalog import load_tables
from postbound_spark.operators.compiler import compile_plan
from postbound_spark.plans import qal as Q
from postbound_spark.plans import relalg as ra
from postbound_spark.plans.algebra import _find_agg_calls, parse_relalg
from postbound_spark.plans.parser import (
    ParserError,
    UnsupportedSqlError,
    parse_query,
    to_query_spec,
)

# ---------------------------------------------------------------------------
# parser feature matrix (ref ParserTests tests/test_qal.py:437-600)
# ---------------------------------------------------------------------------

ROUNDTRIP_CASES = [
    "SELECT * FROM customer",
    "SELECT c.*, o.o_orderkey FROM customer c, orders o WHERE c.c_custkey = o.o_custkey",
    "SELECT c_name AS name FROM customer WHERE c_acctbal BETWEEN 0 AND 100",
    "SELECT c_name FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')",
    "SELECT c_name FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)",
    "SELECT c_name FROM customer c WHERE EXISTS (SELECT * FROM orders o WHERE o.o_custkey = c.c_custkey)",
    "SELECT c_name FROM customer WHERE c_comment LIKE '%x%' OR c_comment NOT ILIKE '%y%'",
    "SELECT c_name FROM customer WHERE c_acctbal IS NOT NULL",
    "SELECT c_name FROM customer WHERE c_mktsegment IS DISTINCT FROM 'BUILDING'",
    "SELECT CASE WHEN c_acctbal > 0 THEN 'p' ELSE 'n' END AS s FROM customer",
    "SELECT CASE c_mktsegment WHEN 'BUILDING' THEN 1 ELSE 0 END AS b FROM customer",
    "SELECT CAST(c_acctbal AS numeric(12, 2)) AS bal FROM customer",
    "SELECT c_acctbal::int AS bal FROM customer",
    "SELECT count(DISTINCT c_nationkey) AS n FROM customer",
    "SELECT sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F') AS f_total FROM orders",
    "SELECT row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC) AS rn FROM orders",
    "SELECT extract(year FROM o_orderdate) AS yr FROM orders",
    "SELECT embedding[1] AS e0 FROM embeddings",
    "SELECT (SELECT max(o_totalprice) FROM orders) AS mx FROM customer",
    "SELECT c_custkey FROM customer WHERE c_acctbal > ALL (SELECT avg(o_totalprice) FROM orders)",
    "SELECT o_orderkey FROM orders WHERE o_orderdate >= DATE '1995-01-01' - INTERVAL '90' DAY",
    "WITH big AS (SELECT o_custkey FROM orders) SELECT count(*) AS n FROM big",
    "WITH a AS (SELECT 1 AS x FROM nation), b AS (SELECT 2 AS y FROM nation) SELECT a.x, b.y FROM a, b",
    "(SELECT c_custkey AS k FROM customer) UNION ALL (SELECT o_custkey AS k FROM orders) ORDER BY k LIMIT 5",
    "SELECT n_name FROM nation INTERSECT SELECT n_name FROM nation",
    "SELECT n_name FROM nation EXCEPT SELECT n_name FROM nation",
    "SELECT sub.k FROM (SELECT o_custkey AS k FROM orders) sub",
    "SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC NULLS LAST FETCH FIRST 5 ROWS ONLY",
    "SELECT o_orderkey FROM orders LIMIT 10 OFFSET 20",
    "SELECT c_name FROM customer WHERE NOT (c_acctbal > 0 AND c_nationkey = 3)",
    "SELECT 1 + 2 * 3 AS arith FROM nation",
    "SELECT c_name || '-' || c_mktsegment AS tagged FROM customer",
]


@pytest.mark.parametrize("sql", ROUNDTRIP_CASES, ids=lambda s: s[:48])
def test_roundtrip(sql):
    """parse → to_sql → parse is a fixpoint (ref round-trip property)."""
    q1 = parse_query(sql)
    q2 = parse_query(q1.to_sql())
    assert q1 == q2
    assert q1.to_sql() == q2.to_sql()


def test_join_vs_filter_classification():
    q = parse_query(
        "SELECT * FROM customer c, orders o, nation n "
        "WHERE c.c_custkey = o.o_custkey AND c.c_nationkey = n.n_nationkey "
        "AND o.o_totalprice > 100 AND n.n_name = 'KENYA'"
    )
    preds = q.predicates()
    assert len(preds.joins()) == 2
    assert len(preds.filters()) == 2
    assert preds.joins_between("c", "o")


def test_explicit_join_normalization():
    """INNER JOIN ... ON parses to the same IR as the implicit form (ref
    explicit_to_implicit, transform.py:172)."""
    implicit = parse_query(
        "SELECT c.c_name FROM customer c, orders o "
        "WHERE c.c_custkey = o.o_custkey AND o.o_totalprice > 10"
    )
    explicit = parse_query(
        "SELECT c.c_name FROM customer c INNER JOIN orders o "
        "ON c.c_custkey = o.o_custkey WHERE o.o_totalprice > 10"
    )
    assert implicit == explicit


def test_schema_binding():
    """Unqualified columns bind through a provided schema (ref live binding
    parser.py:2272-2280); a cross-table equality becomes a join."""
    q = parse_query(
        "SELECT c_name FROM customer, orders WHERE c_custkey = o_custkey",
        schema={"customer": ["c_custkey", "c_name"], "orders": ["o_custkey"]},
    )
    joins = q.predicates().joins()
    assert len(joins) == 1
    assert joins[0].tables() == {"customer", "orders"}


def test_schema_binding_descends_into_subqueries_with_outer_scope():
    """ANSI scoping under schema binding: an unqualified column inside an
    EXISTS/IN subquery resolves against the subquery's own FROM first,
    then the ENCLOSING scope — so `o_custkey = c_custkey` inside EXISTS
    classifies c_custkey as a correlated outer reference (found by the
    differential execution fuzzer: this used to stay unbound and the
    algebra layer misdiagnosed the EXISTS as uncorrelated)."""
    schema = {
        "customer": ["c_custkey", "c_name"],
        "orders": ["o_orderkey", "o_custkey"],
    }
    q = parse_query(
        "SELECT c_name FROM customer WHERE EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
        schema=schema,
    )
    sub = q.where.subquery
    (conj,) = [p for p in sub.predicates().filters() + sub.predicates().joins()]
    bound = {c.name: c.table.full_name for c in conj.columns() if c.table}
    assert bound == {"o_custkey": "orders", "c_custkey": "customer"}


def test_unbound_exists_correlation_raises_decidable_error():
    """Without schema binding, an unqualified name inside EXISTS is
    AMBIGUOUS (it may belong to the outer scope) — the algebra layer must
    say so instead of misdiagnosing the query as uncorrelated."""
    import pytest

    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import UnsupportedSqlError

    q = parse_query(
        "SELECT c_name FROM customer WHERE EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
    )
    with pytest.raises(UnsupportedSqlError, match="cannot decide"):
        parse_relalg(q)


def test_alias_binding_always_on():
    q = parse_query("SELECT x.c_name FROM customer x")
    (ref,) = q.select[0].expr.columns
    assert ref.table is not None and ref.table.full_name == "customer"


def test_query_spec_extraction():
    q = parse_query(
        "SELECT * FROM customer c, orders o WHERE c.c_custkey = o.o_custkey"
    )
    spec = to_query_spec(q)
    assert spec.tables == ("c", "o")
    assert len(spec.edges) == 1
    assert spec.edges[0].tables() == {"c", "o"}


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT * FROM json_table(x, '$')",
        # ON referencing a table outside its join-chain scope — rejected by
        # Postgres/DuckDB too (joins bind tighter than the FROM comma)
        "SELECT * FROM a, b LEFT JOIN c ON c.x = a.x",
    ],
)
def test_unsupported_shapes_raise(sql):
    with pytest.raises(UnsupportedSqlError):
        parse_query(sql)


def test_join_using_parses_and_renders():
    """JOIN ... USING (col) — merged key columns, one output column (ref
    JoinTableSource qal/_qal.py:6710; handled via pglast in the reference)."""
    q = parse_query("SELECT * FROM a JOIN b USING (x) LEFT JOIN c USING (y, z)")
    assert [j.using for j in q.joins] == [("x",), ("y", "z")]
    assert [j.condition for j in q.joins] == [None, None]
    assert parse_query(q.to_sql()) == q
    assert "USING (y, z)" in q.to_sql()


def test_comma_from_item_after_join_chain():
    """``FROM a JOIN b ON p, c`` is legal SQL (JOB queries use it): the
    chain binds to ``a`` only, and the later comma item is a separate
    group."""
    q = parse_query(
        "SELECT * FROM a JOIN b ON a.x = b.x, c WHERE c.y = a.y",
    )
    assert {t.identifier for t in q.from_tables} >= {"a", "c"}
    # pure-inner chain normalizes: b joins via predicate
    assert len(q.predicates().joins()) >= 1


def test_on_scope_accumulates_within_chain():
    """Within one chain, later ONs may reference every earlier chained
    table (standard left-deep scoping)."""
    q = parse_query(
        "SELECT * FROM a JOIN b ON a.x = b.x JOIN c ON c.y = a.y, d "
        "WHERE d.k = a.k"
    )
    assert q is not None


def test_outer_join_parses_structurally():
    """LEFT/RIGHT/FULL/NATURAL joins land in SqlQuery.joins (ref JoinType
    qal/_qal.py:6672, ExplicitFromClause :7074) and round-trip."""
    q = parse_query(
        "SELECT n.n_name FROM nation n "
        "LEFT OUTER JOIN customer c ON n.n_nationkey = c.c_nationkey "
        "FULL JOIN orders o ON c.c_custkey = o.o_custkey"
    )
    assert [j.join_type for j in q.joins] == [Q.JoinType.LEFT, Q.JoinType.FULL]
    assert q.tables() == {"n", "c", "o"}
    assert parse_query(q.to_sql()) == q
    assert "LEFT OUTER JOIN customer c" in q.to_sql()


def test_mixed_chain_stays_fully_explicit():
    """A chain containing any outer link keeps EVERY link explicit:
    normalizing the inner prefix would re-associate the FROM and render a
    later ON referencing a non-adjacent table out of scope (no engine
    accepts the result). Pure-inner chains still normalize."""
    q = parse_query(
        "SELECT * FROM nation n "
        "JOIN customer c ON n.n_nationkey = c.c_nationkey "
        "LEFT JOIN orders o ON c.c_custkey = o.o_custkey"
    )
    assert len(q.from_tables) == 1
    assert [j.join_type for j in q.joins] == [Q.JoinType.INNER, Q.JoinType.LEFT]
    assert q.where is None
    assert parse_query(q.to_sql()) == q

    pure = parse_query(
        "SELECT * FROM nation n JOIN customer c ON n.n_nationkey = c.c_nationkey"
    )
    assert len(pure.from_tables) == 2 and not pure.joins


def test_on_scope_survives_rendering(spark, sf_small):
    """The execution-confirmed repro: an ON after an inner prefix that
    references the FIRST prefix table must stay executable end-to-end."""
    import duckdb

    sql = (
        "SELECT n.n_name, count(o.o_orderkey) AS n_orders "
        "FROM nation n JOIN customer c ON n.n_nationkey = c.c_nationkey "
        "LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
        "AND o.o_totalprice > 400000 AND n.n_nationkey < 10 "
        "GROUP BY n.n_name ORDER BY n.n_name"
    )
    tables = load_tables(spark, sf_small, ["nation", "customer", "orders"])
    got_df = compile_plan(parse_relalg(parse_query(sql)), spark, tables)
    got = sorted(map(str, (tuple(r) for r in got_df.collect())))
    con = duckdb.connect()
    for name in ("nation", "customer", "orders"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_small}/{name}.parquet')"
        )
    want = sorted(map(str, con.execute(sql).fetchall()))
    assert got == want and len(got) > 0


def test_natural_join_parses():
    q = parse_query("SELECT * FROM a NATURAL LEFT JOIN b")
    assert q.joins[0].join_type is Q.JoinType.NATURAL_LEFT
    assert q.joins[0].condition is None
    assert parse_query(q.to_sql()) == q


def test_distinct_on_parses_and_roundtrips():
    q = parse_query(
        "SELECT DISTINCT ON (c_nationkey) c_nationkey, c_acctbal "
        "FROM customer ORDER BY c_nationkey, c_acctbal DESC"
    )
    assert len(q.distinct_on) == 1
    assert not q.distinct
    assert "DISTINCT ON (c_nationkey)" in q.to_sql()
    assert parse_query(q.to_sql()) == q


def test_lateral_parses_and_roundtrips():
    q = parse_query(
        "SELECT n.n_name, t.m FROM nation n, LATERAL "
        "(SELECT max(c.c_acctbal) AS m FROM customer c "
        "WHERE c.c_nationkey = n.n_nationkey) t"
    )
    src = q.from_tables[1]
    assert isinstance(src, Q.SubqueryTableSource) and src.lateral
    assert parse_query(q.to_sql()) == q


def test_algebra_outer_join_nodes():
    """Outer links compile to ThetaJoin(how=...) / NaturalJoin nodes."""
    from postbound_spark.plans import relalg as ra

    tree = parse_relalg(parse_query(
        "SELECT n.n_name FROM nation n "
        "LEFT JOIN customer c ON n.n_nationkey = c.c_nationkey"
    ))
    joins = [n for n in tree.walk() if isinstance(n, ra.ThetaJoin)]
    assert joins and joins[0].how == "left"

    tree = parse_relalg(parse_query("SELECT * FROM a NATURAL JOIN b"))
    assert any(isinstance(n, ra.NaturalJoin) for n in tree.walk())


def test_algebra_uncorrelated_lateral_rejected():
    with pytest.raises(UnsupportedSqlError):
        parse_relalg(parse_query(
            "SELECT * FROM nation n, LATERAL (SELECT 1 AS one) t"
        ))


def test_malformed_raises():
    with pytest.raises(ParserError):
        parse_query("SELECT FROM WHERE")
    with pytest.raises(ParserError):
        parse_query("SELECT a FROM t WHERE a = ")


# ---------------------------------------------------------------------------
# algebra conversion (ref tests/test_relalg.py; parse_relalg relalg.py:4266)
# ---------------------------------------------------------------------------


def _node_types(tree: ra.RelNode) -> set[str]:
    return {type(n).__name__ for n in tree.walk()}


def test_algebra_filter_placement():
    """Single-table filters sit directly above their base relation
    (BaseTable phase, ref relalg.py:2813)."""
    q = parse_query(
        "SELECT * FROM customer c, orders o "
        "WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 0"
    )
    tree = parse_relalg(q)
    join = next(n for n in tree.walk() if isinstance(n, ra.ThetaJoin))
    assert isinstance(join.left, ra.Selection)  # filter below the join
    assert "c_acctbal" in join.left.predicate


def test_algebra_semi_anti_nodes():
    q_in = parse_query(
        "SELECT c_name FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)"
    )
    assert "SemiJoin" in _node_types(parse_relalg(q_in))
    q_nex = parse_query(
        "SELECT c.c_name FROM customer c "
        "WHERE NOT EXISTS (SELECT * FROM orders o WHERE o.o_custkey = c.c_custkey)"
    )
    assert "AntiJoin" in _node_types(parse_relalg(q_nex))


def test_algebra_not_in_is_null_aware():
    q = parse_query(
        "SELECT c_name FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"
    )
    tree = parse_relalg(q)
    anti = next(n for n in tree.walk() if isinstance(n, ra.AntiJoin))
    assert "isnull" in anti.predicate  # Catalyst's null-aware anti-join form


def test_algebra_grouping_with_expression_key():
    q = parse_query(
        "SELECT extract(year FROM o_orderdate) AS yr, count(*) AS n "
        "FROM orders GROUP BY extract(year FROM o_orderdate)"
    )
    types = _node_types(parse_relalg(q))
    assert "Map" in types  # expression key pre-computed (ref relalg.py:2719)
    assert "Grouping" in types


def test_algebra_forced_join_order():
    q = parse_query(
        "SELECT * FROM customer c, orders o, nation n "
        "WHERE c.c_custkey = o.o_custkey AND c.c_nationkey = n.n_nationkey"
    )
    tree = parse_relalg(q, join_order=["n", "c", "o"])
    joins = [n for n in tree.walk() if isinstance(n, ra.ThetaJoin)]
    # bottom join is n ⋈ c under the forced order
    bottom = joins[-1]
    base_tables = bottom.left.tables() | bottom.right.tables()
    assert base_tables == {"nation", "customer"}


def test_find_agg_calls():
    assert _find_agg_calls("sum(x) / count(*)") == ["sum(x)", "count(*)"]
    assert _find_agg_calls("round(sum(a * (1 - b)), 2)") == ["sum(a * (1 - b))"]
    assert _find_agg_calls("row_number() over (order by x)") == []


# ---------------------------------------------------------------------------
# end-to-end: text → parse → algebra → DataFrame vs DuckDB on the same text
# (the reference's DB-as-oracle pattern, SURVEY.md §5)
# ---------------------------------------------------------------------------

E2E_CASES = [
    "SELECT o_orderpriority, count(*) AS n FROM orders "
    "WHERE o_orderdate >= DATE '1995-01-01' GROUP BY o_orderpriority "
    "ORDER BY o_orderpriority",
    "SELECT c.c_name FROM customer c WHERE NOT EXISTS "
    "(SELECT * FROM orders o WHERE o.o_custkey = c.c_custkey) "
    "ORDER BY c.c_name LIMIT 20",
    "SELECT n.n_name, count(*) AS n_cust FROM nation n, customer c "
    "WHERE n.n_nationkey = c.c_nationkey AND c.c_acctbal > 0 "
    "GROUP BY n.n_name HAVING count(*) > 5 ORDER BY n_cust DESC, n.n_name",
]


@pytest.mark.parametrize("sql", E2E_CASES, ids=lambda s: s[:40])
def test_native_pipeline_matches_duckdb(spark, sf_small, sql):
    tables = ["nation", "customer", "orders"]
    cat = load_tables(spark, sf_small, tables)
    df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
    got = sorted(map(str, (tuple(r) for r in df.collect())))
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
        )
    want = sorted(map(str, con.execute(sql).fetchall()))
    assert got == want


# ---------------------------------------------------------------------------
# FROM-surface sources: VALUES / table functions / FROM-less SELECT
# (ref ValuesTableSource :6436, FunctionTableSource :6584)
# ---------------------------------------------------------------------------

SOURCE_CASES = [
    "SELECT v.a, v.b FROM (VALUES (1, 'x'), (2, 'y')) AS v(a, b) ORDER BY v.a",
    "SELECT t.x, t.x * t.x AS sq FROM range(1, 6) AS t(x) ORDER BY t.x",
    "SELECT 1 + 2 AS three",
    "SELECT count(*) AS n FROM range(0, 100) AS t(x) WHERE t.x % 7 = 0",
    "SELECT t.x FROM unnest(array[3, 1, 2]) AS t(x) ORDER BY t.x",
]


@pytest.mark.parametrize("sql", SOURCE_CASES, ids=lambda s: s[:40])
def test_source_shapes_native(spark, sql):
    """VALUES lists, range() TVF and FROM-less SELECT run through the
    native pipeline and match DuckDB on the rendered text."""
    q = parse_query(sql)
    assert parse_query(q.to_sql()) == q
    df = compile_plan(parse_relalg(q), spark)
    got = sorted(map(str, (tuple(r) for r in df.collect())))
    want = sorted(map(str, duckdb.connect().execute(q.to_sql()).fetchall()))
    assert got == want


def test_generate_series_normalizes_to_range():
    q = parse_query("SELECT t.x FROM generate_series(1, 5) AS t(x)")
    src = q.from_tables[0]
    assert isinstance(src, Q.FunctionTableSource)
    assert src.function == "range"
    assert "5 + 1" in src.to_sql()


def test_hint_block_roundtrip():
    """Hint blocks (ref Hint qal/_qal.py:5061; include_hints parser.py:2269):
    extracted at parse, preserved through rendering, droppable."""
    from postbound_spark.plans.transform import add_hint, drop_hints

    q = parse_query(
        "SELECT /*+ BROADCAST(n) */ n.n_name FROM nation n, customer c "
        "WHERE n.n_nationkey = c.c_nationkey"
    )
    assert q.hint == "BROADCAST(n)"
    assert parse_query(q.to_sql()) == q
    assert "/*+ BROADCAST(n) */" in q.to_sql()
    assert drop_hints(q).hint is None
    assert add_hint(q, "MERGE(c)").hint == "MERGE(c)"


def test_inner_join_stays_explicit_before_right_or_full():
    """Normalizing an INNER join into WHERE is unsound once any outer link
    exists (RIGHT/FULL null semantics, and ON-scope re-association for
    LEFT); such chains stay fully explicit."""
    q = parse_query(
        "SELECT * FROM a JOIN b ON a.x = b.x RIGHT JOIN c ON b.y = c.y"
    )
    assert len(q.from_tables) == 1
    assert [j.join_type for j in q.joins] == [Q.JoinType.INNER, Q.JoinType.RIGHT]
    assert q.where is None
    assert parse_query(q.to_sql()) == q


def test_right_join_after_inner_matches_duckdb(spark):
    """Execution check for the normalization-soundness rule: c-only rows
    null-extend through (a JOIN b) RIGHT JOIN c and must survive."""
    import duckdb
    import pandas as pd

    a = pd.DataFrame({"x": [1, 2]})
    b = pd.DataFrame({"x": [1], "y": [10]})
    c = pd.DataFrame({"y": [10, 99]})
    spark.createDataFrame(a).createOrReplaceTempView("ta")
    spark.createDataFrame(b).createOrReplaceTempView("tb")
    spark.createDataFrame(c).createOrReplaceTempView("tc")
    con = duckdb.connect()
    con.register("ta", a), con.register("tb", b), con.register("tc", c)

    sql = ("SELECT tc.y AS cy, tb.x AS bx FROM ta "
           "JOIN tb ON ta.x = tb.x RIGHT JOIN tc ON tb.y = tc.y "
           "ORDER BY cy")
    df = compile_plan(parse_relalg(parse_query(sql)), spark)
    got = sorted(map(str, (tuple(r) for r in df.collect())))
    want = sorted(map(str, con.execute(sql).fetchall()))
    assert got == want  # includes the (99, None) null-extended row


def test_lateral_count_filter_keeps_zero_groups(spark, sf_small):
    """WHERE over a LATERAL count column must see coalesce(…, 0): outer
    rows with no inner match filter as count 0, not NULL (Postgres
    semantics; the DuckDB oracle agrees)."""
    import duckdb

    sql = (
        "SELECT n.n_name, t.c AS n_rich FROM nation n, "
        "LATERAL (SELECT count(*) AS c FROM customer c2 "
        "WHERE c2.c_nationkey = n.n_nationkey AND c2.c_acctbal > 9999.5) t "
        "WHERE t.c = 0 ORDER BY n.n_name"
    )
    tables = load_tables(spark, sf_small, ["nation", "customer"])
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    got_df = compile_plan(parse_relalg(parse_query(sql)), spark, tables)
    got = sorted(map(str, (tuple(r) for r in got_df.collect())))
    con = duckdb.connect()
    for name in ("nation", "customer"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_small}/{name}.parquet')"
        )
    want = sorted(map(str, con.execute(sql).fetchall()))
    assert got == want and len(got) > 0


def test_fetch_prior_parses_and_roundtrips():
    """FETCH PRIOR/LAST carry a structural direction (ref FetchDirection
    qal/_qal.py:7548) and round-trip through to_sql."""
    q = parse_query(
        "SELECT a FROM t ORDER BY a FETCH PRIOR 5 ROWS ONLY"
    )
    assert q.limit == 5 and q.fetch_direction == "prior"
    assert "FETCH PRIOR 5 ROWS ONLY" in q.to_sql()
    assert parse_query(q.to_sql()) == q
    q2 = parse_query("SELECT a FROM t ORDER BY a FETCH LAST 3 ROWS ONLY")
    assert q2.fetch_direction == "last"
    # FIRST/NEXT stay the canonical forward direction (renders as LIMIT)
    q3 = parse_query("SELECT a FROM t ORDER BY a FETCH NEXT 3 ROWS ONLY")
    assert q3.fetch_direction == "first" and "LIMIT 3" in q3.to_sql()


def test_fetch_prior_without_order_by_rejected_at_compile():
    from postbound_spark.plans.algebra import parse_relalg

    q = parse_query("SELECT a FROM t FETCH PRIOR 5 ROWS ONLY")
    with pytest.raises(UnsupportedSqlError, match="requires ORDER BY"):
        parse_relalg(q)


def test_plain_lateral_star_does_not_leak_latkeys(spark, sf_small):
    """SELECT * over a plain LATERAL must not expose the decorrelation's
    synthetic __latkey join columns (they are dropped after the join)."""
    q = parse_query(
        "SELECT * FROM nation n, LATERAL ("
        "SELECT c.c_custkey FROM customer c "
        "WHERE c.c_nationkey = n.n_nationkey) t"
    )
    cat = load_tables(spark, sf_small, ["nation", "customer"])
    df = compile_plan(parse_relalg(q), spark, cat)
    assert not [c for c in df.columns if c.startswith("__latkey")], df.columns
    assert df.count() > 0


@pytest.mark.parametrize(
    "sql",
    [
        # RIGHT/FULL preserved sides multiply by unrelated comma items under
        # the flat join model — mis-association, rejected loudly
        "SELECT * FROM a, b RIGHT JOIN c ON b.x = c.x",
        "SELECT * FROM a FULL JOIN b ON a.x = b.x, c",
        # LEFT/USING chains next to comma items re-associate on render
        # (to_sql cannot express the group structure) — rejected too
        "SELECT * FROM a LEFT JOIN b ON a.x = b.x, c",
        "SELECT * FROM a, b JOIN c USING (x)",
    ],
)
def test_comma_items_with_non_normalizing_chains_rejected(sql):
    with pytest.raises(UnsupportedSqlError, match="comma-separated FROM"):
        parse_query(sql)


def test_fetch_prior_sort_key_outside_select_executes(spark, sf_small):
    """FETCH PRIOR's inverted sort must sit BELOW the projection: the
    ORDER BY key here is not in the SELECT list, so an inverted Sort above
    the projection would be unresolvable."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    sql = "SELECT n_name FROM nation ORDER BY n_nationkey FETCH PRIOR 2 ROWS ONLY"
    tree = parse_relalg(parse_query(sql))
    cat = load_tables(spark, sf_small, ["nation"])
    got = [r.n_name for r in compile_plan(tree, spark, cat).collect()]
    nation = sorted(
        cat["nation"].select("n_nationkey", "n_name").collect(),
        key=lambda r: r.n_nationkey,
    )
    want = [r.n_name for r in nation[-2:]]  # last two, presentation order
    assert got == want


def test_intersect_binds_tighter_than_union():
    """ANSI set-op precedence: a UNION b INTERSECT c == a UNION (b INTERSECT c)."""
    from postbound_spark.plans import qal as Q

    q = parse_query(
        "SELECT a FROM t UNION SELECT a FROM u INTERSECT SELECT a FROM v"
    )
    assert isinstance(q, Q.SetQuery)
    assert q.operator is Q.SetOperator.UNION
    assert isinstance(q.right, Q.SetQuery)
    assert q.right.operator is Q.SetOperator.INTERSECT


def test_intersect_except_all_parse_and_roundtrip():
    """INTERSECT ALL / EXCEPT ALL (bag-semantics extension beyond the
    reference's SetOperator) parse, keep ANSI precedence, and round-trip."""
    from postbound_spark.plans import qal as Q

    q = parse_query(
        "SELECT a FROM t EXCEPT ALL SELECT a FROM u INTERSECT ALL SELECT a FROM v"
    )
    assert isinstance(q, Q.SetQuery)
    assert q.operator is Q.SetOperator.EXCEPT_ALL
    assert isinstance(q.right, Q.SetQuery)
    assert q.right.operator is Q.SetOperator.INTERSECT_ALL
    rt = parse_query(q.to_sql())
    assert isinstance(rt, Q.SetQuery) and rt.operator is Q.SetOperator.EXCEPT_ALL
    assert rt.right.operator is Q.SetOperator.INTERSECT_ALL


def test_intersect_all_bag_semantics(spark, sf_small):
    """INTERSECT ALL keeps min(m, n) duplicates — strictly more rows than
    the set-semantics INTERSECT on a multiset input."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    cat = load_tables(spark, sf_small, ["orders"])

    def run(sql: str) -> list:
        return sorted(
            r.k for r in compile_plan(parse_relalg(parse_query(sql)), spark, cat).collect()
        )

    base = (
        "SELECT o_custkey AS k FROM orders WHERE o_totalprice > 50000 "
        "{op} SELECT o_custkey AS k FROM orders"
    )
    bag = run(base.format(op="INTERSECT ALL"))
    dedup = run(base.format(op="INTERSECT"))
    assert set(bag) == set(dedup)
    assert len(bag) > len(dedup)  # duplicates survive the ALL form
    # EXCEPT ALL: subtracting one copy of each value leaves m-1 copies
    left = run("SELECT o_custkey AS k FROM orders WHERE o_totalprice > 50000")
    minus_one = run(
        "SELECT o_custkey AS k FROM orders WHERE o_totalprice > 50000 "
        "EXCEPT ALL SELECT DISTINCT o_custkey AS k FROM orders"
    )
    from collections import Counter

    want = Counter(left)
    want.subtract(Counter(set(left)))
    assert Counter(minus_one) == +want


def test_fetch_with_ties_semantics(spark, sf_small):
    """WITH TIES keeps every row tied with the last in-window row; the
    ORDER BY column may be dropped by the projection; set queries carry
    ties too."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    cat = load_tables(spark, sf_small, ["orders", "nation"])

    def run(sql: str):
        return compile_plan(parse_relalg(parse_query(sql)), spark, cat)

    # cutoff lands inside a tie group → strictly more rows than LIMIT n
    ties = run(
        "SELECT o_orderpriority AS p FROM orders ORDER BY p "
        "FETCH FIRST 5 ROWS WITH TIES"
    ).collect()
    assert len(ties) > 5
    assert len({r.p for r in ties}) == 1  # all rows from the first tie group
    # ORDER BY column dropped by the projection still drives the cutoff
    named = run(
        "SELECT n_name FROM nation ORDER BY n_regionkey "
        "FETCH FIRST 2 ROWS WITH TIES"
    ).collect()
    assert len(named) == 5  # every nation of the lowest region ties in
    # set query: ties on the combined result
    su = run(
        "SELECT n_regionkey AS k FROM nation UNION ALL "
        "SELECT n_regionkey AS k FROM nation "
        "ORDER BY k FETCH FIRST 1 ROWS WITH TIES"
    ).collect()
    assert len(su) == 10 and {r.k for r in su} == {0}


def test_fetch_with_ties_rejections():
    """Ties without ORDER BY or with PRIOR/LAST are refused loudly
    (ANSI requires ORDER BY; PRIOR/LAST ties are not modeled)."""
    import pytest

    from postbound_spark.plans.parser import UnsupportedSqlError

    with pytest.raises(UnsupportedSqlError, match="ORDER BY"):
        parse_query("SELECT a FROM t FETCH FIRST 3 ROWS WITH TIES")
    with pytest.raises(UnsupportedSqlError, match="PRIOR"):
        parse_query(
            "SELECT a FROM t ORDER BY a FETCH PRIOR 3 ROWS WITH TIES"
        )


def test_fetch_with_ties_offset(spark):
    """OFFSET m FETCH FIRST n ROWS WITH TIES (Postgres-legal): skip m,
    keep n plus the ties of the row at position m+n. Membership within a
    tie group straddling the OFFSET boundary is ANSI-unspecified (same
    as Postgres), so the pins use group-aligned offsets where the result
    is fully determined."""
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    def run(sql: str):
        df = compile_plan(parse_relalg(parse_query(sql)), spark)
        return sorted(r.k for r in df.collect())

    base = (
        "WITH v(k) AS (VALUES (1), (1), (2), (2), (3), (3), (4)) "
        "SELECT k FROM v ORDER BY k OFFSET {m} "
        "FETCH FIRST {n} ROWS WITH TIES"
    )
    # skip both 1s; take one 2 -> its tie comes along
    assert run(base.format(m=2, n=1)) == [2, 2]
    # skip the 1s and 2s; take 2 -> both 3s, no tie spill into 4
    assert run(base.format(m=4, n=2)) == [3, 3]
    # offset+limit beyond the row count -> ANSI short result, no upper cut
    assert run(base.format(m=5, n=10)) == [3, 4]
    # offset alone past everything -> empty
    assert run(base.format(m=7, n=2)) == []


def test_tablesample_semantics(spark, sf_small):
    """TABLESAMPLE (extension): repeatable under a fixed seed, sample
    size inside a generous binomial band, n-ROWS exact, both alias
    orders accepted, IR round-trips."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    cat = load_tables(spark, sf_small, ["orders"])

    def count(sql: str) -> int:
        df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
        return df.count()

    total = count("SELECT o_orderkey FROM orders")
    sql10 = (
        "SELECT o_orderkey FROM orders "
        "TABLESAMPLE BERNOULLI (10 PERCENT) REPEATABLE(42)"
    )
    a, b = count(sql10), count(sql10)
    assert a == b  # fixed seed + fixed input layout => deterministic
    assert 0.03 * total < a < 0.25 * total  # generous band around 10%
    assert count("SELECT o_orderkey FROM orders TABLESAMPLE (25 ROWS)") == 25
    # Postgres order: alias BEFORE the sample clause
    assert (
        count(
            "SELECT o.o_orderkey FROM orders o "
            "TABLESAMPLE (30 ROWS) WHERE o.o_orderkey >= 0"
        )
        == 30
    )
    q = parse_query(sql10)
    rt = parse_query(q.to_sql()).from_tables[0]
    assert (rt.sample_percent, rt.sample_seed) == (10.0, 42)
    import pytest

    from postbound_spark.plans.parser import ParserError

    with pytest.raises(ParserError, match="outside"):
        parse_query("SELECT 1 FROM orders TABLESAMPLE (150 PERCENT)")


def test_recursive_cte_fixpoint(spark, sf_small):
    """WITH RECURSIVE (extension — ref excludes recursion): generator,
    cyclic closure (UNION dedup terminates the loop), and ANSI
    working-table semantics (each step sees only the previous delta)."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    cat = load_tables(spark, sf_small, ["nation"])

    def run(sql: str):
        return compile_plan(parse_relalg(parse_query(sql)), spark, cat)

    seq = run(
        "WITH RECURSIVE s(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM s "
        "WHERE n < 7) SELECT n FROM s ORDER BY n"
    ).collect()
    assert [r.n for r in seq] == list(range(1, 8))
    # cycle 1→2→3→1: UNION dedup must terminate and visit each node once
    closure = run(
        "WITH RECURSIVE e(a, b) AS (VALUES (1, 2), (2, 3), (3, 1)), "
        "r(x) AS (SELECT 1 UNION SELECT e.b FROM e, r WHERE e.a = r.x) "
        "SELECT x FROM r ORDER BY x"
    ).collect()
    assert [r.x for r in closure] == [1, 2, 3]
    # non-recursive CTE in a RECURSIVE WITH stays a plain inline CTE
    q = parse_query(
        "WITH RECURSIVE plain AS (SELECT n_nationkey FROM nation) "
        "SELECT count(*) AS c FROM plain"
    )
    from postbound_spark.plans import qal as Q

    assert not any(getattr(c, "recursive", False) for c in q.ctes)
    assert isinstance(q.ctes[0], Q.CommonTableExpression)


def test_recursive_ref_through_derived_tables(spark):
    """The self-reference may hide inside a FROM-subquery or a nested
    CTE body (DuckDB/Postgres accept both): detection must see through
    them, and a MATERIALIZED subtree reading the working table must NOT
    be memoized across iterations (the value-keyed cache would freeze
    iteration 1's rows — silent fixpoint corruption)."""
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    def run(sql: str):
        df = compile_plan(parse_relalg(parse_query(sql)), spark)
        return sorted(r.n for r in df.collect())

    nested = run(
        "WITH RECURSIVE s(n) AS (SELECT 1 UNION ALL "
        "SELECT x + 1 FROM (SELECT n AS x FROM s) WHERE x < 6) "
        "SELECT n FROM s ORDER BY n"
    )
    assert nested == [1, 2, 3, 4, 5, 6]
    materialized = run(
        "WITH RECURSIVE s(n) AS (SELECT 1 UNION ALL "
        "SELECT x + 1 FROM (WITH m AS MATERIALIZED (SELECT n AS x FROM s) "
        "SELECT x FROM m) WHERE x < 6) SELECT n FROM s ORDER BY n"
    )
    assert materialized == [1, 2, 3, 4, 5, 6]
    # a nested WITH that SHADOWS the name is not a recursive reference
    from postbound_spark.plans import qal as Q

    q = parse_query(
        "WITH RECURSIVE s(n) AS (SELECT 1 UNION ALL "
        "SELECT x FROM (WITH s AS (SELECT 2 AS x) SELECT x FROM s)) "
        "SELECT n FROM s"
    )
    assert not any(getattr(c, "recursive", False) for c in q.ctes)


def test_recursive_cte_rejections_and_guard(spark):
    """Malformed recursive bodies are refused loudly; a non-converging
    UNION ALL hits the max_iterations guard instead of looping forever."""
    import pytest

    from postbound_spark.operators import compile_plan
    from postbound_spark.plans import relalg as ra
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import UnsupportedSqlError

    with pytest.raises(UnsupportedSqlError, match="base UNION"):
        # self-referencing body with no set operation at all
        parse_relalg(
            parse_query(
                "WITH RECURSIVE s(n) AS (SELECT n + 1 FROM s) "
                "SELECT n FROM s"
            )
        )
    with pytest.raises(UnsupportedSqlError, match="BASE term"):
        parse_relalg(
            parse_query(
                "WITH RECURSIVE s(n) AS (SELECT n FROM s UNION ALL "
                "SELECT 1) SELECT n FROM s"
            )
        )
    with pytest.raises(UnsupportedSqlError, match="MATERIALIZED"):
        parse_query(
            "WITH RECURSIVE s(n) AS MATERIALIZED (SELECT 1 UNION ALL "
            "SELECT n + 1 FROM s WHERE n < 3) SELECT n FROM s"
        )
    # runaway guard: UNION ALL with no terminating WHERE
    tree = parse_relalg(
        parse_query(
            "WITH RECURSIVE s(n) AS (SELECT 1 UNION ALL SELECT n + 1 "
            "FROM s) SELECT n FROM s"
        )
    )

    def clamp(node):
        if isinstance(node, ra.RecursiveUnion):
            return node.mutate(
                max_iterations=3,
                base=clamp(node.base),
                step=clamp(node.step),
            )
        changes = {}
        from dataclasses import fields

        for f in fields(node):
            v = getattr(node, f.name)
            if isinstance(v, ra.RelNode):
                changes[f.name] = clamp(v)
        return node.mutate(**changes) if changes else node

    with pytest.raises(RuntimeError, match="did not converge"):
        compile_plan(clamp(tree), spark).collect()


def test_order_by_ordinal_resolves_to_select_position(spark, sf_small):
    """ORDER BY 1 must sort by the first output column, not the constant 1."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    q = parse_query("SELECT n_name, n_nationkey FROM nation ORDER BY 2 DESC LIMIT 3")
    tree = parse_relalg(q)
    cat = load_tables(spark, sf_small, ["nation"])
    got = [r.n_nationkey for r in compile_plan(tree, spark, cat).collect()]
    want = sorted(
        (r.n_nationkey for r in cat["nation"].collect()), reverse=True
    )[:3]
    assert got == want


def test_order_by_ordinal_out_of_range_rejected():
    with pytest.raises(UnsupportedSqlError, match="ordinal"):
        parse_query("SELECT a FROM t ORDER BY 3")


def test_timestamp_with_time_zone_cast_parses():
    q = parse_query("SELECT CAST(x AS timestamp with time zone) AS ts FROM t")
    assert "timestamp with time zone" in q.to_sql().lower()


def test_in_subquery_same_column_name_executes(spark, sf_small):
    """`WHERE id IN (SELECT id ...)` — both sides share the column name;
    the compiled semi join must not hit AMBIGUOUS_REFERENCE."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    q = parse_query(
        "SELECT c_name FROM customer "
        "WHERE c_nationkey IN (SELECT c2.c_nationkey FROM customer c2 "
        "WHERE c2.c_acctbal > 9000) ORDER BY c_name LIMIT 5"
    )
    cat = load_tables(spark, sf_small, ["customer"])
    got = compile_plan(parse_relalg(q), spark, cat).collect()
    assert len(got) == 5


def test_agg_filter_clause_survives_algebra_path(spark, sf_small):
    """count(x) FILTER (WHERE ...) through parse_relalg must keep the
    filter semantics (not compute the unfiltered aggregate)."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    q = parse_query(
        "SELECT n_regionkey, count(*) FILTER (WHERE n_nationkey > 10) AS big "
        "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"
    )
    cat = load_tables(spark, sf_small, ["nation"])
    got = {
        (r.n_regionkey, r.big)
        for r in compile_plan(parse_relalg(q), spark, cat).collect()
    }
    want = {
        (r.n_regionkey, r.big)
        for r in spark.sql(
            "SELECT n_regionkey, count(*) FILTER (WHERE n_nationkey > 10) AS big "
            "FROM {n} GROUP BY n_regionkey",
            n=cat["nation"],
        ).collect()
    }
    assert got == want


def test_fetch_prior_with_distinct_on_output_keys(spark, sf_small):
    """FETCH LAST + DISTINCT where the sort key is a plain select column —
    valid SQL that must compile (keys are in the select list)."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    q = parse_query(
        "SELECT DISTINCT n_regionkey FROM nation "
        "ORDER BY n_regionkey FETCH LAST 2 ROWS ONLY"
    )
    cat = load_tables(spark, sf_small, ["nation"])
    got = [r.n_regionkey for r in compile_plan(parse_relalg(q), spark, cat).collect()]
    distinct_keys = sorted(
        {r.n_regionkey for r in cat["nation"].collect()}
    )
    assert got == distinct_keys[-2:]


def test_distinct_order_by_limit_keeps_the_order(spark, sf_small):
    """DISTINCT compiles to an aggregate, which eliminates any Sort below
    it — the sort must sit above the dedup or LIMIT returns arbitrary
    rows."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    q = parse_query(
        "SELECT DISTINCT n_regionkey FROM nation ORDER BY n_regionkey LIMIT 2"
    )
    cat = load_tables(spark, sf_small, ["nation"])
    got = [r.n_regionkey for r in compile_plan(parse_relalg(q), spark, cat).collect()]
    want = sorted({r.n_regionkey for r in cat["nation"].collect()})[:2]
    assert got == want


def test_trailing_order_limit_binds_to_the_whole_set_query(spark, sf_small):
    """ANSI: `a UNION b ORDER BY 1 LIMIT n` sorts/limits the COMBINED
    result — per-operand consumption silently bound the clauses to b."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans import qal as Q
    from postbound_spark.plans.algebra import parse_relalg

    q = parse_query(
        "SELECT n_name FROM nation UNION SELECT r_name FROM region "
        "ORDER BY 1 LIMIT 3"
    )
    assert isinstance(q, Q.SetQuery)
    assert q.limit == 3 and len(q.order_by) == 1
    assert q.left.limit is None and q.right.limit is None
    cat = load_tables(spark, sf_small, ["nation", "region"])
    got = [r[0] for r in compile_plan(parse_relalg(q), spark, cat).collect()]
    assert got == sorted(got) and len(got) == 3


def test_set_query_ordinal_resolves_qualified_select_item(spark, sf_small):
    """`SELECT n.n_name ... UNION ... ORDER BY 1`: the ordinal must map to
    the OUTPUT column name (n_name) — the qualified `n.n_name` no longer
    resolves against the combined set-query result."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    q = parse_query(
        "SELECT n.n_name FROM nation n UNION SELECT r.r_name FROM region r "
        "ORDER BY 1 LIMIT 4"
    )
    assert q.order_by[0].expr.sql == "n_name"
    cat = load_tables(spark, sf_small, ["nation", "region"])
    got = [r[0] for r in compile_plan(parse_relalg(q), spark, cat).collect()]
    assert got == sorted(got) and len(got) == 4


def test_set_query_ordinal_requires_alias_for_computed_items():
    from postbound_spark.plans.parser import UnsupportedSqlError

    with pytest.raises(UnsupportedSqlError, match="alias the select item"):
        parse_query(
            "SELECT n_nationkey + 1 FROM nation UNION "
            "SELECT r_regionkey FROM region ORDER BY 1"
        )


# ---------------------------------------------------------------------------
# round 5: connectivity-refined implicit-join ordering (plans/algebra.py)
# ---------------------------------------------------------------------------


def _order_for(sql: str) -> list[str]:
    from postbound_spark.plans.algebra import _Converter
    from postbound_spark.plans.parser import parse_query

    q = parse_query(sql)
    conv = _Converter(q, None, {})
    joins = [p for p in q.predicates().joins()]
    return conv._connected_order(list(q.from_tables), joins)


def test_connected_order_keeps_already_connected_from_lists():
    """A FROM list that is connected at every step folds in its exact
    written order — the refinement must be invisible for well-ordered
    queries (every TPC-H/SSB/JOB-light text)."""
    order = _order_for(
        "SELECT count(*) AS n FROM lineitem l, orders o, customer c "
        "WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey"
    )
    assert order == ["l", "o", "c"]


def test_connected_order_defers_unlinked_dimensions():
    """JOB's shape: dimensions listed alphabetically with no predicates
    between them must fold only once a join predicate connects them."""
    order = _order_for(
        "SELECT count(*) AS n "
        "FROM region r, nation n, customer c "
        "WHERE c.c_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey"
    )
    # region first (FROM order), then nation (joins region), then customer
    assert order == ["r", "n", "c"]
    order2 = _order_for(
        "SELECT count(*) AS n "
        "FROM region r, customer c, nation n "
        "WHERE c.c_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey"
    )
    # customer cannot join region directly -> nation is pulled forward
    assert order2 == ["r", "n", "c"]


def test_connected_order_preserves_deliberate_cartesians():
    """A genuinely disconnected component still folds (cross product by
    intent), falling back to FROM order for the unreachable table."""
    order = _order_for(
        "SELECT count(*) AS n FROM region r, nation n, part p "
        "WHERE n.n_regionkey = r.r_regionkey"
    )
    assert order == ["r", "n", "p"]


def test_connected_order_is_deterministic_for_self_joins():
    order = _order_for(
        "SELECT count(*) AS n FROM nation n1, region r, nation n2 "
        "WHERE n1.n_regionkey = r.r_regionkey AND n2.n_regionkey = r.r_regionkey"
    )
    assert order == ["n1", "r", "n2"]


class TestNamedWindows:
    """WINDOW clause (ANSI named windows; the reference's pglast grammar
    models a WindowClause). The parser normalizes at the door: every
    `OVER w` inlines the named definition — text AND referenced columns —
    so downstream layers only ever see inline windows."""

    def test_inlines_definition_into_both_references(self):
        q = parse_query(
            "SELECT o_custkey, rank() OVER w AS r, sum(o_totalprice) OVER w AS s "
            "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)"
        )
        sql = q.to_sql()
        assert sql.count("OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC NULLS LAST)") == 2
        assert "WINDOW" not in sql and "\x00" not in sql

    def test_multiple_named_windows(self):
        q = parse_query(
            "SELECT rank() OVER w AS r, avg(o_totalprice) OVER v AS a FROM orders "
            "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice), "
            "v AS (PARTITION BY o_orderstatus)"
        )
        sql = q.to_sql()
        assert "OVER (PARTITION BY o_custkey ORDER BY o_totalprice NULLS LAST)" in sql
        assert "OVER (PARTITION BY o_orderstatus)" in sql

    def test_window_columns_tracked_for_binding(self):
        q = parse_query(
            "SELECT rank() OVER w AS r FROM orders "
            "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice)"
        )
        cols = {c.name for c in q.select[0].expr.columns}
        assert {"o_custkey", "o_totalprice"} <= cols

    def test_undefined_window_raises(self):
        with pytest.raises(ParserError, match="not defined"):
            parse_query("SELECT rank() OVER w AS r FROM orders")
        with pytest.raises(ParserError, match="not defined"):
            parse_query(
                "SELECT rank() OVER w AS r FROM orders "
                "WINDOW v AS (ORDER BY o_orderkey)"
            )

    def test_duplicate_window_name_raises(self):
        with pytest.raises(ParserError, match="duplicate WINDOW"):
            parse_query(
                "SELECT rank() OVER w AS r FROM orders "
                "WINDOW w AS (ORDER BY o_orderkey), w AS (ORDER BY o_custkey)"
            )

    def test_named_window_with_frame_spec(self):
        q = parse_query(
            "SELECT sum(o_totalprice) OVER w AS s FROM orders "
            "WINDOW w AS (ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
        )
        assert "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW" in q.to_sql()


class TestAnsiCallFormsAndBooleanTests:
    """POSITION(a IN b), substring(s FROM p FOR n), TRIM(BOTH c FROM s),
    and IS [NOT] TRUE/FALSE/UNKNOWN — pglast-grammar forms both engines
    execute verbatim, so the parser carries the spelling as written."""

    @pytest.mark.parametrize("sql,frag", [
        ("SELECT POSITION('a' IN c_name) AS p FROM customer",
         "position('a' IN c_name)"),
        ("SELECT substring(c_name FROM 2 FOR 3) AS s FROM customer",
         "substring(c_name FROM 2 FOR 3)"),
        ("SELECT substring(c_name FROM 2) AS s FROM customer",
         "substring(c_name FROM 2)"),
        ("SELECT TRIM(BOTH ' ' FROM c_name) AS t FROM customer",
         "trim(BOTH ' ' FROM c_name)"),
        ("SELECT TRIM(LEADING 'x' FROM c_name) AS t FROM customer",
         "trim(LEADING 'x' FROM c_name)"),
        ("SELECT TRIM(' ' FROM c_name) AS t FROM customer",
         "trim(' ' FROM c_name)"),
    ])
    def test_keyword_argument_calls_round_trip(self, sql, frag):
        q = parse_query(sql)
        assert frag in q.to_sql()
        # re-parse of the rendered SQL is stable
        assert frag in parse_query(q.to_sql()).to_sql()

    def test_keyword_call_columns_tracked(self):
        q = parse_query("SELECT POSITION('a' IN c_name) AS p FROM customer")
        assert {c.name for c in q.select[0].expr.columns} == {"c_name"}

    @pytest.mark.parametrize("sql,frag", [
        ("SELECT c_name FROM customer WHERE (c_acctbal > 0) IS TRUE",
         "(c_acctbal > 0) IS TRUE"),
        ("SELECT c_name FROM customer WHERE (c_acctbal > 0) IS NOT UNKNOWN",
         "(c_acctbal > 0) IS NOT UNKNOWN"),
        ("SELECT c_name FROM customer WHERE (c_acctbal IS NULL) IS FALSE",
         "(c_acctbal IS NULL) IS FALSE"),
        ("SELECT c_name FROM customer WHERE c_acctbal > 0 AND (c_nationkey = 1) IS NOT FALSE",
         "(c_nationkey = 1) IS NOT FALSE"),
    ])
    def test_boolean_tests_round_trip(self, sql, frag):
        q = parse_query(sql)
        assert frag in q.to_sql()
        assert frag in parse_query(q.to_sql()).to_sql()

    def test_boolean_test_columns_tracked(self):
        q = parse_query(
            "SELECT c_name FROM customer WHERE (c_acctbal > 0) IS TRUE"
        )
        cols = {c.name for leaf in q.where.iterpredicates() for c in leaf.columns()}
        assert "c_acctbal" in cols

    def test_plain_parenthesized_expr_unaffected(self):
        q = parse_query(
            "SELECT c_name FROM customer WHERE (c_acctbal) IS NOT NULL"
        )
        assert "c_acctbal IS NOT NULL" in q.to_sql().replace("(c_acctbal)", "c_acctbal")


class TestReviewRegressionsRound6:
    """Regression pins for the round-6 review findings on the named-window
    and ANSI-call-form additions."""

    def test_position_comma_form_still_parses(self):
        q = parse_query("SELECT position('a', c_name) AS p FROM customer")
        assert "position('a', c_name)" in q.to_sql()

    def test_order_by_named_window_resolves_in_declaring_select(self):
        # ANSI scopes WINDOW w over the declaring SELECT's own ORDER BY
        # (ref pglast grammar WindowClause) — round-7 fix per ADVICE.md
        q = parse_query(
            "SELECT o_orderkey FROM orders "
            "WINDOW w AS (ORDER BY o_orderkey) ORDER BY rank() OVER w"
        )
        sql = q.to_sql()
        assert "rank() OVER (ORDER BY o_orderkey NULLS LAST)" in sql
        assert "\x00" not in sql

    def test_order_by_named_window_rejected_not_leaked(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        # no WINDOW clause anywhere — undefined name still rejected
        with pytest.raises((UnsupportedSqlError, ParserError), match="window"):
            parse_query("SELECT o_orderkey FROM orders ORDER BY rank() OVER w")
        # set-query ORDER BY cannot see an operand's WINDOW scope
        with pytest.raises((UnsupportedSqlError, ParserError), match="window"):
            parse_query(
                "SELECT o_orderkey FROM orders "
                "WINDOW w AS (ORDER BY o_orderkey) "
                "UNION ALL SELECT o_orderkey FROM orders "
                "ORDER BY rank() OVER w"
            )

    def test_order_by_named_window_subquery_does_not_clobber_scope(self):
        # a scalar subquery inside the ORDER BY key parses its own (empty)
        # select scope — the outer WINDOW map must survive the excursion
        q = parse_query(
            "SELECT o_orderkey FROM orders "
            "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice) "
            "ORDER BY rank() OVER w, (SELECT max(o_orderkey) FROM orders)"
        )
        sql = q.to_sql()
        assert "rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice NULLS LAST)" in sql
        assert "\x00" not in sql

    def test_window_name_prefix_collision_resolves_both(self):
        q = parse_query(
            "SELECT rank() OVER w AS r, dense_rank() OVER wx AS d FROM orders "
            "WINDOW w AS (ORDER BY o_orderkey), wx AS (ORDER BY o_custkey)"
        )
        sql = q.to_sql()
        assert "rank() OVER (ORDER BY o_orderkey NULLS LAST)" in sql
        assert "dense_rank() OVER (ORDER BY o_custkey NULLS LAST)" in sql
        assert "\x00" not in sql

    def test_undefined_window_with_underscore_name_raises(self):
        with pytest.raises(ParserError, match="not defined"):
            parse_query(
                "SELECT rank() OVER w_x AS r FROM orders "
                "WINDOW w AS (ORDER BY o_orderkey)"
            )

    def test_string_literal_cannot_fake_a_marker(self):
        # innocuous marker-LOOKING text passes through as data...
        q = parse_query("SELECT 'x__WINREF__y__' AS s FROM customer")
        assert "x__WINREF__y__" in q.to_sql()
        # ...and the real NUL-delimited marker is un-fakeable because NUL
        # bytes are rejected at the parser door (engines reject them too)
        with pytest.raises(ParserError, match="NUL"):
            parse_query("SELECT '\x00WINREF\x00y\x00' AS s FROM customer")

    def test_window_in_where_clause_rejected(self):
        with pytest.raises(ParserError, match="not defined"):
            parse_query(
                "SELECT o_orderkey FROM orders WHERE rank() OVER w > 1 "
                "WINDOW w AS (ORDER BY o_orderkey)"
            )

    def test_trim_mode_with_default_chars(self):
        q = parse_query("SELECT TRIM(BOTH FROM c_name) AS t FROM customer")
        assert "trim(BOTH FROM c_name)" in q.to_sql()

    def test_quoted_window_identifier_still_usable(self):
        # WINDOW is reserved (as in the reference's PostgreSQL grammar);
        # the quoted spelling remains available for columns named window
        q = parse_query('SELECT "window" FROM events')
        assert q.select


def test_query_spec_rejects_set_queries_clearly():
    """to_query_spec on a UNION query raises UnsupportedSqlError with an
    actionable message, never AttributeError (surfaced by the JOB-complex
    strategy-matrix run: one UNION ALL query aborted the corpus sweep)."""
    q = parse_query(
        "SELECT n_name FROM nation UNION ALL SELECT n_name FROM nation"
    )
    with pytest.raises(UnsupportedSqlError, match="set-operation"):
        to_query_spec(q)


class TestCteSurface:
    """Round-8: CTE target-column lists (ref WithQuery qal/_qal.py:5304),
    VALUES-backed CTEs (ref ValuesWithQuery :5469) and the MATERIALIZED
    flag (ref CommonTableExpression :5605) — round-7 verdict Missing #1."""

    def test_target_columns_realias_body(self):
        q = parse_query(
            "WITH v(rk, nm) AS (SELECT r_regionkey, r_name FROM region) "
            "SELECT rk FROM v"
        )
        body = q.ctes[0][1]
        assert [p.alias for p in body.select] == ["rk", "nm"]

    def test_target_columns_width_mismatch(self):
        from postbound_spark.plans.parser import ParserError

        with pytest.raises(ParserError, match="target-column list"):
            parse_query(
                "WITH v(a) AS (SELECT r_regionkey, r_name FROM region) "
                "SELECT a FROM v"
            )

    def test_target_columns_over_star_rejected(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        with pytest.raises(UnsupportedSqlError, match="\\* projection"):
            parse_query("WITH v(a) AS (SELECT * FROM region) SELECT a FROM v")

    def test_target_columns_on_set_body_hit_leftmost(self):
        q = parse_query(
            "WITH v(k) AS (SELECT r_regionkey FROM region "
            "UNION ALL SELECT n_regionkey FROM nation) SELECT k FROM v"
        )
        body = q.ctes[0][1]
        assert body.left.select[0].alias == "k"
        assert body.right.select[0].alias is None

    def test_values_cte_requires_target_columns(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        with pytest.raises(UnsupportedSqlError, match="target-column"):
            parse_query("WITH v AS (VALUES (1, 2)) SELECT * FROM v")

    def test_values_cte_width_mismatch(self):
        from postbound_spark.plans.parser import ParserError

        with pytest.raises(ParserError, match="width"):
            parse_query("WITH v(a, b) AS (VALUES (1, 2, 3)) SELECT a FROM v")

    def test_values_cte_desugars_to_values_source(self):
        import postbound_spark.plans.qal as Q

        q = parse_query(
            "WITH v(a, b) AS (VALUES (1, 'x'), (2, 'y')) "
            "SELECT a, b FROM v WHERE a > 1"
        )
        body = q.ctes[0][1]
        src = body.from_tables[0]
        assert isinstance(src, Q.ValuesTableSource)
        assert src.columns == ("a", "b")
        assert len(src.rows) == 2

    def test_materialized_flag_round_trips(self):
        import postbound_spark.plans.qal as Q

        sql = (
            "WITH v AS MATERIALIZED (SELECT r_regionkey AS k FROM region) "
            "SELECT k FROM v"
        )
        q = parse_query(sql)
        cte = q.ctes[0]
        assert isinstance(cte, Q.MaterializedCte) and cte.materialized
        # unpacking compatibility: every consumer iterates 2-tuples
        name, body = cte
        assert name == "v"
        rendered = q.to_sql()
        assert "AS MATERIALIZED (" in rendered
        q2 = parse_query(rendered)
        assert q2.ctes[0].materialized

    def test_not_materialized_is_default(self):
        q = parse_query(
            "WITH v AS NOT MATERIALIZED (SELECT r_regionkey AS k FROM region) "
            "SELECT k FROM v"
        )
        assert not getattr(q.ctes[0], "materialized", False)
        assert "MATERIALIZED" not in q.to_sql()

    def test_materialized_compiles_to_shared_cache(self, spark, sf_small):
        """Both references to a MATERIALIZED CTE must compile to the SAME
        cached DataFrame (one InMemoryRelation, populated once)."""
        from postbound_spark.catalog import load_tables
        from postbound_spark.operators.compiler import compile_plan
        from postbound_spark.plans.algebra import parse_relalg

        cat = load_tables(spark, sf_small, ["nation"])
        q = parse_query(
            "WITH v AS MATERIALIZED (SELECT n_regionkey, count(*) AS c "
            "FROM nation GROUP BY n_regionkey) "
            "SELECT a.n_regionkey AS k FROM v a, v b "
            "WHERE a.n_regionkey = b.n_regionkey"
        )
        df = compile_plan(parse_relalg(q), spark, cat)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "InMemoryRelation" in plan
        assert df.count() == 5
        spark.catalog.clearCache()


class TestGroupingSets:
    """Round-7: GROUP BY GROUPING SETS desugars to a UNION ALL chain
    (the reference's IR excludes grouping sets, qal/_qal.py:8438 — the
    engine executes them via the textbook expansion)."""

    def test_desugars_to_union_all(self):
        q = parse_query(
            "SELECT n_regionkey, count(*) AS n FROM nation "
            "GROUP BY GROUPING SETS ((n_regionkey), ())"
        )
        sql = q.to_sql()
        assert "UNION ALL" in sql
        assert "GROUP BY n_regionkey" in sql
        assert "NULL AS n_regionkey" in sql

    def test_bare_element_is_singleton_set(self):
        q = parse_query(
            "SELECT n_regionkey, n_name, count(*) AS n FROM nation "
            "GROUP BY GROUPING SETS (n_regionkey, n_name)"
        )
        sql = q.to_sql()
        assert sql.count("UNION ALL") == 1
        assert "NULL AS n_name" in sql and "NULL AS n_regionkey" in sql

    def test_single_set_degenerates_to_group_by(self):
        q = parse_query(
            "SELECT n_regionkey, count(*) AS n FROM nation "
            "GROUP BY GROUPING SETS ((n_regionkey))"
        )
        sql = q.to_sql()
        assert "UNION" not in sql and "GROUP BY n_regionkey" in sql

    def test_computed_set_element_supported(self, spark, sf_small):
        """Round-10 wave-5 closure: EXPRESSION grouping-set keys expand
        by text matching; a NULL-padded expression key requires an alias
        on its select item (clean rejection otherwise)."""
        sql = (
            "SELECT n_regionkey % 2 AS parity, n_regionkey, count(*) AS c "
            "FROM nation GROUP BY GROUPING SETS ((n_regionkey % 2), "
            "(n_regionkey % 2, n_regionkey)) "
            "ORDER BY parity, n_regionkey NULLS FIRST"
        )
        cat = load_tables(spark, sf_small, ["nation"])
        got = sorted(
            map(repr, (tuple(r) for r in
                       compile_plan(parse_relalg(parse_query(sql)), spark, cat).collect()))
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW nation AS SELECT * FROM read_parquet('{sf_small}/nation.parquet')"
        )
        want = sorted(map(repr, (tuple(r) for r in con.execute(sql).fetchall())))
        assert got == want and len(got) > 0

        from postbound_spark.plans.parser import UnsupportedSqlError

        # the EXPRESSION key gets NULL-padded in the first set here, so
        # its un-aliased select item must reject
        with pytest.raises(UnsupportedSqlError, match="needs an alias"):
            parse_query(
                "SELECT n_regionkey % 2, n_regionkey, count(*) AS c "
                "FROM nation GROUP BY GROUPING SETS ((n_regionkey), "
                "(n_regionkey, n_regionkey % 2))"
            )

    def test_mixed_plain_and_rollup_cross_product(self):
        # round-11: ANSI mixed GROUP BY — a plain item composes with
        # ROLLUP/CUBE/GROUPING SETS as the CROSS PRODUCT of set lists,
        # so `a, ROLLUP(b)` = sets {(a,b),(a)}
        q = parse_query(
            "SELECT n_name, n_regionkey, count(*) AS n FROM nation "
            "GROUP BY n_name, ROLLUP(n_regionkey)"
        )
        sql = q.to_sql()
        assert sql.count("UNION ALL") == 1
        assert "GROUP BY n_name, n_regionkey" in sql
        assert "GROUP BY n_name)" in sql
        # the plain key is NEVER null-padded
        assert "NULL AS n_name" not in sql
        assert "NULL AS n_regionkey" in sql

    def test_two_rollups_cross_product(self):
        q = parse_query(
            "SELECT n_name, n_regionkey, count(*) AS n FROM nation "
            "GROUP BY ROLLUP(n_name), ROLLUP(n_regionkey)"
        )
        sql = q.to_sql()
        # 2 x 2 sets → 4 branches → 3 UNION ALLs
        assert sql.count("UNION ALL") == 3

    def test_inside_set_operation_expands_per_operand(self):
        # round-11: grouping sets participate in set operations — the
        # per-operand expansion nests the desugared UNION ALL as the
        # left operand
        q = parse_query(
            "SELECT n_regionkey, count(*) AS n FROM nation "
            "GROUP BY GROUPING SETS ((n_regionkey), ()) "
            "UNION ALL SELECT 1, 2"
        )
        import postbound_spark.plans.qal as Q

        assert isinstance(q, Q.SetQuery)
        assert isinstance(q.left, Q.SetQuery)  # the expansion
        assert "GROUPING SETS" not in q.to_sql().upper()

    def test_subquery_scope_does_not_leak(self):
        # grouping sets inside a FROM subquery expand there, not at the
        # outer level
        q = parse_query(
            "SELECT sub.n FROM (SELECT n_regionkey, count(*) AS n "
            "FROM nation GROUP BY GROUPING SETS ((n_regionkey), ())) sub"
        )
        assert "UNION ALL" in q.to_sql()

    def test_subquery_after_group_by_does_not_steal_sets(self):
        """Round-8 regression (advisor-found, silent wrong results): a
        subquery parsed AFTER the GROUP BY — here in HAVING — used to
        consume the outer query's pending grouping sets, leaving the
        outer query ungrouped and grafting the UNION ALL expansion
        inside the HAVING subquery. parse_query now save/restores the
        pending-sets state around nested parses."""
        q = parse_query(
            "SELECT n_regionkey, count(*) AS c FROM nation "
            "GROUP BY GROUPING SETS ((n_regionkey), ()) "
            "HAVING count(*) > (SELECT min(r_regionkey) FROM region)"
        )
        import postbound_spark.plans.qal as Q

        # the OUTER query is the UNION ALL expansion ...
        assert isinstance(q, Q.SetQuery)
        # ... whose left operand keeps the real GROUP BY and the intact
        # HAVING subquery
        assert q.left.group_by and "n_regionkey" in q.left.group_by[0].sql
        assert "SELECT min(r_regionkey)" in q.left.having.to_sql()
        assert "UNION" not in q.left.having.to_sql()

    def test_later_set_operand_does_not_steal_sets(self):
        """Companion regression: operand 1's grouping sets expand ON
        OPERAND 1 — never silently consumed by operand 2's nested parse
        (the round-8 steal bug's set-operation analog)."""
        q = parse_query(
            "SELECT n_regionkey, count(*) AS n FROM nation "
            "GROUP BY GROUPING SETS ((n_regionkey), ()) "
            "UNION ALL SELECT r_regionkey, (SELECT count(*) FROM region) "
            "FROM region"
        )
        import postbound_spark.plans.qal as Q

        assert isinstance(q.left, Q.SetQuery)  # expansion on operand 1
        assert isinstance(q.right, Q.SqlQuery)  # operand 2 untouched
        assert "GROUPING SETS" not in q.to_sql().upper()


def test_select_list_scalar_subquery_lift_boundaries():
    """Round-8: UNCORRELATED single-row scalar subqueries in projection
    position are LIFTED by the algebra path (1-row cross product,
    registry entry parsed_scalar_subquery_lift); shapes without the
    structural guarantee, and QUALIFIED correlated references, keep the
    clean rejection and the spark.sql route (expr_scalar_subquery).
    Unqualified correlated references bind optimistically to the inner
    scope (ANSI) and fail loudly at Spark analysis, never silently."""
    import pytest

    from postbound_spark.plans import relalg as ra
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import UnsupportedSqlError

    # uncorrelated global aggregate: lifted, CrossProduct in the tree
    tree = parse_relalg(
        parse_query(
            "SELECT c_custkey, (SELECT max(o_orderkey) FROM orders) AS mx "
            "FROM customer"
        )
    )
    assert any(isinstance(n, ra.CrossProduct) for n in tree.walk())

    # QUALIFIED correlated aggregate in a NON-aggregated outer:
    # decorrelated into a LATERAL left join (round-8b)
    tree = parse_relalg(
        parse_query(
            "SELECT c.c_custkey, (SELECT count(*) FROM orders o "
            "WHERE o.o_custkey = c.c_custkey) AS n FROM customer c"
        )
    )
    assert any(
        isinstance(n, ra.ThetaJoin) and n.how == "left" for n in tree.walk()
    )

    # QUALIFIED correlated aggregate in an AGGREGATED outer: the
    # decorrelated join would have to sit above the outer Grouping on
    # non-key columns — clean rejection, spark.sql route
    with pytest.raises(UnsupportedSqlError, match="correlated"):
        parse_relalg(
            parse_query(
                "SELECT c.c_nationkey, count(*) AS n, "
                "(SELECT max(o.o_orderkey) FROM orders o "
                "WHERE o.o_custkey = c.c_custkey) AS m "
                "FROM customer c GROUP BY c.c_nationkey"
            )
        )

    # no single-row guarantee: clean rejection
    with pytest.raises(UnsupportedSqlError, match="single-row"):
        parse_relalg(
            parse_query(
                "SELECT c_custkey, (SELECT o_orderkey FROM orders) AS x "
                "FROM customer"
            )
        )


def test_scalar_subquery_limit_offset_blocks_the_lift():
    """Round-9 (advisor, medium): LIMIT/OFFSET break the single-row
    guarantee in BOTH lift branches — '(SELECT max(b) FROM s LIMIT 0)'
    and '(SELECT 5 OFFSET 1)' are ZERO-row, and lifting them as a cross
    product silently emptied the whole outer result where SQL semantics
    say the scalar is NULL. Clean rejection -> spark.sql route."""
    import pytest

    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import UnsupportedSqlError

    for sub in (
        "(SELECT max(o_orderkey) FROM orders LIMIT 0)",
        "(SELECT max(o_orderkey) FROM orders LIMIT 1)",
        "(SELECT max(o_orderkey) FROM orders OFFSET 1)",
        "(SELECT 5 LIMIT 0)",
        "(SELECT 5 OFFSET 1)",
    ):
        with pytest.raises(UnsupportedSqlError, match="single-row"):
            parse_relalg(
                parse_query(f"SELECT c_custkey, {sub} AS x FROM customer")
            )


def test_scalar_subquery_span_survives_paren_in_literal(spark, sf_small):
    """Round-9 (advisor): a ')' INSIDE a string literal within a real
    scalar subquery must not truncate the balanced-paren span — the span
    scan now balances over the literal-blanked text (same-length
    blanking, indices map 1:1)."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    cat = load_tables(spark, sf_small, ["region", "nation"])
    sql = (
        "SELECT r_regionkey, "
        "(SELECT max(n_name) FROM nation WHERE n_name <> ':)') AS m "
        "FROM region ORDER BY r_regionkey LIMIT 1"
    )
    df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
    rows = [tuple(r) for r in df.collect()]
    assert len(rows) == 1 and rows[0][0] == 0 and rows[0][1] is not None


def test_subquery_guard_ignores_string_literals(spark, sf_small):
    """A string LITERAL containing "(select " is data, not a subquery —
    the guard strips literals before matching (advisor-found false
    positive, round 8). Both the projection and the predicate guard."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    cat = load_tables(spark, sf_small, ["region"])
    sql = (
        "SELECT r_regionkey, '(select ' AS s FROM region "
        "WHERE r_name <> '(select 1)' ORDER BY r_regionkey LIMIT 2"
    )
    df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
    rows = [tuple(r) for r in df.collect()]
    assert rows == [(0, "(select "), (1, "(select ")]


class TestArrayOperatorSpellings:
    """Round-9: Postgres array operators @> / <@ / && as first-class
    binary predicates (ref qal/_qal.py:55-58 Contains/ContainedBy/
    Overlaps) — tokenized, modeled in the IR, lowered to Spark's
    lambda-free collection functions by to_sql()."""

    def test_ir_models_the_operators(self):
        from postbound_spark.plans import qal as Q

        q = parse_query(
            "SELECT doc_id FROM documents "
            "WHERE toks @> ARRAY['a'] AND toks <@ ARRAY['b'] "
            "AND toks && ARRAY['c']"
        )
        ops = [
            p.operation
            for p in q.where.iterpredicates()
            if isinstance(p, Q.BinaryPredicate)
        ]
        assert Q.LogicalOperator.CONTAINS in ops
        assert Q.LogicalOperator.CONTAINED_BY in ops
        assert Q.LogicalOperator.OVERLAPS in ops

    def test_to_sql_lowers_to_spark_spellings(self):
        q = parse_query("SELECT 1 AS x WHERE a @> b")
        assert q.where.to_sql() == "size(array_except((b), (a))) = 0"
        q = parse_query("SELECT 1 AS x WHERE a <@ b")
        assert q.where.to_sql() == "size(array_except((a), (b))) = 0"
        q = parse_query("SELECT 1 AS x WHERE a && b")
        assert q.where.to_sql() == "arrays_overlap((a), (b))"

    def test_parenthesized_lhs_reparses_as_expression(self):
        # the (expr) OP tail disambiguation covers the new operators
        q = parse_query("SELECT 1 AS x WHERE (a || b) && c")
        assert "arrays_overlap" in q.where.to_sql()


class TestSetQueryOffsetAndCte:
    """Round-9: OFFSET and WITH on set queries (ref SetQuery full Limit
    clause qal/_qal.py:9425/:9449 and cte_clause :9423)."""

    def test_offset_parses_and_renders(self):
        from postbound_spark.plans import qal as Q

        q = parse_query(
            "SELECT r_name FROM region UNION ALL SELECT n_name FROM nation "
            "ORDER BY r_name LIMIT 5 OFFSET 3"
        )
        assert isinstance(q, Q.SetQuery)
        assert q.limit == 5 and q.offset == 3
        assert "OFFSET 3" in q.to_sql()

    def test_offset_without_limit(self):
        from postbound_spark.plans import qal as Q

        q = parse_query(
            "SELECT r_name FROM region UNION SELECT n_name FROM nation "
            "ORDER BY r_name OFFSET 7"
        )
        assert isinstance(q, Q.SetQuery)
        assert q.limit is None and q.offset == 7

    def test_with_over_set_query_scopes_both_operands(self, spark, sf_small):
        from postbound_spark.catalog import load_tables
        from postbound_spark.operators.compiler import compile_plan
        from postbound_spark.plans import qal as Q
        from postbound_spark.plans.algebra import parse_relalg

        sql = (
            "WITH t AS (SELECT r_regionkey AS k FROM region) "
            "SELECT k FROM t WHERE k < 2 "
            "UNION ALL SELECT k + 10 FROM t WHERE k >= 3 "
            "ORDER BY 1 OFFSET 1"
        )
        q = parse_query(sql)
        assert isinstance(q, Q.SetQuery) and q.ctes
        cat = load_tables(spark, sf_small, ["region"])
        df = compile_plan(parse_relalg(q), spark, cat)
        assert [r[0] for r in df.collect()] == [1, 13, 14]

    def test_fetch_prior_on_set_query_still_rejected(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        with pytest.raises(UnsupportedSqlError, match="PRIOR"):
            parse_query(
                "SELECT r_name FROM region UNION SELECT n_name FROM nation "
                "ORDER BY r_name FETCH PRIOR 3 ROWS ONLY"
            )


class TestExplainClause:
    """Round-9: EXPLAIN [ANALYZE] [(options)] parsed into the IR (ref
    Explain qal/_qal.py:5161 / ExplainStmt parse parser.py:1996) — the
    reference's pglast parser accepts the statement form; ours now does
    too, for both query kinds."""

    def test_plain_explain(self):
        from postbound_spark.plans import qal as Q

        q = parse_query("EXPLAIN SELECT r_name FROM region")
        assert q.explain == Q.Explain(False, "TEXT")
        assert q.to_sql().startswith("EXPLAIN\nSELECT")

    def test_explain_analyze_and_options(self):
        from postbound_spark.plans import qal as Q

        q = parse_query("EXPLAIN ANALYZE SELECT r_name FROM region")
        assert q.explain == Q.Explain(True, "TEXT")
        q = parse_query(
            "EXPLAIN (ANALYZE, FORMAT JSON) SELECT r_name FROM region"
        )
        assert q.explain == Q.Explain(True, "JSON")
        with pytest.raises(ParserError, match="explain option"):
            parse_query("EXPLAIN (WIBBLE) SELECT 1")

    def test_explain_set_query(self):
        from postbound_spark.plans import qal as Q

        q = parse_query(
            "EXPLAIN SELECT r_name FROM region UNION SELECT n_name FROM nation"
        )
        assert isinstance(q, Q.SetQuery)
        assert q.explain is not None

    def test_explain_parenthesized_query_not_options(self):
        # EXPLAIN (SELECT ...) — parens open a query, not an option list
        q = parse_query("EXPLAIN (SELECT r_name FROM region)")
        assert q.explain is not None

    def test_facade_returns_plan_text(self, spark, sf_small):
        from postbound_spark.database import Database

        db = Database(spark, sf_small, rebind=True)
        try:
            plan = db.execute_query(
                "EXPLAIN SELECT count(*) AS n FROM nation WHERE n_regionkey = 1",
                native=True,
            )
            assert isinstance(plan, str) and "Physical Plan" in plan
            rows = db.execute_query(
                "EXPLAIN ANALYZE SELECT count(*) AS n FROM nation",
                native=True,
                raw=True,
            )
            assert len(rows) == 1 and "Cost" in rows[0][0] or "Statistics" in rows[0][0]
        finally:
            db.release()


def test_table_shorthand_and_estrings(spark, sf_small):
    """Round-9 probe battery: `TABLE name` shorthand and E'' escape
    strings — pglast normalizes both to plain forms, so the reference's
    parser accepts them transparently; ours now does too."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans import qal as Q
    from postbound_spark.plans.algebra import parse_relalg

    q = parse_query("TABLE region")
    assert isinstance(q, Q.SqlQuery) and q.select[0].expr.sql == "*"
    cat = load_tables(spark, sf_small, ["region"])
    assert compile_plan(parse_relalg(q), spark, cat).count() == 5

    # set-op composition
    q2 = parse_query("TABLE region UNION ALL TABLE region")
    assert compile_plan(parse_relalg(q2), spark, cat).count() == 10

    # E-string escapes decode to ANSI literals at tokenize time
    q3 = parse_query(r"SELECT E'a\nb' AS s, E'it\'s' AS t")
    rendered = q3.to_sql()
    assert "'a\nb'" in rendered and "'it''s'" in rendered
    rows = compile_plan(parse_relalg(q3), spark, {}).collect()
    assert rows[0].s == "a\nb" and rows[0].t == "it's"


def test_ansi_set_distinct_spellings_and_countless_fetch():
    """UNION/INTERSECT/EXCEPT DISTINCT are the explicit ANSI spellings of
    the default; FETCH FIRST ROW ONLY defaults the count to 1."""
    from postbound_spark.plans import qal as Q

    q = parse_query(
        "SELECT a FROM t UNION DISTINCT SELECT a FROM u "
        "INTERSECT DISTINCT SELECT a FROM v"
    )
    assert q.operator is Q.SetOperator.UNION
    assert q.right.operator is Q.SetOperator.INTERSECT
    e = parse_query("SELECT a FROM t EXCEPT DISTINCT SELECT a FROM u")
    assert e.operator is Q.SetOperator.EXCEPT
    one = parse_query("SELECT a FROM t ORDER BY a FETCH FIRST ROW ONLY")
    assert one.limit == 1 and not one.fetch_ties
    ties = parse_query("SELECT a FROM t ORDER BY a FETCH NEXT ROWS WITH TIES")
    assert ties.limit == 1 and ties.fetch_ties


def test_probe_battery_closures(spark, sf_small):
    """Round-9b probe-battery closures: row-value constructors (=, <>,
    IN-list), the = ANY / <> ALL subquery identities (routed through the
    semi/anti-join machinery), LIKE ... ESCAPE, unquoted INTERVAL
    literals, and the length-less VARCHAR/TEXT casts (mapped to STRING
    at the Spark boundary)."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    cat = load_tables(spark, sf_small, ["nation", "region", "orders"])

    def one(sql: str):
        rows = compile_plan(parse_relalg(parse_query(sql)), spark, cat).collect()
        return rows[0][0]

    assert one(
        "SELECT count(*) AS n FROM nation WHERE (n_nationkey, n_regionkey) = (0, 0)"
    ) == 1
    assert one(
        "SELECT count(*) AS n FROM nation "
        "WHERE (n_regionkey, n_nationkey) IN ((0, 0), (1, 1), (0, 20))"
    ) == 3
    assert one(
        "SELECT count(*) AS n FROM nation "
        "WHERE (n_regionkey, n_nationkey) NOT IN ((0, 0), (1, 1))"
    ) == 23
    # = ANY (sub) == IN (sub); <> ALL (sub) == null-aware NOT IN
    assert one(
        "SELECT count(*) AS n FROM nation WHERE n_regionkey = ANY "
        "(SELECT r_regionkey FROM region WHERE r_regionkey < 2)"
    ) == one(
        "SELECT count(*) AS n FROM nation WHERE n_regionkey IN "
        "(SELECT r_regionkey FROM region WHERE r_regionkey < 2)"
    )
    assert one(
        "SELECT count(*) AS n FROM nation WHERE n_regionkey <> ALL "
        "(SELECT r_regionkey FROM region WHERE r_regionkey < 2)"
    ) == 15
    # LIKE ESCAPE: '!_' is a literal underscore (fixture names are
    # NATION_0..24, so exactly one row matches; if the ESCAPE clause
    # were dropped, the literal '!' in the pattern would match nothing)
    assert one(
        "SELECT count(*) AS n FROM nation "
        "WHERE n_name LIKE 'NATION!_1' ESCAPE '!'"
    ) == 1
    # unquoted INTERVAL normalizes to the quoted portable form
    q = parse_query("SELECT o_orderdate + INTERVAL 30 DAY AS d FROM orders")
    assert "INTERVAL '30' DAY" in q.to_sql()
    # bare VARCHAR / TEXT casts execute (Spark demands VARCHAR(n))
    assert isinstance(
        one("SELECT CAST(n_nationkey AS VARCHAR) AS s FROM nation LIMIT 1"),
        str,
    )
    import pytest

    from postbound_spark.plans.parser import UnsupportedSqlError

    with pytest.raises(UnsupportedSqlError, match="equal"):
        parse_query("SELECT 1 FROM t WHERE (a, b) = (1, 2, 3)")
    # round-10: lexicographic row ordering now desugars to the ANSI
    # recursion instead of rejecting
    q = parse_query("SELECT 1 FROM t WHERE (a, b) < (1, 2)")
    assert "a < 1" in q.where.to_sql() and "b < 2" in q.where.to_sql()


def test_top_level_values_statement(spark):
    """ANSI table-value constructor as a standalone statement: columns
    named col0..colN-1 (DuckDB's default, so identical text stays
    oracle-comparable), composing with ORDER BY ordinals and set ops."""
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    def run(sql: str):
        return [
            tuple(r)
            for r in compile_plan(parse_relalg(parse_query(sql)), spark).collect()
        ]

    assert run("VALUES (2, 'b'), (1, 'a') ORDER BY 1") == [(1, "a"), (2, "b")]
    assert run("VALUES (3), (1) UNION ALL VALUES (2) ORDER BY col0") == [
        (1,), (2,), (3,)
    ]
    assert run(
        "VALUES (5), (6) INTERSECT ALL VALUES (6), (7) ORDER BY col0"
    ) == [(6,)]


def test_having_membership_subqueries(spark, sf_small):
    """EXISTS / NOT EXISTS / IN / NOT IN subqueries in HAVING position
    compile as semi/anti joins above the aggregate; correlation may use
    the qualified source column or the select alias; the plain-query
    guard rejects HAVING memberships with no aggregation."""
    import pytest

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import UnsupportedSqlError

    cat = load_tables(spark, sf_small, ["nation", "region", "customer"])

    def run(sql: str):
        df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
        return sorted(tuple(r) for r in df.collect())

    got = run(
        "SELECT n_regionkey AS k, count(*) AS n FROM nation "
        "GROUP BY n_regionkey HAVING EXISTS (SELECT 1 FROM region "
        "WHERE r_regionkey = nation.n_regionkey AND r_regionkey < 2) "
        "ORDER BY k"
    )
    assert got == [(0, 5), (1, 5)]
    # alias-correlated + mixed with an ordinary aggregate conjunct
    alias_form = run(
        "SELECT n_regionkey AS k, count(*) AS n FROM nation n2 GROUP BY k "
        "HAVING EXISTS (SELECT 1 FROM region WHERE r_regionkey = "
        "n2.n_regionkey) AND count(*) > 3 ORDER BY k"
    )
    assert len(alias_form) == 5
    # aggregate NOT IN subquery (null-aware anti join)
    anti = run(
        "SELECT c_nationkey AS k, count(*) AS n FROM customer "
        "GROUP BY c_nationkey HAVING count(*) NOT IN "
        "(SELECT r_regionkey FROM region) ORDER BY k"
    )
    assert all(n not in range(5) for _k, n in anti)
    with pytest.raises(UnsupportedSqlError, match="no aggregation"):
        parse_relalg(
            parse_query(
                "SELECT n_name FROM nation HAVING EXISTS "
                "(SELECT 1 FROM region)"
            )
        )


def test_rollup_cube_desugar(spark, sf_small):
    """GROUP BY ROLLUP/CUBE desugar into the GROUPING SETS expansion
    (probe-battery find: the spellings previously parsed as function
    calls and crashed at analysis); mixing with plain items composes as
    the ANSI cross product (round-11)."""
    import pytest

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import UnsupportedSqlError

    cat = load_tables(spark, sf_small, ["nation"])

    def run(sql: str):
        df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
        return sorted((tuple(r) for r in df.collect()), key=repr)

    rollup = run(
        "SELECT n_regionkey AS k, count(*) AS n FROM nation "
        "GROUP BY ROLLUP (n_regionkey)"
    )
    assert (None, 25) in rollup and len(rollup) == 6  # 5 regions + total
    cube = run(
        "SELECT n_regionkey AS k, n_nationkey AS i, count(*) AS n "
        "FROM nation GROUP BY CUBE (n_regionkey, n_nationkey)"
    )
    # power set: (k,i) 25 + k 5 + i 25 + total 1
    assert len(cube) == 56
    havg = run(
        "SELECT n_regionkey AS k, count(*) AS n FROM nation "
        "GROUP BY ROLLUP(n_regionkey) HAVING count(*) > 3"
    )
    assert (None, 25) in havg and len(havg) == 6
    # round-11: mixing plain items with ROLLUP/CUBE now composes as the
    # ANSI cross product instead of rejecting
    mixed = run(
        "SELECT n_name AS a, n_regionkey AS b, count(*) AS n "
        "FROM nation GROUP BY n_name, ROLLUP(n_regionkey)"
    )
    # every nation appears grouped (a,b) and subtotaled (a, NULL)
    assert len(mixed) == 50


def test_in_over_set_query(spark, sf_small):
    """IN / NOT IN over a SET-QUERY subquery (probe-battery find — was a
    documented rejection): the membership column is the leftmost
    operand's projection; NOT IN keeps the null-aware anti-join form."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    cat = load_tables(spark, sf_small, ["nation", "region"])

    def one(sql: str):
        return compile_plan(parse_relalg(parse_query(sql)), spark, cat).collect()[0][0]

    assert one(
        "SELECT count(*) AS n FROM nation WHERE n_regionkey IN "
        "(SELECT r_regionkey FROM region WHERE r_regionkey < 2 "
        "UNION SELECT 4)"
    ) == 15
    assert one(
        "SELECT count(*) AS n FROM nation WHERE n_regionkey NOT IN "
        "(SELECT r_regionkey FROM region WHERE r_regionkey < 1 "
        "UNION ALL SELECT 3)"
    ) == 15


def test_group_by_all_order_by_all(spark, sf_small):
    """GROUP BY ALL expands to every non-aggregate select item; ORDER BY
    ALL expands to one key per select item in list order; rejections for
    star selects and window-bearing items are loud."""
    import pytest

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import UnsupportedSqlError

    cat = load_tables(spark, sf_small, ["nation"])
    q = parse_query(
        "SELECT n_regionkey AS k, count(*) AS n FROM nation "
        "GROUP BY ALL ORDER BY ALL"
    )
    assert [e.sql for e in q.group_by] == ["n_regionkey"]
    assert [o.expr.sql for o in q.order_by] == ["k", "n"]
    rows = compile_plan(parse_relalg(q), spark, cat).collect()
    assert [tuple(r) for r in rows] == [(i, 5) for i in range(5)]
    desc = parse_query("SELECT a, b FROM t ORDER BY ALL DESC")
    assert all(not o.ascending for o in desc.order_by)
    with pytest.raises(UnsupportedSqlError, match="star"):
        parse_query("SELECT * FROM t GROUP BY ALL")
    with pytest.raises(UnsupportedSqlError, match="no non-aggregate"):
        parse_query("SELECT count(*) FROM t GROUP BY ALL")


def test_grouping_marker_under_desugar_and_alias_order_expr(spark, sf_small):
    """Wave-3 probe closures: GROUPING(col) under the grouping-sets
    desugar becomes the per-set 0/1 constant (no Spark grouping() call
    outside a native GROUPING SETS context), and ORDER BY expressions
    over output aliases inline the defining expression."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    cat = load_tables(spark, sf_small, ["nation"])

    def run(sql: str):
        df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
        return [tuple(r) for r in df.collect()]

    marks = run(
        "SELECT n_regionkey AS k, count(*) AS n, "
        "CAST(grouping(n_regionkey) AS INT) AS g FROM nation "
        "GROUP BY ROLLUP(n_regionkey) ORDER BY k NULLS FIRST"
    )
    assert marks[0] == (None, 25, 1)  # the super-aggregate row marks 1
    assert all(g == 0 for _k, _n, g in marks[1:])
    ordered = run(
        "SELECT split_part(n_name, '_', 2) AS num FROM nation "
        "ORDER BY CAST(num AS INTEGER) LIMIT 3"
    )
    assert [r[0] for r in ordered] == ["0", "1", "2"]


def test_recursive_self_ref_in_subquery_rejected():
    """Round-10 advisor fix: a WITH RECURSIVE self-reference appearing
    only inside a WHERE/SELECT subquery of the step must be rejected
    loudly (Postgres rejects the shape too), never resolved against the
    catalog as a plain table."""
    with pytest.raises(UnsupportedSqlError, match="subquery of the recursive step"):
        parse_query(
            "WITH RECURSIVE r(n) AS (SELECT 1 AS n UNION ALL "
            "SELECT n+1 FROM nation WHERE n IN (SELECT n FROM r)) "
            "SELECT * FROM r"
        )
    with pytest.raises(UnsupportedSqlError, match="subquery of the recursive step"):
        parse_query(
            "WITH RECURSIVE r(n) AS (SELECT 1 AS n UNION ALL "
            "SELECT (SELECT max(n) FROM r) + 1 FROM nation) SELECT * FROM r"
        )
    # plain CTE under the RECURSIVE keyword and a true recursive CTE both
    # still classify
    q = parse_query("WITH RECURSIVE r AS (SELECT 1 AS n) SELECT * FROM r")
    assert type(q.ctes[0]).__name__ == "CommonTableExpression"
    q = parse_query(
        "WITH RECURSIVE r(n) AS (SELECT 1 AS n UNION ALL "
        "SELECT n+1 FROM r WHERE n < 5) SELECT * FROM r"
    )
    assert type(q.ctes[0]).__name__ == "RecursiveCte"


def test_order_by_alias_inlining_is_literal_safe(spark, sf_small):
    """Round-10 advisor fix: ORDER-BY-expression alias inlining must not
    rewrite an alias name that appears inside a string literal."""
    sql = (
        "SELECT n_name AS n, CASE WHEN substr(n_name, 1, 1) = 'n' "
        "THEN 1 ELSE 2 END AS c FROM nation "
        "ORDER BY concat(n, 'n') DESC LIMIT 5"
    )
    tables = load_tables(spark, sf_small, ["nation"])
    got_df = compile_plan(parse_relalg(parse_query(sql)), spark, tables)
    got = [tuple(r) for r in got_df.collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM read_parquet('{sf_small}/nation.parquet')"
    )
    want = con.execute(sql).fetchall()
    assert got == [tuple(r) for r in want] and len(got) == 5


MEMBERSHIP_EXPR_CASES = {
    "case_exists_uncorr": "SELECT n_name, CASE WHEN EXISTS (SELECT 1 FROM region WHERE r_name = 'ASIA') THEN 'y' ELSE 'n' END AS flag FROM nation ORDER BY n_name",
    "case_exists_corr": "SELECT n.n_name, CASE WHEN EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000) THEN 'rich' ELSE 'poor' END AS flag FROM nation n ORDER BY n.n_name",
    "select_exists_bool": "SELECT n.n_name, EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000) AS has_rich FROM nation n ORDER BY n.n_name",
    "or_exists": "SELECT n.n_name FROM nation n WHERE n.n_regionkey = 0 OR EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9900) ORDER BY n.n_name",
    "not_exists_case": "SELECT n.n_name, CASE WHEN NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey) THEN 'empty' ELSE 'has' END AS flag FROM nation n ORDER BY n.n_name",
    "case_in_uncorr": "SELECT n.n_name, CASE WHEN n.n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%') THEN 'a' ELSE 'other' END AS grp FROM nation n ORDER BY n.n_name",
    "select_in_bool": "SELECT n.n_name, n.n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%') AS in_a FROM nation n ORDER BY n.n_name",
    "select_not_in_bool": "SELECT n.n_name, n.n_regionkey NOT IN (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%') AS not_in_a FROM nation n ORDER BY n.n_name",
    "in_null_probe": "SELECT n.n_name, (CASE WHEN n.n_regionkey = 0 THEN NULL ELSE n.n_regionkey END) IN (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%') AS f FROM nation n ORDER BY n.n_name",
    "exists_groupby": "SELECT n.n_name, CASE WHEN EXISTS (SELECT c.c_mktsegment FROM customer c WHERE c.c_nationkey = n.n_nationkey GROUP BY c.c_mktsegment) THEN 1 ELSE 0 END AS g FROM nation n ORDER BY n.n_name",
    "exists_set_uncorr": "SELECT n_name, CASE WHEN EXISTS (SELECT r_regionkey FROM region UNION SELECT n_regionkey FROM nation) THEN 1 ELSE 0 END AS g FROM nation ORDER BY n_name",
    "exists_limit0": "SELECT n_name, CASE WHEN EXISTS (SELECT 1 FROM region LIMIT 0) THEN 1 ELSE 0 END AS g FROM nation ORDER BY n_name",
    "bool_comparison_item": "SELECT n_name, n_regionkey > 2 AS big, n_regionkey = 1 OR n_regionkey = 3 AS oneorthree FROM nation ORDER BY n_name",
    "not_item": "SELECT n_name, NOT (n_regionkey > 2) AS small FROM nation ORDER BY n_name",
}


@pytest.mark.parametrize("name", sorted(MEMBERSHIP_EXPR_CASES))
def test_membership_in_expression_position(name, spark, sf_small):
    """Round-10: EXISTS / IN / boolean predicates in EXPRESSION position
    (CASE branches, OR arms, boolean select items) on the NATIVE algebra
    path — the last reference-representable residual (ref parser.py:764-808
    parses CASE conditions as predicates; :1121 builds UnaryPredicate.exists).
    Differential against DuckDB on identical text, incl. three-valued IN
    (NULL probe) and set-query / GROUP BY / LIMIT 0 EXISTS bodies."""
    sql = MEMBERSHIP_EXPR_CASES[name]
    tables = ["nation", "region", "customer", "orders", "supplier"]
    cat = load_tables(spark, sf_small, tables)
    got_df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
    got = [tuple(r) for r in got_df.collect()]
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
        )
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    assert got == want and len(got) > 0


ORDERED_AGG_CASES = {
    "string_agg_asc": "SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
    "string_agg_desc": "SELECT n_regionkey, string_agg(n_name, '|' ORDER BY n_name DESC) AS names FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
    "string_agg_other_key": "SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_nationkey DESC) AS names FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
    "array_agg_multi_key": "SELECT c_nationkey, array_agg(c_name ORDER BY c_mktsegment, c_custkey) AS names FROM customer WHERE c_custkey < 80 GROUP BY c_nationkey ORDER BY c_nationkey",
    "string_agg_distinct": "SELECT c_nationkey, string_agg(DISTINCT c_mktsegment, '/' ORDER BY c_mktsegment) AS segs FROM customer GROUP BY c_nationkey ORDER BY c_nationkey",
    "array_agg_distinct_desc": "SELECT c_nationkey, array_agg(DISTINCT c_mktsegment ORDER BY c_mktsegment DESC) AS segs FROM customer GROUP BY c_nationkey ORDER BY c_nationkey",
    "global_string_agg": "SELECT string_agg(n_name, ';' ORDER BY n_name) AS all_names FROM nation WHERE n_regionkey = 2",
}


@pytest.mark.parametrize("name", sorted(ORDERED_AGG_CASES))
def test_in_call_aggregate_order_by(name, spark, sf_small):
    """Round-10 extension BEYOND the reference (its parser models
    agg_filter only, no aggOrder — parser.py:1013-1069): in-call
    aggregate ORDER BY lowered to the struct-sort spelling
    (_lower_ordered_agg). Differential against DuckDB's native in-call
    ordering on identical text."""
    sql = ORDERED_AGG_CASES[name]
    tables = ["nation", "customer"]
    cat = load_tables(spark, sf_small, tables)
    got_df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
    got = [tuple(tuple(v) if isinstance(v, list) else v for v in r) for r in got_df.collect()]
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
        )
    want = [tuple(tuple(v) if isinstance(v, list) else v for v in r) for r in con.execute(sql).fetchall()]
    assert got == want and len(got) > 0


def test_in_call_order_by_rejections():
    """Unsupported ordered-agg shapes reject loudly with actionable
    messages (never silently drop the ordering)."""
    for sql, msg in [
        ("SELECT sum(n_nationkey ORDER BY n_name) FROM nation", "not modeled"),
        ("SELECT string_agg(DISTINCT n_name, ',' ORDER BY n_regionkey) FROM nation", "aggregated expression itself"),
        ("SELECT string_agg(n_name, ',' ORDER BY n_name) FILTER (WHERE n_regionkey = 1) FROM nation", "FILTER/OVER"),
    ]:
        with pytest.raises(UnsupportedSqlError, match=msg):
            parse_query(sql)
    # round-11: mixed ASC/DESC and NULLS FIRST/LAST are SUPPORTED now
    # (comparator-lambda lowering) — they must parse, not reject
    for sql in [
        "SELECT string_agg(n_name, ',' ORDER BY n_regionkey, n_name DESC) FROM nation",
        "SELECT string_agg(n_name, ',' ORDER BY n_name NULLS LAST) FROM nation",
    ]:
        parse_query(sql)


WAVE4_CASES = {
    "qualify_rownum": "SELECT n_name, n_regionkey FROM nation QUALIFY row_number() OVER (PARTITION BY n_regionkey ORDER BY n_name) = 1 ORDER BY n_name",
    "qualify_alias": "SELECT o_custkey, o_totalprice, rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS r FROM orders WHERE o_orderkey < 2000 QUALIFY r <= 2 ORDER BY o_custkey, o_totalprice DESC",
    "qualify_named_window": "SELECT n_name, n_regionkey FROM nation WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_name) QUALIFY row_number() OVER w = 1 ORDER BY n_name",
    "window_filter": "SELECT n_name, count(*) FILTER (WHERE n_regionkey > 1) OVER (PARTITION BY n_regionkey) AS c FROM nation ORDER BY n_name",
    "window_filter_arg": "SELECT n_name, sum(n_nationkey) FILTER (WHERE n_regionkey <> 2) OVER (PARTITION BY n_regionkey) AS s FROM nation ORDER BY n_name",
    "window_distinct": "SELECT n_name, count(DISTINCT n_regionkey) OVER () AS d FROM nation ORDER BY n_name",
    "window_filter_distinct": "SELECT o_orderkey, count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 100000) OVER (PARTITION BY o_orderstatus) AS d FROM orders WHERE o_orderkey < 400 ORDER BY o_orderkey",
    "case_result_predicate": "SELECT n_name, CASE WHEN n_regionkey > 2 THEN n_nationkey > 10 ELSE n_nationkey < 5 END AS f FROM nation ORDER BY n_name",
    "exists_in_order_by": "SELECT n_name FROM nation n ORDER BY EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9500) DESC, n_name",
    "recursive_refs_outer_cte": "WITH RECURSIVE lim(m) AS (SELECT 4), seq(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM seq, lim WHERE n < m) SELECT n FROM seq ORDER BY n",
}


@pytest.mark.parametrize("name", sorted(WAVE4_CASES))
def test_probe_wave4_closures(name, spark, sf_small):
    """Round-10 probe-battery wave-4 closures: QUALIFY (parse-time
    desugar), FILTER/DISTINCT on window aggregates (CASE-argument /
    collect_set lowering), predicates as CASE result values, EXISTS in
    ORDER BY keys, a recursive CTE reading an earlier CTE. Differential
    vs DuckDB on identical text."""
    sql = WAVE4_CASES[name]
    tables = ["nation", "region", "customer", "orders"]
    cat = load_tables(spark, sf_small, tables)
    got_df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
    got = sorted(map(repr, (tuple(r) for r in got_df.collect())))
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
        )
    want = sorted(map(repr, (tuple(r) for r in con.execute(sql).fetchall())))
    assert got == want and len(got) > 0


GROUP_BY_SUBQUERY_CASES = {
    "group_by_exists_alias": "SELECT EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9500) AS has_rich, count(*) AS c FROM nation n GROUP BY has_rich ORDER BY has_rich",
    "group_by_in_alias": "SELECT n.n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%') AS in_a, count(*) AS c FROM nation n GROUP BY in_a ORDER BY in_a",
    "group_by_scalar_alias": "SELECT (SELECT max(r_regionkey) FROM region) AS m, count(*) AS c FROM nation GROUP BY m ORDER BY m",
    "group_by_case_exists": "SELECT CASE WHEN EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9500) THEN 'rich' ELSE 'poor' END AS cls, count(*) AS c FROM nation n GROUP BY cls ORDER BY cls",
}


@pytest.mark.parametrize("name", sorted(GROUP_BY_SUBQUERY_CASES))
def test_group_by_over_subquery_booleans(name, spark, sf_small):
    """Round-10 (wave-4 follow-up): GROUP BY over a membership/scalar
    select alias — the key evaluates PRE-aggregation, so its lifts
    (decorrelated membership laterals, 1-row scalar attaches) compile
    below the Grouping (pass 1.5 in plans/algebra.py convert())."""
    sql = GROUP_BY_SUBQUERY_CASES[name]
    tables = ["nation", "region", "customer"]
    cat = load_tables(spark, sf_small, tables)
    got_df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
    got = sorted(map(repr, (tuple(r) for r in got_df.collect())))
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
        )
    want = sorted(map(repr, (tuple(r) for r in con.execute(sql).fetchall())))
    assert got == want and len(got) > 0


AGG_MEMBERSHIP_CASES = {
    "agg_case_exists_groupkey": "SELECT n.n_regionkey, count(*) AS n_nations, CASE WHEN EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey AND r.r_name LIKE 'A%') THEN 1 ELSE 0 END AS flag FROM nation n GROUP BY n.n_regionkey ORDER BY n.n_regionkey",
    "agg_exists_alias_key": "SELECT n.n_regionkey AS rk, count(*) AS c, EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey AND r.r_name LIKE 'E%') AS is_e FROM nation n GROUP BY rk ORDER BY rk",
    "agg_in_probe_groupkey": "SELECT c.c_nationkey, count(*) AS c, c.c_nationkey IN (SELECT s.s_nationkey FROM supplier s WHERE s.s_acctbal > 5000) AS has_sup FROM customer c GROUP BY c.c_nationkey ORDER BY c.c_nationkey",
    "agg_order_by_exists": "SELECT n.n_regionkey, count(*) AS c FROM nation n GROUP BY n.n_regionkey ORDER BY EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey AND r.r_name LIKE 'A%') DESC, n.n_regionkey",
}


@pytest.mark.parametrize("name", sorted(AGG_MEMBERSHIP_CASES))
def test_membership_above_the_aggregate(name, spark, sf_small):
    """Round-10: correlated memberships in SELECT/ORDER BY of an
    AGGREGATED query — the count lateral decorrelates ABOVE the
    Grouping, its correlation keys degrouped to the aggregate's output
    columns (the same rename table HAVING memberships use)."""
    sql = AGG_MEMBERSHIP_CASES[name]
    tables = ["nation", "region", "customer", "supplier"]
    cat = load_tables(spark, sf_small, tables)
    got_df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
    got = sorted(map(repr, (tuple(r) for r in got_df.collect())))
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
        )
    want = sorted(map(repr, (tuple(r) for r in con.execute(sql).fetchall())))
    assert got == want and len(got) > 0


ROW_VALUE_CASES = {
    # (engine SQL, DuckDB oracle SQL) — DuckDB has no multi-column IN
    # subquery, so those oracles use the equivalent EXISTS spelling
    "row_in_subquery": (
        "SELECT n_name FROM nation WHERE (n_regionkey, n_nationkey) IN (SELECT r_regionkey, r_regionkey * 5 FROM region) ORDER BY n_name",
        "SELECT n_name FROM nation WHERE EXISTS (SELECT 1 FROM region WHERE r_regionkey = n_regionkey AND r_regionkey * 5 = n_nationkey) ORDER BY n_name",
    ),
    "row_not_in_null_aware": (
        "SELECT n_name FROM nation WHERE (n_regionkey, n_nationkey) NOT IN (SELECT r_regionkey, CASE WHEN r_name LIKE 'A%' THEN NULL ELSE r_regionkey * 5 END FROM region) ORDER BY n_name",
        "SELECT n_name FROM nation WHERE NOT EXISTS (SELECT 1 FROM region WHERE ((r_regionkey = n_regionkey) OR (r_regionkey = n_regionkey) IS NULL) AND (((CASE WHEN r_name LIKE 'A%' THEN NULL ELSE r_regionkey * 5 END) = n_nationkey) OR ((CASE WHEN r_name LIKE 'A%' THEN NULL ELSE r_regionkey * 5 END) = n_nationkey) IS NULL)) ORDER BY n_name",
    ),
    "row_any_identity": (
        "SELECT n_name FROM nation WHERE (n_regionkey, n_nationkey) = ANY (SELECT r_regionkey, r_regionkey * 5 FROM region) ORDER BY n_name",
        "SELECT n_name FROM nation WHERE EXISTS (SELECT 1 FROM region WHERE r_regionkey = n_regionkey AND r_regionkey * 5 = n_nationkey) ORDER BY n_name",
    ),
    "row_lex_lt": (
        "SELECT n_name FROM nation WHERE (n_regionkey, n_name) < (2, 'KENYA') ORDER BY n_name",
        None,  # DuckDB runs identical text
    ),
    "row_lex_ge": (
        "SELECT n_name FROM nation WHERE (n_regionkey, n_name) >= (3, 'INDIA') ORDER BY n_name",
        None,
    ),
    "row_lex_col_vs_col": (
        "SELECT o_orderkey FROM orders WHERE (o_custkey, o_orderkey) > (o_orderkey, o_custkey) AND o_orderkey < 300 ORDER BY o_orderkey",
        None,
    ),
}


@pytest.mark.parametrize("name", sorted(ROW_VALUE_CASES))
def test_row_value_subqueries_and_ordering(name, spark, sf_small):
    """Round-10, beyond the reference (no RowExpr in its parser): row
    IN/NOT IN over subqueries (multi-column semi/anti join, NOT IN with
    the per-column null-aware generalization) and LEXICOGRAPHIC row
    ordering comparisons (ANSI recursion a<b OR (a=b AND rest))."""
    sql, oracle = ROW_VALUE_CASES[name]
    tables = ["nation", "region", "orders"]
    cat = load_tables(spark, sf_small, tables)
    got_df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
    got = sorted(map(repr, (tuple(r) for r in got_df.collect())))
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
        )
    want = sorted(map(repr, (tuple(r) for r in con.execute(oracle or sql).fetchall())))
    assert got == want and len(got) > 0


def test_row_lex_null_element_is_ansi(spark, sf_small):
    """NULL row elements follow ANSI/Postgres three-valued semantics
    (UNKNOWN rows drop): the engine matches DuckDB's DESUGARED form.
    DuckDB's own columnar struct-compare instead treats NULL as highest
    (total order) — a documented engine divergence, not ours."""
    sql = (
        "SELECT count(*) AS c FROM nation WHERE (CASE WHEN n_regionkey = 2 "
        "THEN NULL ELSE n_regionkey END, n_nationkey) > (1, 3)"
    )
    cat = load_tables(spark, sf_small, ["nation"])
    got = compile_plan(parse_relalg(parse_query(sql)), spark, cat).collect()[0][0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM read_parquet('{sf_small}/nation.parquet')"
    )
    want = con.execute(
        "SELECT count(*) FROM nation WHERE (CASE WHEN n_regionkey = 2 THEN "
        "NULL ELSE n_regionkey END) > 1 OR ((CASE WHEN n_regionkey = 2 THEN "
        "NULL ELSE n_regionkey END) = 1 AND n_nationkey > 3)"
    ).fetchall()[0][0]
    assert got == want


QUANTIFIER_EXPR_CASES = {
    "all_where_top": "SELECT n_name FROM nation WHERE n_regionkey > ALL (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%') ORDER BY n_name",
    "any_or_arm": "SELECT n_name FROM nation WHERE n_regionkey < ANY (SELECT r_regionkey FROM region WHERE r_name LIKE 'E%') OR n_nationkey = 0 ORDER BY n_name",
    "all_expr_pos": "SELECT n_name, CAST(n_regionkey >= ALL (SELECT r_regionkey FROM region) AS STRING) AS f FROM nation ORDER BY n_name",
    "any_null_probe": "SELECT n_name, CAST((CASE WHEN n_regionkey = 2 THEN NULL ELSE n_regionkey END) > ANY (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%') AS STRING) AS f FROM nation ORDER BY n_name",
    "all_null_elements": "SELECT n_name, CAST(n_regionkey <= ALL (SELECT CASE WHEN r_name LIKE 'A%' THEN NULL ELSE r_regionkey END FROM region) AS STRING) AS f FROM nation ORDER BY n_name",
    "any_null_elements": "SELECT n_name, CAST(n_regionkey < ANY (SELECT CASE WHEN r_name LIKE 'A%' THEN NULL ELSE r_regionkey END FROM region) AS STRING) AS f FROM nation ORDER BY n_name",
    "empty_set_both": "SELECT n_name, CAST(n_regionkey > ALL (SELECT r_regionkey FROM region WHERE r_name = 'NOPE') AS STRING) AS a, CAST(n_regionkey > ANY (SELECT r_regionkey FROM region WHERE r_name = 'NOPE') AS STRING) AS b FROM nation ORDER BY n_name",
    "eq_all": "SELECT n_name, CAST(n_regionkey = ALL (SELECT r_regionkey FROM region WHERE r_name = 'ASIA') AS STRING) AS f FROM nation ORDER BY n_name",
    "ne_any": "SELECT n_name, CAST(n_regionkey <> ANY (SELECT r_regionkey FROM region) AS STRING) AS f FROM nation ORDER BY n_name",
    "all_correlated": "SELECT c.c_name FROM customer c WHERE c.c_acctbal > ALL (SELECT s.s_acctbal FROM supplier s WHERE s.s_nationkey = c.c_nationkey) AND c.c_custkey < 200 ORDER BY c.c_name",
    "some_is_any": "SELECT n_name FROM nation WHERE n_regionkey >= SOME (SELECT r_regionkey FROM region WHERE r_name LIKE 'M%') ORDER BY n_name",
}


@pytest.mark.parametrize("name", sorted(QUANTIFIER_EXPR_CASES))
def test_quantified_comparisons_minmax_form(name, spark, sf_small):
    """Round-10: ANY/ALL/SOME quantified comparisons on the native path
    — the LAST documented rejection. Lowered to the min/max form (four
    1-row aggregates: count, null-count, min, max — no per-row
    nested-loop at any scale) with exact ANSI three-valued semantics:
    empty set, NULL probe, NULL elements, = ALL / <> ANY identities,
    and equality-correlated ALL via the decorrelating lateral."""
    sql = QUANTIFIER_EXPR_CASES[name]
    tables = ["nation", "region", "customer", "supplier"]
    cat = load_tables(spark, sf_small, tables)
    got_df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
    got = sorted(map(repr, (tuple(r) for r in got_df.collect())))
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
        )
    want = sorted(map(repr, (tuple(r) for r in con.execute(sql).fetchall())))
    assert got == want and len(got) > 0


WAVE5_CASES = {
    "extract_dow_postgres_numbering": "SELECT o_orderkey, extract(dow FROM o_orderdate) AS d, extract(isodow FROM o_orderdate) AS iso FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey",
    "extract_epoch": "SELECT o_orderkey, CAST(extract(epoch FROM o_orderdate) AS BIGINT) AS ep FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey",
    "window_inheritance": "SELECT n_name, rank() OVER w2 AS r FROM nation WINDOW w1 AS (PARTITION BY n_regionkey), w2 AS (w1 ORDER BY n_name) ORDER BY n_name",
    "range_frame_numeric": "SELECT o_orderkey, CAST(round(sum(o_totalprice) OVER (ORDER BY o_orderkey RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)) AS BIGINT) AS s FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey",
    "corr_scalar_in_having": "SELECT c.c_nationkey, count(*) AS c FROM customer c GROUP BY c.c_nationkey HAVING count(*) > (SELECT count(*) FROM supplier s WHERE s.s_nationkey = c.c_nationkey) ORDER BY c.c_nationkey",
    "corr_scalar_in_grouped_select": "SELECT c.c_nationkey, count(*) AS n_cust, (SELECT count(*) FROM supplier s WHERE s.s_nationkey = c.c_nationkey) AS n_supp FROM customer c GROUP BY c.c_nationkey ORDER BY c.c_nationkey",
    "corr_scalar_max_grouped": "SELECT c.c_nationkey, count(*) AS n_cust, round((SELECT max(s.s_acctbal) FROM supplier s WHERE s.s_nationkey = c.c_nationkey), 2) AS max_supp FROM customer c GROUP BY c.c_nationkey ORDER BY c.c_nationkey",
}


@pytest.mark.parametrize("name", sorted(WAVE5_CASES))
def test_probe_wave5_closures(name, spark, sf_small):
    """Round-10 probe-battery wave-5 closures: Postgres/DuckDB extract
    numbering (dow Sunday=0, isodow, epoch — Spark diverges or lacks the
    fields), named-window INHERITANCE (w2 AS (w1 ORDER BY …)), RANGE
    frames, and correlated scalar aggregates in HAVING / grouped SELECT
    (decorrelated above the Grouping via the agg-lateral sink)."""
    sql = WAVE5_CASES[name]
    tables = ["nation", "orders", "customer", "supplier"]
    cat = load_tables(spark, sf_small, tables)
    got_df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
    got = sorted(map(repr, (tuple(r) for r in got_df.collect())))
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
        )
    want = sorted(map(repr, (tuple(r) for r in con.execute(sql).fetchall())))
    assert got == want and len(got) > 0


def test_order_by_null_placement_ansi_default(spark, sf_small):
    """Round-10 silent-wrong-results find: Spark's DEFAULT null placement
    (ASC → NULLS FIRST) is the INVERSE of ANSI/Postgres/DuckDB — under
    `ORDER BY nullable_key LIMIT n` the engine returned the NULL rows
    where the reference returns values. The Sort compilation, DISTINCT
    ON ranking, ties cutoff, and window ORDER BY items now all apply the
    ANSI default explicitly (ASC → NULLS LAST, DESC → NULLS FIRST)."""
    cat = load_tables(spark, sf_small, ["nation"])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM read_parquet('{sf_small}/nation.parquet')"
    )
    for sql in [
        "SELECT n_name, CASE WHEN n_regionkey = 2 THEN NULL ELSE n_regionkey END AS k FROM nation ORDER BY k, n_name LIMIT 8",
        "SELECT n_name, CASE WHEN n_regionkey = 2 THEN NULL ELSE n_regionkey END AS k FROM nation ORDER BY k DESC, n_name LIMIT 8",
        # window ranking over a nullable key: rank VALUES move with the
        # null placement, visible even to multiset comparison
        "SELECT n_name, rank() OVER (ORDER BY (CASE WHEN n_regionkey = 2 THEN NULL ELSE n_regionkey END)) AS r FROM nation ORDER BY n_name",
        "SELECT n_name, rank() OVER (ORDER BY (CASE WHEN n_regionkey = 2 THEN NULL ELSE n_regionkey END) DESC) AS r FROM nation ORDER BY n_name",
        # DISTINCT ON tie-break over a nullable ordering column
        "SELECT DISTINCT ON (n_regionkey) n_regionkey, n_name FROM nation ORDER BY n_regionkey, (CASE WHEN n_nationkey % 3 = 0 THEN NULL ELSE n_nationkey END), n_name",
    ]:
        got = [tuple(r) for r in
               compile_plan(parse_relalg(parse_query(sql)), spark, cat).collect()]
        want = [tuple(r) for r in con.execute(sql).fetchall()]
        assert sorted(map(repr, got)) == sorted(map(repr, want)), sql


def test_ordered_agg_null_keys_sort_last(spark, sf_small):
    """Round-10: NULL in-call ORDER BY keys sort LAST in either
    direction (DuckDB's in-call default) — the struct sort carries a
    null-marker field per key. Keys include a unique tiebreaker: order
    within a tie group (equal/NULL keys) is nondeterministic on any
    engine."""
    cat = load_tables(spark, sf_small, ["nation"])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM read_parquet('{sf_small}/nation.parquet')"
    )
    for sql in [
        "SELECT n_regionkey, string_agg(n_name, ',' ORDER BY (CASE WHEN n_nationkey % 3 = 0 THEN NULL ELSE n_nationkey END), n_nationkey) AS s FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
        "SELECT n_regionkey, string_agg(n_name, ',' ORDER BY (CASE WHEN n_nationkey % 3 = 0 THEN NULL ELSE n_nationkey END) DESC, n_nationkey DESC) AS s FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
    ]:
        got = sorted(map(repr, (tuple(r) for r in
                     compile_plan(parse_relalg(parse_query(sql)), spark, cat).collect())))
        want = sorted(map(repr, (tuple(r) for r in con.execute(sql).fetchall())))
        assert got == want, sql


WAVE6_CASES = {
    "sha256_lowering": "SELECT n_name, sha256(n_name) AS h, md5(n_name) AS m FROM nation ORDER BY n_name",
    "regexp_replace_g_backrefs": "SELECT n_name, regexp_replace(n_name, '([A-Z])_', '\\1#', 'g') AS r FROM nation ORDER BY n_name",
    "regexp_replace_i_flag": "SELECT n_name, regexp_replace(n_name, 'nation', 'X', 'gi') AS r FROM nation ORDER BY n_name",
    "ansi_backslash_literals": "SELECT n_name FROM nation WHERE n_name LIKE '%\\_1%' ESCAPE '\\' ORDER BY n_name",
    "ansi_backslash_in_regex": "SELECT n_name, length(regexp_replace(n_name, '\\d+', '', 'g')) AS alpha_len FROM nation ORDER BY n_name",
}


@pytest.mark.parametrize("name", sorted(WAVE6_CASES))
def test_probe_wave6_function_parity(name, spark, sf_small):
    """Round-10 wave-6 closures: sha256 → sha2(x,256), regexp_replace
    'g'/'i' flags + \\1→$1 backreference lowering (flagless rejects —
    first-match-only is inexpressible in Spark), and ANSI string-literal
    semantics at the compile boundary (backslash is an ordinary
    character; Spark's Java-style literal escapes silently corrupted
    patterns like '\\s+' and broke on a trailing '\\')."""
    sql = WAVE6_CASES[name]
    cat = load_tables(spark, sf_small, ["nation"])
    got_df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
    got = sorted(map(repr, (tuple(r) for r in got_df.collect())))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM read_parquet('{sf_small}/nation.parquet')"
    )
    want = sorted(map(repr, (tuple(r) for r in con.execute(sql).fetchall())))
    assert got == want and len(got) > 0


def test_regexp_replace_flagless_rejects():
    from postbound_spark.plans.parser import UnsupportedSqlError

    with pytest.raises(UnsupportedSqlError, match="FIRST match"):
        parse_query("SELECT regexp_replace(n_name, 'N', 'X') AS r FROM nation")


WAVE7_CASES = {
    "star_exclude": "SELECT * EXCLUDE (n_name) FROM nation ORDER BY n_nationkey",
    "star_exclude_multi": "SELECT * EXCLUDE (n_name, n_regionkey) FROM nation WHERE n_regionkey = 2 ORDER BY n_nationkey",
    "except_set_op_still_parses": "SELECT n_regionkey FROM nation EXCEPT (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%') ORDER BY n_regionkey",
    "having_agg_alias": "SELECT n_regionkey, count(*) AS c FROM nation GROUP BY n_regionkey HAVING c > 4 ORDER BY n_regionkey",
    "having_agg_alias_expr": "SELECT n_regionkey, count(*) AS c, CAST(sum(n_nationkey) AS BIGINT) AS s FROM nation GROUP BY n_regionkey HAVING c > 4 AND s > 20 ORDER BY n_regionkey",
    "full_outer_using_coalesced": "SELECT n_regionkey, count(*) AS c FROM (SELECT n_regionkey FROM nation WHERE n_regionkey < 3) a FULL OUTER JOIN (SELECT r_regionkey AS n_regionkey FROM region WHERE r_regionkey > 1) b USING (n_regionkey) GROUP BY n_regionkey ORDER BY n_regionkey",
    "union_type_coercion": "SELECT n_regionkey AS v FROM nation WHERE n_nationkey < 3 UNION ALL SELECT 2.5 ORDER BY v",
}


@pytest.mark.parametrize("name", sorted(WAVE7_CASES))
def test_probe_wave7_closures(name, spark, sf_small):
    """Round-10 wave-7 closures: `* EXCLUDE (cols)` (DuckDB spelling →
    Spark's `* EXCEPT`, set-operator EXCEPT disambiguated), HAVING over
    aggregate select aliases (expanded into their expressions), plus
    join-output/coercion shapes pinned as passing."""
    sql = WAVE7_CASES[name]
    tables = ["nation", "region"]
    cat = load_tables(spark, sf_small, tables)
    got_df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
    got = sorted(map(repr, (tuple(r) for r in got_df.collect())))
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
        )
    want = sorted(map(repr, (tuple(r) for r in con.execute(sql).fetchall())))
    assert got == want and len(got) > 0


WITHIN_GROUP_CASES = {
    "cont_global": "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY n_nationkey) AS med FROM nation",
    "cont_disc_grouped": "SELECT n_regionkey, percentile_cont(0.25) WITHIN GROUP (ORDER BY n_nationkey) AS q1, CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_nationkey) AS BIGINT) AS med_d FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
    "cont_desc": "SELECT n_regionkey, percentile_cont(0.5) WITHIN GROUP (ORDER BY n_nationkey DESC) AS med FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
    "mode_within_group": "SELECT mode() WITHIN GROUP (ORDER BY n_regionkey) AS m FROM nation",
    "cont_with_filter": "SELECT round(percentile_cont(0.5) WITHIN GROUP (ORDER BY n_nationkey) FILTER (WHERE n_regionkey > 0), 2) AS med FROM nation",
}


@pytest.mark.parametrize("name", sorted(WITHIN_GROUP_CASES))
def test_within_group_ordered_set_aggregates(name, spark, sf_small):
    """Round-10: ANSI ordered-set aggregates — `fn(args) WITHIN GROUP
    (ORDER BY k)` — carried verbatim (both engines execute the spelling
    natively); the aggregate-call scanner captures the clause so the
    Grouping hoist sees one span, and FILTER composes after it."""
    sql = WITHIN_GROUP_CASES[name]
    cat = load_tables(spark, sf_small, ["nation"])
    got_df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
    got = sorted(map(repr, (tuple(r) for r in got_df.collect())))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM read_parquet('{sf_small}/nation.parquet')"
    )
    want = sorted(map(repr, (tuple(r) for r in con.execute(sql).fetchall())))
    assert got == want and len(got) > 0


def test_datediff_day_spelling_parity(spark, sf_small):
    """Round-10: DuckDB/Postgres ``datediff('day', start, end)`` lowers
    to Spark's 2-arg ``datediff(end, start)``; month/year parts reject
    (boundary counts vs fractional months_between). Also pins last_day
    and date_add as already-parity."""
    cat = load_tables(spark, sf_small, ["orders"])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_small}/orders.parquet')"
    )
    sql = (
        "SELECT o_orderkey, datediff('day', DATE '1995-01-01', o_orderdate) AS dd, "
        "last_day(CAST(o_orderdate AS DATE)) AS ld, "
        "date_add(CAST(o_orderdate AS DATE), 7) AS da "
        "FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey"
    )
    got = sorted(map(repr, (tuple(r) for r in
                 compile_plan(parse_relalg(parse_query(sql)), spark, cat).collect())))
    want = sorted(map(repr, (tuple(r) for r in con.execute(sql).fetchall())))
    assert got == want and len(got) > 0

    from postbound_spark.plans.parser import UnsupportedSqlError

    with pytest.raises(UnsupportedSqlError, match="boundaries"):
        parse_query("SELECT datediff('month', DATE '1995-01-01', o_orderdate) FROM orders")


def test_multi_arg_grouping_bitmask(spark, sf_small):
    """Round-10: ``grouping(a, b)`` with multiple arguments returns the
    ANSI bitmask (leftmost argument = most significant bit) under the
    grouping-sets desugar — a per-set constant, usable in SELECT and
    HAVING alike."""
    cat = load_tables(spark, sf_small, ["nation"])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM read_parquet('{sf_small}/nation.parquet')"
    )
    for sql in [
        "SELECT n_regionkey, n_name, grouping(n_regionkey, n_name) AS gid, count(*) AS c FROM nation GROUP BY ROLLUP (n_regionkey, n_name) ORDER BY gid, n_regionkey NULLS FIRST, n_name NULLS FIRST",
        "SELECT n_regionkey, n_name, count(*) AS c FROM nation GROUP BY CUBE (n_regionkey, n_name) HAVING grouping(n_regionkey, n_name) > 0 ORDER BY n_regionkey NULLS FIRST, n_name NULLS FIRST",
    ]:
        got = sorted(map(repr, (tuple(r) for r in
                     compile_plan(parse_relalg(parse_query(sql)), spark, cat).collect())))
        want = sorted(map(repr, (tuple(r) for r in con.execute(sql).fetchall())))
        assert got == want and len(got) > 0, sql


IGNORE_NULLS_CASES = {
    "first_value_ignore": "SELECT n_name, first_value(CASE WHEN n_regionkey = 2 THEN NULL ELSE n_name END IGNORE NULLS) OVER (ORDER BY n_nationkey) AS f FROM nation ORDER BY n_name",
    "last_value_ignore_frame": "SELECT n_name, last_value(CASE WHEN n_regionkey = 0 THEN NULL ELSE n_name END IGNORE NULLS) OVER (ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS l FROM nation ORDER BY n_name",
    "lag_ignore": "SELECT n_name, lag(CASE WHEN n_regionkey = 1 THEN NULL ELSE n_name END, 1 IGNORE NULLS) OVER (ORDER BY n_nationkey) AS lg FROM nation ORDER BY n_name",
    "respect_nulls_default": "SELECT n_name, first_value(n_name RESPECT NULLS) OVER (ORDER BY n_nationkey) AS f FROM nation ORDER BY n_name",
    "window_family": "SELECT n_name, ntile(4) OVER (ORDER BY n_nationkey) AS nt, round(percent_rank() OVER (ORDER BY n_nationkey), 4) AS pr, round(cume_dist() OVER (ORDER BY n_nationkey), 4) AS cd, nth_value(n_name, 2) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS nv FROM nation ORDER BY n_name",
}


@pytest.mark.parametrize("name", sorted(IGNORE_NULLS_CASES))
def test_ignore_nulls_and_window_family(name, spark, sf_small):
    """Round-10: IGNORE/RESPECT NULLS — DuckDB/Postgres put the modifier
    INSIDE the call parens, Spark after them; both spellings parse and
    re-emit in Spark's position (RESPECT NULLS is the default and
    drops). The navigation/distribution window family pins as parity."""
    sql = IGNORE_NULLS_CASES[name]
    cat = load_tables(spark, sf_small, ["nation"])
    got_df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
    got = sorted(map(repr, (tuple(r) for r in got_df.collect())))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM read_parquet('{sf_small}/nation.parquet')"
    )
    want = sorted(map(repr, (tuple(r) for r in con.execute(sql).fetchall())))
    assert got == want and len(got) > 0


def test_between_symmetric_desugars_to_sorted_bounds():
    """Round-11: ANSI BETWEEN SYMMETRIC sorts its own bounds — desugared
    to least/greatest at parse time (the bare spelling used to parse
    SYMMETRIC as a column and return silently wrong rows). DuckDB parses
    but cannot execute the spelling (T_List not-implemented), so this is
    gated structurally: the desugared form is ordinary BETWEEN, which
    the whole oracle suite covers."""
    q = parse_query(
        "SELECT n_nationkey FROM nation "
        "WHERE n_nationkey BETWEEN SYMMETRIC 7 AND 3"
    )
    txt = q.where.to_sql()
    assert "least(7, 3)" in txt and "greatest(7, 3)" in txt
    # ASYMMETRIC is the default and simply strips
    q2 = parse_query(
        "SELECT n_nationkey FROM nation "
        "WHERE n_nationkey BETWEEN ASYMMETRIC 3 AND 7"
    )
    assert "ASYMMETRIC" not in q2.where.to_sql().upper()
    assert "BETWEEN 3 AND 7" in q2.where.to_sql()


class TestExistsHaving:
    """Round-11: correlated EXISTS whose subquery carries GROUP BY +
    HAVING — decorrelated by the grouped rewrite (correlation columns
    join the GROUP BY, HAVING filters per group, survivors semi/anti
    join back; algebra.py ``_apply_exists_having``)."""

    def _check(self, spark, sf_small, sql, tables=("customer", "orders")):
        cat = load_tables(spark, sf_small, list(tables))
        schema = {t: cat[t].columns for t in tables}
        got = sorted(
            map(repr, (tuple(r) for r in compile_plan(
                parse_relalg(parse_query(sql, schema=schema)), spark, cat
            ).collect()))
        )
        con = duckdb.connect()
        for t in tables:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_small}/{t}.parquet')"
            )
        want = sorted(map(repr, (tuple(r) for r in con.execute(sql).fetchall())))
        assert got == want
        return got

    def test_exists_having_matches_duckdb(self, spark, sf_small):
        got = self._check(
            spark, sf_small,
            "SELECT c_custkey FROM customer c WHERE EXISTS ("
            "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            "GROUP BY o.o_orderpriority HAVING count(*) >= 2) "
            "ORDER BY c_custkey",
        )
        assert len(got) > 0

    def test_not_exists_having_matches_duckdb(self, spark, sf_small):
        self._check(
            spark, sf_small,
            "SELECT c_custkey FROM customer c WHERE NOT EXISTS ("
            "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            "GROUP BY o.o_orderpriority HAVING count(*) >= 2) "
            "ORDER BY c_custkey",
        )

    def test_compiles_to_grouped_semi_join(self, spark, sf_small):
        from postbound_spark.plans import relalg as ra

        schema = {"customer": ["c_custkey"],
                  "orders": ["o_orderkey", "o_custkey", "o_orderpriority"]}
        tree = parse_relalg(parse_query(
            "SELECT c_custkey FROM customer c WHERE EXISTS ("
            "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            "GROUP BY o.o_orderpriority HAVING count(*) >= 2)",
            schema=schema,
        ))
        kinds = {type(n).__name__ for n in tree.walk()}
        assert "SemiJoin" in kinds and "Grouping" in kinds

    def test_rejections(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        schema = {"customer": ["c_custkey", "c_nationkey"],
                  "orders": ["o_orderkey", "o_custkey", "o_orderpriority"]}
        for sql, frag in [
            (
                # aggregate over the EMPTY group is representable only
                # as a scalar comparison, not a join
                "SELECT c_custkey FROM customer c WHERE EXISTS ("
                "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
                "HAVING count(*) = 0)",
                "EMPTY group",
            ),
            (
                "SELECT c_custkey FROM customer c WHERE EXISTS ("
                "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
                "GROUP BY o.o_orderpriority "
                "HAVING count(*) > c.c_nationkey)",
                "correlated references inside the HAVING",
            ),
            (
                "SELECT c_custkey FROM customer c WHERE EXISTS ("
                "SELECT 1 FROM orders o WHERE o.o_custkey < c.c_custkey "
                "GROUP BY o.o_orderpriority HAVING count(*) > 3)",
                "equality correlation",
            ),
        ]:
            with pytest.raises(UnsupportedSqlError, match=frag):
                parse_relalg(parse_query(sql, schema=schema))


class TestLateralGroupBy:
    """Round-11: LATERAL subqueries WITH GROUP BY — one row per inner
    group per outer row, decorrelated by the same grouped rewrite as
    EXISTS-with-HAVING (correlation keys join the GROUP BY, keyed INNER
    join back; algebra.py ``_apply_lateral`` grouped branch)."""

    def _check(self, spark, sf_small, sql, tables=("customer", "orders")):
        cat = load_tables(spark, sf_small, list(tables))
        schema = {t: cat[t].columns for t in tables}
        got = sorted(
            map(repr, (tuple(r) for r in compile_plan(
                parse_relalg(parse_query(sql, schema=schema)), spark, cat
            ).collect()))
        )
        con = duckdb.connect()
        for t in tables:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_small}/{t}.parquet')"
            )
        want = sorted(map(repr, (tuple(r) for r in con.execute(sql).fetchall())))
        assert got == want and len(got) > 0

    def test_grouped_lateral_matches_duckdb(self, spark, sf_small):
        self._check(
            spark, sf_small,
            "SELECT c.c_custkey, l.pri, l.n FROM customer c, LATERAL ("
            "SELECT o.o_orderpriority AS pri, count(*) AS n FROM orders o "
            "WHERE o.o_custkey = c.c_custkey GROUP BY o.o_orderpriority) l "
            "ORDER BY c.c_custkey, l.pri",
        )

    def test_grouped_lateral_with_having(self, spark, sf_small):
        self._check(
            spark, sf_small,
            "SELECT c.c_custkey, l.st, l.total FROM customer c, LATERAL ("
            "SELECT o.o_orderstatus AS st, CAST(sum(o.o_orderkey) AS "
            "BIGINT) AS total FROM orders o WHERE o.o_custkey = "
            "c.c_custkey GROUP BY o.o_orderstatus HAVING count(*) >= 2) l "
            "ORDER BY c.c_custkey, l.st",
        )

    def test_rejections(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        schema = {"customer": ["c_custkey", "c_nationkey"],
                  "orders": ["o_orderkey", "o_custkey", "o_orderpriority"]}
        for sql, frag in [
            (
                "SELECT c.c_custkey, l.n FROM customer c, LATERAL ("
                "SELECT o.o_orderpriority AS p, count(*) AS n FROM orders o "
                "WHERE o.o_custkey = c.c_custkey GROUP BY o.o_orderpriority "
                "HAVING count(*) > c.c_nationkey) l",
                "correlated references inside the HAVING of a LATERAL",
            ),
            (
                "SELECT c.c_custkey, l.n FROM customer c, LATERAL ("
                "SELECT DISTINCT o.o_orderpriority AS p, count(*) AS n "
                "FROM orders o WHERE o.o_custkey = c.c_custkey "
                "GROUP BY o.o_orderpriority) l",
                "LIMIT/DISTINCT",
            ),
        ]:
            with pytest.raises(UnsupportedSqlError, match=frag):
                parse_relalg(parse_query(sql, schema=schema))


class TestJoinLateral:
    """Round-11: [LEFT] JOIN LATERAL (...) ON TRUE / CROSS JOIN LATERAL
    — the standard Postgres idiom, routed onto the same decorrelated
    lateral machinery as the comma form (LEFT keeps match-less outer
    rows null-extended)."""

    def _check(self, spark, sf_small, sql, tables=("customer", "orders")):
        cat = load_tables(spark, sf_small, list(tables))
        schema = {t: cat[t].columns for t in tables}
        got = sorted(
            map(repr, (tuple(r) for r in compile_plan(
                parse_relalg(parse_query(sql, schema=schema)), spark, cat
            ).collect()))
        )
        con = duckdb.connect()
        for t in tables:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_small}/{t}.parquet')"
            )
        want = sorted(map(repr, (tuple(r) for r in con.execute(sql).fetchall())))
        assert got == want and len(got) > 0

    def test_left_join_lateral_topn(self, spark, sf_small):
        self._check(
            spark, sf_small,
            "SELECT c.c_custkey, l.v FROM customer c LEFT JOIN LATERAL ("
            "SELECT o.o_orderkey AS v FROM orders o WHERE o.o_custkey = "
            "c.c_custkey ORDER BY o.o_orderkey LIMIT 2) l ON true "
            "ORDER BY c.c_custkey, l.v",
        )

    def test_left_join_lateral_grouped(self, spark, sf_small):
        self._check(
            spark, sf_small,
            "SELECT c.c_custkey, l.pri, l.n FROM customer c "
            "LEFT JOIN LATERAL (SELECT o.o_orderpriority AS pri, "
            "count(*) AS n FROM orders o WHERE o.o_custkey = c.c_custkey "
            "GROUP BY o.o_orderpriority) l ON true "
            "ORDER BY c.c_custkey, l.pri",
        )

    def test_rejections(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        schema = {"customer": ["c_custkey"],
                  "orders": ["o_orderkey", "o_custkey"]}
        for sql, frag in [
            (
                "SELECT c.c_custkey FROM customer c RIGHT JOIN LATERAL ("
                "SELECT o.o_orderkey AS v FROM orders o WHERE "
                "o.o_custkey = c.c_custkey) l ON true",
                "LATERAL is not modeled",
            ),
            (
                "SELECT c.c_custkey FROM customer c LEFT JOIN LATERAL ("
                "SELECT o.o_orderkey AS v FROM orders o WHERE "
                "o.o_custkey = c.c_custkey) l ON l.v > 5",
                "non-TRUE ON condition",
            ),
        ]:
            with pytest.raises(UnsupportedSqlError, match=frag):
                parse_relalg(parse_query(sql, schema=schema))


class TestAggregateParity:
    """Round-11 wave 14: aggregate-function parity lowerings and
    predicate-valued function arguments."""

    def test_arg_max_lowers_to_max_by(self):
        q = parse_query(
            "SELECT arg_max(n_name, n_nationkey) AS a, "
            "arg_min(n_name, n_nationkey) AS b FROM nation"
        )
        s = q.to_sql()
        assert "max_by(n_name, n_nationkey)" in s
        assert "min_by(n_name, n_nationkey)" in s

    def test_quantiles_lower(self):
        q = parse_query(
            "SELECT quantile_cont(n_nationkey, 0.5) AS a, "
            "quantile_disc(n_nationkey, 0.5) AS b FROM nation"
        )
        s = q.to_sql()
        assert "percentile(n_nationkey, 0.5)" in s
        assert "percentile_disc(0.5) WITHIN GROUP (ORDER BY n_nationkey)" in s

    def test_predicate_argument_parses(self):
        q = parse_query(
            "SELECT bool_and(n_nationkey > 2 AND n_regionkey = 1) AS b "
            "FROM nation"
        )
        assert "(n_nationkey > 2) AND (n_regionkey = 1)" in q.to_sql()

    def test_string_agg_one_arg_defaults_comma(self):
        q = parse_query("SELECT string_agg(n_name) AS s FROM nation")
        assert "string_agg(n_name, ',')" in q.to_sql()
        q2 = parse_query(
            "SELECT string_agg(n_name ORDER BY n_name) AS s FROM nation"
        )
        assert "','" in q2.to_sql() or ",'" in q2.to_sql()

    def test_product_rejects_loud(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        with pytest.raises(UnsupportedSqlError, match="product"):
            parse_query("SELECT product(n_nationkey) AS p FROM nation")


class TestDatetimeParity:
    """Round-11 wave 15: strftime translation and extract/date_part
    field parity."""

    def test_strftime_translates_codes(self):
        q = parse_query(
            "SELECT strftime(o_orderdate, '%Y-%m-%d') AS a, "
            "strftime(o_orderdate, '%d %B %Y') AS b FROM orders"
        )
        s = q.to_sql()
        assert "date_format(o_orderdate, 'yyyy-MM-dd')" in s
        assert "date_format(o_orderdate, 'dd MMMM yyyy')" in s

    def test_strftime_literal_letters_quoted(self):
        q = parse_query(
            "SELECT strftime(o_orderdate, 'Week %Y') AS a FROM orders"
        )
        # literal 'Week ' must be quoted so Java cannot reinterpret it
        assert "''Week ''yyyy" in q.to_sql()

    def test_unmapped_code_rejects(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        with pytest.raises(UnsupportedSqlError, match="%g"):
            parse_query(
                "SELECT strftime(o_orderdate, '%g') AS a FROM orders"
            )

    def test_date_part_routes_through_extract_parity(self):
        q = parse_query(
            "SELECT date_part('dow', o_orderdate) AS d, "
            "datepart('epoch', o_orderdate) AS e FROM orders"
        )
        s = q.to_sql()
        assert "(dayofweek(o_orderdate) - 1)" in s
        assert "unix_micros" in s

    def test_isoyear_lowering(self):
        q = parse_query(
            "SELECT extract(isoyear FROM o_orderdate) AS iy FROM orders"
        )
        assert "year(date_add(CAST(o_orderdate AS DATE)" in q.to_sql()


class TestJsonParity:
    """Round-11 wave 16: JSON extraction lowerings."""

    def test_extract_string_lowers(self):
        q = parse_query(
            "SELECT json_extract_string(n_name, '$.a.b') AS x, "
            "json_extract_string(n_name, 'bare') AS y FROM nation"
        )
        s = q.to_sql()
        assert "get_json_object(n_name, '$.a.b')" in s
        assert "get_json_object(n_name, '$.bare')" in s

    def test_arrow_text_lowers(self):
        q = parse_query(
            "SELECT n_name ->> 'k' AS a, n_name ->> 2 AS b FROM nation"
        )
        s = q.to_sql()
        assert "get_json_object(n_name, '$.k')" in s
        assert "get_json_object(n_name, '$[2]')" in s

    def test_json_quoted_forms_reject(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        with pytest.raises(UnsupportedSqlError, match="json_extract_string"):
            parse_query("SELECT json_extract(n_name, '$.a') AS x FROM nation")
        with pytest.raises(UnsupportedSqlError, match="text extraction"):
            parse_query("SELECT n_name -> 'a' AS x FROM nation")


class TestNestedScopeGuard:
    """Round-11: references from MORE than one scope level out (the
    grandparent of a doubly-nested subquery) have no decorrelated form —
    they must reject cleanly, never reach Spark analysis. Immediate-
    parent correlation at each level stays supported."""

    SCHEMA = {"nation": ["n_nationkey", "n_name", "n_regionkey"],
              "customer": ["c_custkey", "c_nationkey", "c_acctbal"],
              "orders": ["o_orderkey", "o_custkey", "o_totalprice"]}

    def test_grandparent_reference_rejects(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        sql = (
            "SELECT n.n_name FROM nation n WHERE EXISTS ("
            "SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey "
            "AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = "
            "c.c_custkey AND o.o_orderkey % 25 = n.n_nationkey))"
        )
        with pytest.raises(UnsupportedSqlError, match="more than one level"):
            parse_relalg(parse_query(sql, schema=self.SCHEMA))

    def test_chained_one_level_correlation_compiles(self, spark, sf_small):
        # each level correlates only to its IMMEDIATE parent — supported
        sql = (
            "SELECT n.n_name FROM nation n WHERE EXISTS ("
            "SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey "
            "AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = "
            "c.c_custkey AND o.o_totalprice > 300000)) ORDER BY n.n_name"
        )
        cat = load_tables(spark, sf_small, ["nation", "customer", "orders"])
        got = compile_plan(
            parse_relalg(parse_query(sql, schema=self.SCHEMA)), spark, cat
        ).collect()
        con = duckdb.connect()
        for t in ("nation", "customer", "orders"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_small}/{t}.parquet')"
            )
        want = con.execute(sql).fetchall()
        assert sorted(map(repr, map(tuple, got))) == sorted(
            map(repr, map(tuple, want))
        )


class TestLexicalAndRegexEdges:
    """Round-11 wave 20: quoted-identifier guard, numeric underscore
    separators, regexp_matches lowering."""

    def test_quoted_identifier_with_space_rejects(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        # previously rendered `AS Mixed Case` — broken bare text
        with pytest.raises(UnsupportedSqlError, match="quoted identifier"):
            parse_query('SELECT n_nationkey AS "Mixed Case" FROM nation')

    def test_plain_quoted_identifier_works(self):
        q = parse_query('SELECT n_nationkey AS "Big" FROM nation')
        assert "AS Big" in q.to_sql()

    def test_underscore_numerics_strip(self):
        q = parse_query("SELECT 1_000_000 AS n FROM nation WHERE n_nationkey < 1_2")
        s = q.to_sql()
        assert "1000000" in s and "12" in s and "_0" not in s

    def test_regexp_matches_lowers_to_rlike(self):
        q = parse_query(
            "SELECT count(*) AS c FROM nation "
            "WHERE regexp_matches(n_name, 'x', 'i')"
        )
        assert "RLIKE '(?i)x'" in q.to_sql()
        # and the lowered text re-parses (the scalar-subquery path does
        # this on every lifted span)
        assert parse_query(q.to_sql()).to_sql() == q.to_sql()

    def test_regexp_full_match_anchors(self):
        q = parse_query(
            "SELECT count(*) AS c FROM nation "
            "WHERE regexp_full_match(n_name, 'ab+')"
        )
        assert "RLIKE '^(?:ab+)$'" in q.to_sql()


class TestWindowsOverAggregatesAndOrderBy:
    """Round-11 wave 21: windows whose arguments are aggregate calls,
    window calls in ORDER BY keys (desugared to helper select items —
    Spark's Sort rejects window expressions), and the universal `/`
    DOUBLE promotion."""

    def test_orderby_window_desugars(self):
        q = parse_query(
            "SELECT n_name FROM nation ORDER BY row_number() OVER "
            "(ORDER BY n_regionkey) DESC LIMIT 3"
        )
        s = q.to_sql()
        # helper column computed in the inner CTE, ordered one level up
        assert "__ordwin" in s
        assert "ORDER BY __ordwin" in s
        # fixpoint after desugar
        assert parse_query(s).to_sql() == s

    def test_orderby_window_star_drops_helper(self):
        q = parse_query(
            "SELECT * FROM nation ORDER BY rank() OVER "
            "(ORDER BY n_name) LIMIT 2"
        )
        assert "* EXCEPT (__ordwin" in q.to_sql()

    def test_division_promotes_to_double(self):
        q = parse_query(
            "SELECT 100.0 * count(*) / sum(n_nationkey) AS pct "
            "FROM nation"
        )
        s = q.to_sql()
        assert "CAST(100.0 * count(*) AS double) /" in s
        # idempotent under re-parse
        assert parse_query(s).to_sql() == s

    def test_interval_division_untouched(self):
        q = parse_query(
            "SELECT INTERVAL 1 HOUR / 2 AS h FROM nation"
        )
        assert "CAST(INTERVAL" not in q.to_sql()


class TestPivotUnpivot:
    """Round-11 wave 24: the FROM-postfix PIVOT/UNPIVOT desugars."""

    SCHEMA = {"nation": ["n_nationkey", "n_name", "n_regionkey"]}

    def test_pivot_desugars_to_grouped_case(self):
        q = parse_query(
            "SELECT * FROM nation PIVOT (count(n_name) FOR n_regionkey "
            "IN (0 AS r0, 1 AS r1)) ORDER BY n_nationkey",
            schema=self.SCHEMA,
        )
        s = q.to_sql()
        assert "count(CASE WHEN n_regionkey = 0 THEN n_name END) AS r0" in s
        # n_name is consumed by the aggregate argument, n_regionkey by
        # the FOR key — the implicit group is everything else
        assert "GROUP BY n_nationkey" in s

    def test_pivot_needs_schema_for_base_table(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        with pytest.raises(UnsupportedSqlError, match="schema binding"):
            parse_query(
                "SELECT * FROM nation PIVOT (count(n_name) FOR "
                "n_regionkey IN (0 AS r0))"
            )

    def test_pivot_derived_table_needs_no_schema(self):
        q = parse_query(
            "SELECT * FROM (SELECT n_regionkey, n_nationkey FROM nation) "
            "PIVOT (sum(n_nationkey) FOR n_regionkey IN (2 AS r2))"
        )
        assert "sum(CASE WHEN n_regionkey = 2" in q.to_sql()

    def test_pivot_rejects_multi_aggregate(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        with pytest.raises(UnsupportedSqlError, match="single unaliased"):
            parse_query(
                "SELECT * FROM (SELECT n_regionkey, n_nationkey FROM "
                "nation) PIVOT (sum(n_nationkey) AS s, count(*) AS c "
                "FOR n_regionkey IN (0 AS r0))"
            )

    def test_pivot_rejects_unnamed_numeric_item(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        with pytest.raises(UnsupportedSqlError, match="AS alias"):
            parse_query(
                "SELECT * FROM (SELECT n_regionkey, n_nationkey FROM "
                "nation) PIVOT (sum(n_nationkey) FOR n_regionkey IN (0))"
            )

    def test_unpivot_excludes_nulls_by_default(self):
        q = parse_query(
            "SELECT * FROM (SELECT n_nationkey AS id, n_regionkey AS a, "
            "n_nationkey AS b FROM nation) UNPIVOT (v FOR k IN (a, b))"
        )
        s = q.to_sql()
        assert "IS NOT NULL" in s and "explode(array[1, 2])" in s

    def test_unpivot_include_nulls_skips_filter(self):
        q = parse_query(
            "SELECT * FROM (SELECT n_nationkey AS id, n_regionkey AS a, "
            "n_nationkey AS b FROM nation) UNPIVOT INCLUDE NULLS "
            "(v FOR k IN (a, b))"
        )
        assert "IS NOT NULL" not in q.to_sql()

    def test_pivot_alias_still_parses_after_clause(self):
        q = parse_query(
            "SELECT p.r0 FROM (SELECT n_regionkey, n_nationkey FROM "
            "nation) PIVOT (count(n_nationkey) FOR n_regionkey IN "
            "(0 AS r0)) AS p",
            schema=self.SCHEMA,
        )
        assert "AS r0" in q.to_sql()

    def test_table_aliased_pivot_keyword_stays_alias(self):
        # a relation literally aliased `pivot` (no clause parens) must
        # keep working — the postfix trigger requires the parenthesis
        q = parse_query("SELECT pivot.n_name FROM nation pivot")
        assert "nation pivot" in q.to_sql()


class TestAsofJoin:
    """Round-11 wave 27: ASOF [LEFT] JOIN parse + spec extraction."""

    def test_asof_spec_backward_strict(self):
        q = parse_query(
            "SELECT o.o_orderkey FROM orders o ASOF JOIN orders p ON "
            "p.o_custkey = o.o_custkey AND o.o_orderdate > p.o_orderdate"
        )
        spec = q.joins[0].asof
        assert spec is not None
        assert spec.eqs == (("o.o_custkey", "p.o_custkey"),)
        assert spec.probe == "o.o_orderdate"
        assert spec.right_ord == "p.o_orderdate"
        assert spec.strict and not spec.forward

    def test_asof_forward_inclusive_flipped(self):
        # right side written on the LEFT of the comparison: p.ts >= o.ts
        # normalizes to o.ts <= p.ts (forward, inclusive)
        q = parse_query(
            "SELECT o.o_orderkey FROM orders o ASOF JOIN orders p ON "
            "p.o_custkey = o.o_custkey AND p.o_orderdate >= o.o_orderdate"
        )
        spec = q.joins[0].asof
        assert spec.forward and not spec.strict

    def test_asof_renders_and_reparses(self):
        q = parse_query(
            "SELECT o.o_orderkey FROM orders o ASOF LEFT JOIN orders p "
            "ON p.o_custkey = o.o_custkey AND o.o_orderdate > "
            "p.o_orderdate"
        )
        s = q.to_sql()
        assert "ASOF LEFT JOIN" in s
        assert parse_query(s).joins[0].asof == q.joins[0].asof

    def test_asof_rejects_no_inequality(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        with pytest.raises(UnsupportedSqlError, match="ONE inequality"):
            parse_query(
                "SELECT o.o_orderkey FROM orders o ASOF JOIN orders p "
                "ON p.o_custkey = o.o_custkey"
            )

    def test_asof_rejects_two_inequalities(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        with pytest.raises(UnsupportedSqlError, match="ONE inequality"):
            parse_query(
                "SELECT o.o_orderkey FROM orders o ASOF JOIN orders p "
                "ON o.o_orderdate > p.o_orderdate AND o.o_orderkey > "
                "p.o_orderkey"
            )

    def test_asof_rejects_or_condition(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        with pytest.raises(UnsupportedSqlError):
            parse_query(
                "SELECT o.o_orderkey FROM orders o ASOF JOIN orders p "
                "ON p.o_custkey = o.o_custkey OR o.o_orderdate > "
                "p.o_orderdate"
            )

    def test_table_aliased_asof_stays_alias(self):
        q = parse_query("SELECT asof.n_name FROM nation asof")
        assert "nation asof" in q.to_sql()


class TestDialectConveniences:
    """Round-11 wave 28: FROM-first, * REPLACE, COLUMNS, USING SAMPLE."""

    SCHEMA = {"nation": ["n_nationkey", "n_name", "n_regionkey"]}

    def test_from_first_reorders(self):
        q = parse_query(
            "FROM nation SELECT n_nationkey WHERE n_nationkey < 2"
        )
        assert q.to_sql().startswith("SELECT n_nationkey")
        assert "WHERE n_nationkey < 2" in q.to_sql()

    def test_from_first_bare_selects_star(self):
        q = parse_query("FROM nation")
        assert q.to_sql() == "SELECT *\nFROM nation"

    def test_star_replace_keeps_position(self):
        q = parse_query(
            "SELECT * REPLACE (n_regionkey + 1 AS n_regionkey) "
            "FROM nation",
            schema=self.SCHEMA,
        )
        s = q.to_sql()
        assert (
            "SELECT n_nationkey, n_name, n_regionkey + 1 AS n_regionkey"
            in s
        )

    def test_star_replace_unknown_col_rejects(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        with pytest.raises(UnsupportedSqlError, match="source lacks"):
            parse_query(
                "SELECT * REPLACE (1 AS nope) FROM nation",
                schema=self.SCHEMA,
            )

    def test_columns_regex_expands_partial(self):
        q = parse_query(
            "SELECT columns('key') FROM nation", schema=self.SCHEMA
        )
        assert "SELECT n_nationkey, n_regionkey" in q.to_sql()

    def test_columns_no_match_rejects(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        with pytest.raises(UnsupportedSqlError, match="matches no column"):
            parse_query(
                "SELECT columns('zzz') FROM nation", schema=self.SCHEMA
            )

    def test_using_sample_rows(self):
        q = parse_query("SELECT * FROM nation USING SAMPLE 7 ROWS")
        assert q.from_tables[0].sample_rows == 7

    def test_using_sample_percent(self):
        q = parse_query("SELECT * FROM nation USING SAMPLE 10 PERCENT")
        assert q.from_tables[0].sample_percent == 10.0

    def test_limit_percent_rejects(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        with pytest.raises(UnsupportedSqlError, match="percent LIMIT"):
            parse_query("SELECT n_nationkey FROM nation LIMIT 10%")


class TestOrderedFirstLast:
    """Round-11 wave 31: first/last with in-call ORDER BY."""

    def test_first_lowers_to_min_by_struct(self):
        q = parse_query(
            "SELECT first(n_name ORDER BY n_nationkey) AS f FROM nation"
        )
        s = q.to_sql()
        assert "min_by(n_name, struct(" in s

    def test_last_desc_lowers_to_min_by(self):
        q = parse_query(
            "SELECT last(n_name ORDER BY n_nationkey DESC) AS l "
            "FROM nation"
        )
        assert "min_by(n_name, struct(" in q.to_sql()

    def test_mixed_direction_rejects(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        with pytest.raises(UnsupportedSqlError, match="mixed directions"):
            parse_query(
                "SELECT first(n_name ORDER BY n_nationkey ASC, "
                "n_regionkey DESC) AS f FROM nation"
            )

    def test_distinct_rejects(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        with pytest.raises(UnsupportedSqlError, match="DISTINCT"):
            parse_query(
                "SELECT first(DISTINCT n_name ORDER BY n_name) AS f "
                "FROM nation"
            )

    def test_sample_kurtosis_rejects_toward_pop(self):
        from postbound_spark.plans.parser import UnsupportedSqlError

        with pytest.raises(UnsupportedSqlError, match="kurtosis_pop"):
            parse_query("SELECT kurtosis(n_nationkey) AS k FROM nation")
