"""qal IR tests — mirrors the reference's unit-test matrix on the IR
(tests/test_qal.py: join-vs-filter detection :40/:56, BETWEEN/IN/unary
:140/:171/:198, compound trees :235, transformations)."""

from __future__ import annotations

import pytest

from postbound_spark.plans import qal as Q
from postbound_spark.plans import transform as X
from dataclasses import replace

from postbound_spark.plans.parser import parse_query


@pytest.fixture
def t():
    r = Q.TableReference("region", "r")
    n = Q.TableReference("nation", "n")
    return r, n


def _query(r, n, where):
    return Q.SqlQuery(
        select=(Q.BaseProjection(Q.col("n_name", n)),),
        from_tables=(r, n),
        where=where,
    )


def test_join_vs_filter_classification(t):
    r, n = t
    join = Q.eq(Q.col("r_regionkey", r), Q.col("n_regionkey", n))
    filt = Q.eq(Q.col("r_name", r), Q.lit("ASIA"))
    assert join.is_join() and not join.is_filter()
    assert filt.is_filter() and not filt.is_join()


def test_false_positive_join_is_filter(t):
    # same-table column comparison is a filter (ref test_qal.py:223)
    r, _ = t
    p = Q.eq(Q.col("r_regionkey", r), Q.col("r_name", r))
    assert p.is_filter()


def test_between_in_unary(t):
    r, _ = t
    between = Q.BetweenPredicate(Q.col("r_regionkey", r), Q.lit(1), Q.lit(3))
    assert between.is_filter()
    assert between.to_sql() == "r.r_regionkey BETWEEN 1 AND 3"
    inp = Q.InPredicate(Q.col("r_name", r), (Q.lit("ASIA"), Q.lit("EUROPE")))
    assert inp.to_sql() == "r.r_name IN ('ASIA', 'EUROPE')"
    null = Q.UnaryPredicate(Q.UnaryOperation.IS_NULL, Q.col("r_comment", r))
    assert null.to_sql() == "r.r_comment IS NULL"


def test_compound_and_flatten(t):
    r, n = t
    a = Q.eq(Q.col("r_name", r), Q.lit("ASIA"))
    b = Q.eq(Q.col("r_regionkey", r), Q.col("n_regionkey", n))
    c = Q.eq(Q.col("n_name", n), Q.lit("JAPAN"))
    nested = Q.CompoundPredicate(
        Q.CompoundOperator.AND,
        (Q.CompoundPredicate(Q.CompoundOperator.AND, (a, b)), c),
    )
    flat = X.flatten_and_predicate(nested)
    assert isinstance(flat, Q.CompoundPredicate)
    assert len(flat.children) == 3
    assert list(nested.iterpredicates()) == [a, b, c]


def test_predicate_index(t):
    r, n = t
    join = Q.eq(Q.col("r_regionkey", r), Q.col("n_regionkey", n))
    filt = Q.eq(Q.col("r_name", r), Q.lit("ASIA"))
    preds = Q.QueryPredicates(Q.and_(join, filt))
    assert preds.joins() == [join]
    assert preds.filters() == [filt]
    assert preds.joins_between("r", "n") == [join]
    assert preds.filters_for("r") == [filt]


def test_equivalence_classes():
    a = Q.TableReference("ta", "a")
    b = Q.TableReference("tb", "b")
    c = Q.TableReference("tc", "c")
    p1 = Q.eq(Q.col("x", a), Q.col("x", b))
    p2 = Q.eq(Q.col("x", b), Q.col("x", c))
    preds = Q.QueryPredicates(Q.and_(p1, p2))
    classes = preds.join_equivalence_classes()
    assert len(classes) == 1 and len(classes[0]) == 3
    implied = {p.to_sql() for p in preds.equivalence_class_predicates()}
    assert "a.x = c.x" in implied  # the transitive edge


def test_count_star_and_star_wrapping(t):
    r, n = t
    q = _query(r, n, Q.eq(Q.col("r_regionkey", r), Q.col("n_regionkey", n)))
    q = q.with_clause(order_by=(Q.OrderByExpression(Q.col("n_name", n)),), limit=5)
    counted = X.as_count_star_query(q)
    assert "count(*)" in counted.to_sql().lower()
    # LIMIT changes the count, so it must survive inside the CTE body
    assert counted.ctes and counted.ctes[0][1].limit == 5
    plain = X.as_count_star_query(q.with_clause(limit=None, order_by=()))
    assert "LIMIT" not in plain.to_sql() and not plain.ctes
    starred = X.as_star_query(q)
    assert starred.select[0].to_sql() == "*"


def test_clause_surgery(t):
    r, n = t
    join = Q.eq(Q.col("r_regionkey", r), Q.col("n_regionkey", n))
    filt = Q.eq(Q.col("r_name", r), Q.lit("ASIA"))
    q = _query(r, n, Q.and_(join, filt))
    dropped = X.remove_predicate(q, filt)
    assert dropped.predicates().joins() and not dropped.predicates().filters()
    readded = X.add_where(dropped, filt)
    assert len(list(readded.where.iterpredicates())) == 2
    nowhere = X.drop_clause(q, "where")
    assert nowhere.where is None


def test_replace_predicate(t):
    """ref transform.py:1281 — round-8 addition closing §2.6 to 19/19."""
    r, n = t
    join = Q.eq(Q.col("r_regionkey", r), Q.col("n_regionkey", n))
    filt = Q.eq(Q.col("r_name", r), Q.lit("ASIA"))
    q = _query(r, n, Q.and_(join, filt))
    new_filt = Q.eq(Q.col("r_name", r), Q.lit("EUROPE"))
    swapped = X.replace_predicate(q, filt, new_filt)
    assert "EUROPE" in swapped.where.to_sql()
    assert "ASIA" not in swapped.where.to_sql()
    # join predicate untouched; a different type may replace (conjunction
    # for a single predicate — the reference's documented use)
    both = X.replace_predicate(q, filt, Q.and_(filt, new_filt))
    assert len(list(both.where.iterpredicates())) >= 3
    # missing target is a no-op, same query back
    assert X.replace_predicate(q, new_filt, filt) == q
    # HAVING is rewritten too
    hq = parse_query(
        "SELECT n_regionkey, count(*) AS c FROM nation "
        "GROUP BY n_regionkey HAVING count(*) > 3"
    )
    target = hq.having
    bumped = X.replace_predicate(
        hq,
        target,
        Q.BinaryPredicate(
            Q.LogicalOperator.GT, Q.SqlExpression("count(*)"), Q.lit(5)
        ),
    )
    assert "5" in bumped.having.to_sql()


def test_sql_rendering_runs_on_both_engines(spark, sf_oracle):
    """The IR's ANSI rendering is executable by Spark *and* DuckDB on the
    same data with identical results — the property that lets IR-built
    queries enter the oracle gate."""
    import duckdb

    from postbound_spark.catalog import register_views, table_path

    r = Q.TableReference("region", "r")
    n = Q.TableReference("nation", "n")
    q = Q.SqlQuery(
        select=(
            Q.BaseProjection(Q.col("r_name", r), "region_name"),
            Q.BaseProjection(Q.SqlExpression("count(*)"), "n_nations"),
        ),
        from_tables=(r, n),
        where=Q.eq(Q.col("r_regionkey", r), Q.col("n_regionkey", n)),
        group_by=(Q.col("r_name", r),),
        order_by=(Q.OrderByExpression(Q.col("r_name", r)),),
    )
    sql = q.to_sql()
    register_views(spark, sf_oracle, ["region", "nation"])
    got = [tuple(row) for row in spark.sql(sql).collect()]
    con = duckdb.connect()
    for name in ("region", "nation"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_oracle, name)}')"
        )
    want = con.execute(sql).fetchall()
    assert got == want and len(got) == 5


def test_rename_columns_rewrites_fragments(t):
    r, n = t
    q = _query(r, n, Q.eq(Q.col("r_name", r), Q.lit("ASIA")))
    renamed = X.rename_columns_in_query(q, {"r_name": "region_label"})
    assert "r.region_label = 'ASIA'" in renamed.to_sql()
    assert "r_name" not in renamed.where.to_sql()


def test_rename_bare_name_does_not_clobber_qualified(t):
    r, _ = t
    # bare "name" must not rewrite inside the qualified "r.name"
    bare = Q.ColumnReference("name")
    e = Q.SqlExpression("name || r.name", (bare, Q.ColumnReference("name", r)))
    q = Q.SqlQuery(select=(Q.BaseProjection(e, "x"),), from_tables=(r,))
    renamed = X.rename_columns_in_query(q, {"name": "label"})
    # both refs are named "name", so both rewrite — but each only in place
    assert renamed.select[0].expr.sql == "label || r.label"


def test_merge_tables_eliminates_self_join(t):
    r, _ = t
    r2 = Q.TableReference("region", "r2")
    q = Q.SqlQuery(
        select=(Q.BaseProjection(Q.col("r_name", r)),),
        from_tables=(r, r2),
        where=Q.and_(
            Q.eq(Q.col("r_regionkey", r), Q.col("r_regionkey", r2)),
            Q.eq(Q.col("r_name", r2), Q.lit("ASIA")),
        ),
    )
    merged = X.merge_tables(q, keep="r", merge="r2")
    assert merged.tables() == {"r"}
    leaves = list(merged.where.iterpredicates())
    assert len(leaves) == 1  # self-equality dropped
    assert leaves[0].to_sql() == "r.r_name = 'ASIA'"


def test_extract_fragment_and_expand(t):
    r, n = t
    join = Q.eq(Q.col("r_regionkey", r), Q.col("n_regionkey", n))
    filt = Q.eq(Q.col("r_name", r), Q.lit("ASIA"))
    q = _query(r, n, Q.and_(join, filt))
    frag = X.extract_query_fragment(q, ["r"])
    assert frag.tables() == {"r"}
    assert frag.where.to_sql() == filt.to_sql()  # join leaf dropped
    back = X.expand_to_query(join)
    assert back.tables() == {"r", "n"}
    assert back.where is join


def test_move_into_subquery_runs_on_spark(spark, sf_oracle, t):
    from postbound_spark.catalog import register_views

    r, n = t
    join = Q.eq(Q.col("r_regionkey", r), Q.col("n_regionkey", n))
    filt = Q.eq(Q.col("r_name", r), Q.lit("ASIA"))
    q = Q.SqlQuery(
        select=(
            Q.BaseProjection(Q.col("n_name", n), "nation_name"),
        ),
        from_tables=(r, n),
        where=Q.and_(join, filt),
        order_by=(Q.OrderByExpression(Q.col("n_name", n)),),
    )
    moved = X.move_into_subquery(q, "r")
    assert moved.ctes and moved.ctes[0][0] == "r"
    assert "WITH r AS" in moved.to_sql()
    register_views(spark, sf_oracle)
    plain = [row[0] for row in spark.sql(q.to_sql()).collect()]
    pushed = [row[0] for row in spark.sql(moved.to_sql()).collect()]
    assert plain == pushed and len(plain) == 5


def test_explain_wrappers(t):
    r, n = t
    q = _query(r, n, Q.eq(Q.col("r_regionkey", r), Q.col("n_regionkey", n)))
    assert X.as_explain(q).startswith("EXPLAIN FORMATTED\n")
    assert X.as_explain_analyze(q).startswith("EXPLAIN COST\n")


# -- simplified views + visitor (ref qal/_qal.py:3718,3944,3383) ------------


def test_simple_filter_wraps_supported_forms():
    from postbound_spark.plans import qal as Q

    q = parse_query(
        "SELECT * FROM customer c, orders o WHERE c.c_custkey = o.o_custkey "
        "AND c.c_acctbal > 100 AND o.o_orderstatus IN ('F', 'O') "
        "AND c.c_nationkey BETWEEN 1 AND 5 AND c.c_acctbal + 1 > 2"
    )
    preds = q.predicates()
    filters = Q.SimpleFilter.wrap_all(preds)
    by_op = {f.operation: f for f in filters}
    assert set(by_op) == {">", "IN", "BETWEEN"}  # the arithmetic one drops
    assert by_op[">"].column.name == "c_acctbal"
    assert [v.to_sql() for v in by_op["BETWEEN"].values] == ["1", "5"]
    assert len(by_op["IN"].values) == 2

    joins = Q.SimpleJoin.wrap_all(preds)
    assert len(joins) == 1
    assert {joins[0].lhs.name, joins[0].rhs.name} == {"c_custkey", "o_custkey"}
    # simplify() = both views over all leaves
    assert len(preds.simplify()) == len(filters) + len(joins)


def test_simple_views_reject_modified_expressions():
    from postbound_spark.plans import qal as Q

    q = parse_query(
        "SELECT * FROM customer c, orders o "
        "WHERE upper(c.c_name) = 'X' AND c.c_custkey + 1 = o.o_custkey"
    )
    assert Q.SimpleFilter.wrap_all(q.predicates()) == []
    assert Q.SimpleJoin.wrap_all(q.predicates()) == []
    # cast-wrapping is tolerated (ref :3727: casts dropped)
    q2 = parse_query(
        "SELECT * FROM customer c WHERE CAST(c.c_acctbal AS int) > 10"
    )
    f = Q.SimpleFilter.wrap_all(q2.predicates())
    assert len(f) == 1 and f[0].column.name == "c_acctbal"


def test_predicate_visitor_dispatch():
    from postbound_spark.plans import qal as Q

    class Counter(Q.PredicateVisitor):
        def __init__(self):
            self.seen = []

        def visit_binary(self, p):
            self.seen.append("binary")

        def visit_compound(self, p):
            self.seen.append("compound")
            for child in p.children:
                child.accept_visitor(self)

        def visit_between(self, p):
            self.seen.append("between")

    q = parse_query(
        "SELECT * FROM customer c WHERE c.c_acctbal > 1 "
        "AND c.c_nationkey BETWEEN 1 AND 2"
    )
    counter = Counter()
    q.where.accept_visitor(counter)
    assert counter.seen == ["compound", "binary", "between"]

    # incomplete visitors fail loudly
    class Empty(Q.PredicateVisitor):
        pass

    with pytest.raises(NotImplementedError):
        q.where.accept_visitor(Empty())


def test_add_clause_and_explicit_to_implicit():
    """ref transform.py:833 add_clause / :172 explicit_to_implicit."""
    q = parse_query("SELECT c_name FROM customer WHERE c_acctbal > 0")
    q2 = X.add_clause(q, "limit", 5)
    assert q2.limit == 5
    q3 = X.add_clause(
        q, "where",
        Q.BinaryPredicate(Q.LogicalOperator.LT, Q.col("c_acctbal"), Q.lit(9)),
    )
    assert len(list(q3.where.iterpredicates())) == 2
    with pytest.raises(ValueError):
        X.add_clause(q, "not_a_clause", 1)

    # inner joins built explicitly normalize; outer joins refuse
    ex = Q.SqlQuery(
        select=(Q.star(),),
        from_tables=(Q.TableReference("customer", "c"),),
        joins=(
            Q.JoinedTable(
                Q.JoinType.INNER,
                Q.TableReference("orders", "o"),
                Q.eq(Q.col("c_custkey", Q.TableReference("customer", "c")),
                     Q.col("o_custkey", Q.TableReference("orders", "o"))),
            ),
        ),
    )
    im = X.explicit_to_implicit(ex)
    assert not im.joins and len(im.from_tables) == 2 and im.where is not None

    outer = replace(ex, joins=(Q.JoinedTable(Q.JoinType.LEFT, ex.joins[0].source,
                                             ex.joins[0].condition),))
    with pytest.raises(ValueError):
        X.explicit_to_implicit(outer)


def test_from_rebuilding_transforms_reject_explicit_joins():
    """rename_table/merge_tables/move_into_subquery/extract_query_fragment
    refuse explicit join chains instead of silently dropping joined
    sources."""
    q = parse_query(
        "SELECT n.n_name FROM nation n "
        "LEFT JOIN customer c ON n.n_nationkey = c.c_nationkey"
    )
    for fn, args in [
        (X.rename_table, ("n", "nn")),
        (X.merge_tables, ("n", "c")),
        (X.move_into_subquery, ("n",)),
        (X.extract_query_fragment, (["n"],)),
    ]:
        with pytest.raises(ValueError, match="explicit join chain"):
            fn(q, *args)


def test_simple_filter_mirrors_literal_on_left():
    """`100 > t.x` must read back as column < 100, not column > 100."""
    from postbound_spark.plans import qal as Q

    pred = Q.BinaryPredicate(
        Q.LogicalOperator.GT, Q.lit(100), Q.col("x", Q.TableReference("t"))
    )
    f = Q.SimpleFilter.wrap(pred)
    assert f.column.name == "x" and f.operation == "<"
    assert f.values[0].to_sql() == "100"
    # LIKE with the column as the pattern is not simplifiable
    like = Q.BinaryPredicate(
        Q.LogicalOperator.LIKE, Q.lit("%a%"), Q.col("x", Q.TableReference("t"))
    )
    assert not Q.SimpleFilter.can_wrap(like)


def test_count_star_preserves_count_changing_clauses():
    """DISTINCT/LIMIT change the count — wrapping must count over the
    original query (CTE body), never silently drop those clauses."""
    import duckdb

    q = parse_query("SELECT DISTINCT n_regionkey FROM nation LIMIT 3")
    wrapped = X.as_count_star_query(q)
    sql = wrapped.to_sql()
    assert "count(*)" in sql and "LIMIT 3" in sql  # limit lives in the CTE
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW nation AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/nation.parquet')"
    )
    assert con.execute(sql).fetchone()[0] == 3  # min(3, 5 regions)
