"""Notebook display helpers (ref _ipython.py): the SQL quick-formatter,
join-tree / operator-assignment inspectors, and the IPython registration
hook."""

from __future__ import annotations

from postbound_spark.ipython import (
    format_sql,
    inspect_assignment,
    inspect_join_tree,
    setup_pretty_printers,
)


def test_format_sql_breaks_major_clauses():
    sql = (
        "SELECT n_name, count(*) AS n FROM nation, region "
        "WHERE n_regionkey = r_regionkey AND r_name = 'ASIA' "
        "GROUP BY n_name HAVING count(*) > 1 ORDER BY n DESC LIMIT 5"
    )
    got = format_sql(sql)
    lines = got.splitlines()
    assert lines[0].startswith("SELECT")
    for clause in ("FROM", "WHERE", "GROUP BY", "HAVING", "ORDER BY", "LIMIT"):
        assert any(l.startswith(clause) for l in lines), clause
    assert any(l.startswith("  AND ") for l in lines)
    # lexically lossless: collapsing whitespace recovers the input
    assert " ".join(got.split()) == " ".join(sql.split())


def test_format_sql_leaves_subqueries_and_strings_alone():
    sql = (
        "SELECT * FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'FROM WHERE')"
    )
    got = format_sql(sql)
    # the nested SELECT/FROM/WHERE and the literal stay on the IN's line
    (in_line,) = [l for l in got.splitlines() if "IN" in l]
    assert "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'FROM WHERE')" in in_line


def test_format_sql_accepts_parsed_queries():
    from postbound_spark.plans.parser import parse_query

    q = parse_query("SELECT n_name FROM nation WHERE n_nationkey < 5")
    got = format_sql(q)
    assert got.splitlines()[0].startswith("SELECT")
    assert " ".join(got.split()) == " ".join(q.to_sql().split())


def test_inspect_join_tree_shows_nesting_and_bounds():
    from postbound_spark.optimizer.jointree import JoinTree

    tree = JoinTree.join(
        JoinTree.left_deep(["lineitem", "orders"]).annotate(1500.0),
        JoinTree.leaf("customer"),
    )
    got = inspect_join_tree(tree)
    lines = got.splitlines()
    assert lines[0] == "⋈"
    assert "  ⋈  [card≤1500]" in lines
    assert "    lineitem" in lines and "  customer" in lines


def test_inspect_assignment_lists_operators():
    from postbound_spark.optimizer.hints import JoinOperator, PhysicalOperatorAssignment

    a = PhysicalOperatorAssignment()
    assert inspect_assignment(a) == "(no operators forced)"
    a.set_join_operator(frozenset({"lineitem", "orders"}), JoinOperator.BROADCAST_HASH)
    a.global_settings["spark.sql.adaptive.enabled"] = "false"
    a.set_materialize(frozenset({"customer"}))
    got = inspect_assignment(a)
    assert "lineitem ⋈ orders: BROADCAST_HASH" in got
    assert "set spark.sql.adaptive.enabled = false" in got
    assert "materialize customer" in got


def test_setup_registers_with_ipython():
    """With IPython present (it is, in this env), registration succeeds
    and the pretty module renders a parsed query via our formatter."""
    assert setup_pretty_printers() is True
    from IPython.lib import pretty

    from postbound_spark.plans.parser import parse_query

    q = parse_query("SELECT n_name FROM nation WHERE n_nationkey < 3")
    rendered = pretty.pretty(q)
    assert rendered.splitlines()[0].startswith("SELECT")
    assert "WHERE" in rendered


def test_format_sql_never_tears_snake_case_identifiers():
    """Identifiers embedding a clause keyword after '_' must stay intact,
    lowercase keywords keep their case, and a leading AND is untouched —
    all under the lossless re-join guarantee."""
    for sql in (
        "SELECT o_limit, ship_from FROM t WHERE union_flag = 1",
        "select a from t where x = 1 and y = 2",
        "AND leading fragment",
    ):
        got = format_sql(sql)
        assert " ".join(got.split()) == " ".join(sql.split()), (sql, got)
    assert "o_limit, ship_from" in format_sql(
        "SELECT o_limit, ship_from FROM t WHERE union_flag = 1"
    )
    lowered = format_sql("select a from t where x = 1 and y = 2")
    assert "\nfrom t" in lowered and "\n  and y = 2" in lowered
