"""DOT renderers for optimizer artifacts (ref vis/ package, 7 modules)."""

from __future__ import annotations

import math

import pytest

from postbound_spark import vis
from postbound_spark.optimizer.jointree import JoinTree
from postbound_spark.optimizer.joingraph import JoinEdge
from postbound_spark.optimizer.qep import PlanNode
from postbound_spark.optimizer.stages import QuerySpec
from postbound_spark.plans.algebra import parse_relalg
from postbound_spark.plans.parser import parse_query

SPEC = QuerySpec(
    tables=("customer", "orders", "lineitem"),
    edges=(
        JoinEdge("orders", "o_custkey", "customer", "c_custkey"),
        JoinEdge("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ),
)


def test_join_tree_dot_contains_tables_and_cards():
    tree = JoinTree.join(
        JoinTree.leaf("customer", 150.0), JoinTree.leaf("orders", 1500.0), 4000.0
    )
    dot = vis.plot_join_tree(tree)
    assert dot.startswith("graph join_tree {")
    for fragment in ("customer", "orders", "card=4,000", "150"):
        assert fragment in dot
    assert dot.count("--") == 2  # two edges from the join to its leaves


def test_join_graph_pk_fk_arrows():
    dot = vis.plot_join_graph(SPEC)
    assert "digraph join_graph {" in dot
    assert "o_custkey = c_custkey" in dot
    # FK side points at PK side: orders -> customer, lineitem -> orders
    ids = {
        line.split(" [")[0].strip(): line
        for line in dot.splitlines()
        if "label=" in line and "--" not in line and "->" not in line
    }
    assert len(ids) == 3
    assert dot.count("->") == 2


def test_relalg_dot_uses_operator_symbols():
    q = parse_query(
        "SELECT n_name, count(*) AS n FROM nation WHERE n_regionkey = 1 "
        "GROUP BY n_name ORDER BY n_name"
    )
    dot = vis.plot_relalg(parse_relalg(q))
    for symbol in ("γ", "σ", "τ", "π", "Relation"):
        assert symbol in dot, f"missing {symbol}"


def test_query_plan_and_analyze_annotations():
    plan = PlanNode(
        "HashAggregate",
        children=[
            PlanNode("SortMergeJoin", estimated_rows=100.0, actual_rows=1000.0)
        ],
        estimated_rows=5.0,
        actual_rows=5.0,
    )
    est_dot = vis.plot_query_plan(plan)
    assert "est=100" in est_dot and "act=" not in est_dot
    ana_dot = vis.plot_analyze_plan(plan)
    assert "est=100 act=1,000" in ana_dot
    assert "q-err=10.00" in ana_dot


def test_tonic_qeps_dot(spark):
    from postbound_spark.optimizer.hints import JoinOperator
    from postbound_spark.optimizer.tonic import TonicOperatorSelection

    tonic = TonicOperatorSelection()
    tree = JoinTree.join(JoinTree.leaf("a"), JoinTree.leaf("b"))
    tonic.record_plan(
        tree,
        {frozenset({"a", "b"}): JoinOperator.SORT_MERGE},
        {frozenset({"a", "b"}): 3.5},
    )
    dot = vis.plot_tonic_qeps(tonic)
    assert "QEP-S" in dot and "SORT_MERGE" in dot and "3.50" in dot


def test_force_directed_layout_positions_every_table():
    pos = vis.force_directed_layout(SPEC, seed=7)
    assert set(pos) == set(SPEC.tables)
    xs = [p[0] for p in pos.values()]
    assert len(set(xs)) > 1  # not all collapsed onto one point
    again = vis.force_directed_layout(SPEC, seed=7)
    assert pos == again  # seeded determinism


def test_render_gates_on_missing_dot_binary(tmp_path):
    import shutil as _shutil

    dot = vis.plot_join_graph(SPEC)
    if _shutil.which("dot") is None:
        with pytest.raises(RuntimeError, match="dot"):
            vis.render(dot, str(tmp_path / "g.png"))
    else:  # pragma: no cover - environment-dependent
        out = vis.render(dot, str(tmp_path / "g.png"))
        assert (tmp_path / "g.png").exists() and out.endswith("g.png")


def test_join_graph_dedups_value_equal_runtime_strings():
    """Regression (round-4 review): table names arriving as NON-interned
    runtime-built strings (config/JSON) must dedup by VALUE — one node
    per table, edges attached to it, never disconnected duplicates."""
    t = ["".join(c for c in name) for name in ("customer", "orders")]  # non-interned
    spec = QuerySpec(
        tables=tuple(t),
        edges=(JoinEdge("ord" + "ers", "o_custkey", "custo" + "mer", "c_custkey"),),
    )
    dot = vis.plot_join_graph(spec)
    node_lines = [
        l for l in dot.splitlines()
        if "label=" in l and "->" not in l and "--" not in l
    ]
    assert len(node_lines) == 2, dot  # exactly one node per table
    assert dot.count("->") == 1


def test_join_tree_keeps_equal_subtrees_distinct():
    """The inverse guarantee: two value-equal LEAVES in one tree (a
    self-join) stay two drawn nodes — tree nodes key by identity."""
    tree = JoinTree.join(JoinTree.leaf("nation"), JoinTree.leaf("nation"))
    dot = vis.plot_join_tree(tree)
    assert dot.count('label="nation"') == 2, dot


def test_alternate_layouts_and_card_annotations():
    """ref vis/fdl.py:33/:54 (kamada-kawai, fruchterman-reingold) and
    vis/optimizer.py:176-303 (cardinality node annotations)."""
    fr = vis.fruchterman_reingold_layout(SPEC, seed=7)
    assert set(fr) == set(SPEC.tables)
    # kamada-kawai needs scipy underneath networkx; in environments
    # without it the helper must fail with the actionable ImportError,
    # not something opaque
    try:
        import scipy  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="scipy"):
            vis.kamada_kawai_layout(SPEC)
    else:
        assert set(vis.kamada_kawai_layout(SPEC)) == set(SPEC.tables)
    dot = vis.plot_join_graph(SPEC, card_of=lambda t: 1500.0)
    assert "|R| = 1,500" in dot
