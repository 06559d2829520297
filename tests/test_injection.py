"""Cardinality injection (optimizer/injection.py) — runs in a subprocess
because the Hive catalog implementation is fixed at first-session creation
per JVM, and the shared test session is in-memory-cataloged."""

from __future__ import annotations

import subprocess
import sys


def test_injection_demo_subprocess():
    proc = subprocess.run(
        [sys.executable, "scripts/demo_injection.py", "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=".",
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-2000:]}"
    assert "7/7 passed" in proc.stdout


def test_intermediate_cardinality_changes_physical_plan(spark, sf_small):
    """Per-intermediate injection (ref pg_lab Card hints, postgres.py:2343):
    the SAME join tree planned under two different injected cardinalities
    for the {orders, customer} intermediate must yield two different
    physical plans — broadcast of the intermediate when the injected count
    is tiny, sort-merge when it is huge."""
    from postbound_spark.catalog import load_tables
    from postbound_spark.optimizer.hints import compile_join_tree
    from postbound_spark.optimizer.joingraph import JoinEdge
    from postbound_spark.optimizer.jointree import JoinTree
    from postbound_spark.optimizer.stages import PlanParameterization

    t = load_tables(spark, sf_small, ["customer", "orders", "lineitem"])
    tree = JoinTree.join(
        JoinTree.leaf("lineitem"),
        JoinTree.join(JoinTree.leaf("orders"), JoinTree.leaf("customer")),
    )
    edges = [
        JoinEdge("lineitem", "l_orderkey", "orders", "o_orderkey"),
        JoinEdge("orders", "o_custkey", "customer", "c_custkey"),
    ]

    def plan_with(card: float) -> str:
        params = PlanParameterization()
        params.set_cardinality(frozenset({"orders", "customer"}), card)
        df = compile_join_tree(t, tree, edges, parameters=params)
        return df._jdf.queryExecution().executedPlan().toString()

    tiny = plan_with(10.0)
    huge = plan_with(1e9)
    assert "BroadcastHashJoin" in tiny
    assert "SortMergeJoin" in huge
    assert tiny != huge

    # identical rows either way: injection changes the plan, never results
    params = PlanParameterization()
    params.set_cardinality(frozenset({"orders", "customer"}), 10.0)
    a = compile_join_tree(t, tree, edges, parameters=params).count()
    params.set_cardinality(frozenset({"orders", "customer"}), 1e9)
    b = compile_join_tree(t, tree, edges, parameters=params).count()
    assert a == b


def test_intermediate_injection_demo_subprocess():
    """SURVEY §7 plan A: two injected cardinalities for the same CTE
    intermediate flip the physical plan of a query the engine did NOT
    hand-build (plain spark.sql text — ref pg_lab capability,
    postgres.py:2343-2460)."""
    proc = subprocess.run(
        [
            sys.executable,
            "scripts/demo_intermediate_injection.py",
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=".",
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-2000:]}"
    assert "9/9 passed" in proc.stdout
