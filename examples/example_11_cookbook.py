"""Example 11 — the cookbook's recipes, runnable end to end.

Counterpart of the reference's ``docs/source/cookbook.rst``: frequently
used patterns — implementing a cardinality estimator, manual hinting,
the three forms of a query plan, and JSON export — each re-expressed
against the Spark engine's surfaces. ``docs/cookbook.md`` narrates these
exact calls; ``tests/test_docs.py`` pins doc and script together.
"""

from __future__ import annotations

SQL = """
SELECT n.n_name, count(*) AS n_customers
FROM customer c, nation n, region r
WHERE c.c_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'EUROPE' AND c.c_acctbal > 0
GROUP BY n.n_name
"""


def main(spark=None, sf_dir=None):
    from _shared import bootstrap

    spark, sf_dir, tables = bootstrap(spark, sf_dir)

    # -- recipe 1: a custom cardinality estimator ------------------------
    # Subclass the stage interface; anything with estimate_cardinality
    # drops into the DP enumerators and the experiment loops.
    from postbound_spark.optimizer.cardinalities import (
        StatsCardinalityEstimator,
    )
    from postbound_spark.optimizer.stages import CardinalityEstimator
    from postbound_spark.plans.parser import parse_query, to_query_spec

    class TwiceTheStats(CardinalityEstimator):
        """A decorator estimator: the stats estimate, doubled."""

        def __init__(self):
            self.inner = StatsCardinalityEstimator()

        def estimate_cardinality(self, spec, intermediate, tables):
            return 2.0 * self.inner.estimate_cardinality(
                spec, intermediate, tables
            )

    parsed = parse_query(SQL)
    spec = to_query_spec(parsed)
    est = TwiceTheStats()
    # stages speak in FROM identifiers (the aliases): alias-key the frames
    alias_of = {"customer": "c", "nation": "n", "region": "r"}
    prep = {a: tables[t].alias(a) for t, a in alias_of.items()}
    key = frozenset({"c", "n"})
    print(f"2x stats estimate for {sorted(key)}: "
          f"{est.estimate_cardinality(spec, key, prep):.0f}")

    # The RECOMMENDED deployment for a new estimator is fill-the-gaps:
    # hand Spark only your numbers through the zero-write plan-time
    # injector and let Catalyst keep join ordering + operator selection.
    from postbound_spark.optimizer.planstats import PlanTimeCardinalityInjector

    with PlanTimeCardinalityInjector(spark) as injector:
        sets = injector.table_sets(SQL)  # occurrence-qualified ('t#1')
        cards = {
            tuple(sorted(s)): est.estimate_cardinality(
                spec, frozenset(alias_of[t.split("#")[0]] for t in s), prep
            )
            for s in sets
            if len(s) == 1
        }
        df = injector.plan(SQL, cards, adaptive=False)
        n_injected = len(cards)
    print(f"fill-the-gaps: injected {n_injected} base cardinalities; "
          f"result rows={df.count()}")

    # -- recipe 2: manual hinting ---------------------------------------
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.optimizer.hints import (
        JoinOperator,
        PhysicalOperatorAssignment,
        apply_join_hints_to_relalg,
    )
    from postbound_spark.plans.algebra import parse_relalg

    operators = PhysicalOperatorAssignment()
    operators.set_join_operator(frozenset({"c", "n"}), JoinOperator.SORT_MERGE)
    # a join_order pins the left-deep fold; alias-qualified join predicates
    # become the ThetaJoin nodes the per-join hints ride on (the
    # strategy-matrix enforcement path)
    tree = parse_relalg(parsed, join_order=["c", "n", "r"])
    hinted_tree = apply_join_hints_to_relalg(tree, operators)
    hinted_df = compile_plan(hinted_tree, spark)
    hinted_df.count()

    # -- recipe 3: the three forms of a query plan ----------------------
    from postbound_spark.experiments import join_qerrors
    from postbound_spark.optimizer.qep import executed_plan, optimized_plan

    raw = hinted_df._jdf.queryExecution().executedPlan().toString()
    plan = optimized_plan(hinted_df)          # estimates, pre-execution
    qep = executed_plan(hinted_df)            # actual rows, post-execution
    worst = max((p["qerror"] for p in join_qerrors(hinted_df)), default=1.0)
    print(f"raw explain: {len(raw.splitlines())} lines; "
          f"optimized: {plan.node_count()} nodes; "
          f"worst join q-error {worst:.2f}")
    assert any(n.name == "SortMergeJoin" for n in qep.find_all("Join")), (
        "the manual SORT_MERGE hint must survive to the executed plan"
    )

    # -- recipe 4: JSON export ------------------------------------------
    import dataclasses
    import json

    payload = json.dumps(dataclasses.asdict(qep))  # PlanNodes are dataclasses
    round_tripped = json.loads(payload)
    print(f"jsonized plan: {len(payload)} bytes, "
          f"root={round_tripped['name']}")

    return qep
