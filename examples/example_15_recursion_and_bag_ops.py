"""Example 15 — round-9b SQL surface: WITH RECURSIVE, bag-semantics set
operations, and FETCH ... WITH TIES.

All three are extensions BEYOND the reference (its SetOperator stops at
UNION ALL, its Limit clause models ONLY, and it excludes recursion at
qal/_qal.py:8436), executed through the engine's NATIVE pipeline
(parse_query → parse_relalg → compile_plan — spark.sql never sees the
text):

1. ``WITH RECURSIVE`` — an ANSI working-table fixpoint: the step term
   re-plans each iteration against only the previous delta, UNION
   dedups globally (cycle-safe), UNION ALL stops on an empty delta, and
   every delta is localCheckpoint-ed so lineage stays O(1) per step;
2. ``INTERSECT ALL`` / ``EXCEPT ALL`` — duplicate multiplicities
   min(m, n) / max(0, m − n) via Spark's native
   ``intersectAll``/``exceptAll``;
3. ``FETCH FIRST n ROWS WITH TIES`` — a rank()-window cutoff whose
   physical plan is a Partial WindowGroupLimit per input partition
   before the single exchange (top-n cost, not global-sort cost).
"""

from __future__ import annotations


def main(spark=None, sf_dir=None):
    from _shared import bootstrap

    spark, sf_dir, _tables = bootstrap(spark, sf_dir)

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query

    cat = load_tables(spark, sf_dir, ["nation", "orders"])

    def run(sql: str):
        return compile_plan(parse_relalg(parse_query(sql)), spark, cat)

    print("===== 1. WITH RECURSIVE — cyclic closure + generator =====\n")
    closure = run(
        """
        WITH RECURSIVE edge(src, dst) AS (VALUES (0, 1), (1, 2), (2, 0), (2, 3)),
          reach(node) AS (
            SELECT 0
            UNION
            SELECT e.dst FROM edge e, reach r WHERE e.src = r.node
          )
        SELECT node FROM reach ORDER BY node
        """
    )
    print("reachable from 0 over a CYCLIC graph (UNION guard terminates):")
    closure.show()

    ladder = run(
        "WITH RECURSIVE b(lo) AS (SELECT 0 UNION ALL SELECT lo + 100000 "
        "FROM b WHERE lo < 400000) "
        "SELECT b.lo AS bucket, count(o_orderkey) AS n FROM b "
        "LEFT OUTER JOIN orders ON o_totalprice >= b.lo "
        "AND o_totalprice < b.lo + 100000 GROUP BY b.lo ORDER BY bucket"
    )
    print("recursive price ladder range-joined to orders:")
    ladder.show()

    print("===== 2. INTERSECT ALL / EXCEPT ALL (bag semantics) =====\n")
    bag = run(
        "SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000 "
        "INTERSECT ALL SELECT o_custkey AS k FROM orders "
        "WHERE o_orderpriority = '1-URGENT' ORDER BY k LIMIT 10"
    )
    print("min(m, n) duplicate multiplicities survive INTERSECT ALL:")
    bag.show()

    print("===== 3. FETCH FIRST n ROWS WITH TIES =====\n")
    ties = run(
        "SELECT o_orderpriority AS prio, count(*) AS n FROM orders "
        "GROUP BY o_orderpriority ORDER BY n DESC "
        "FETCH FIRST 2 ROWS WITH TIES"
    )
    print("top-2 priorities by count, ties of the 2nd place included:")
    ties.show()
    plan = ties._jdf.queryExecution().executedPlan().toString()
    partial = "WindowGroupLimit" in plan and "Partial" in plan
    print(f"plan uses Partial WindowGroupLimit (scale-safe top-n): {partial}")

    return {"closure_nodes": closure.count(), "ladder_rows": ladder.count()}


if __name__ == "__main__":
    main()
