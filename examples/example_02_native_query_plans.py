"""Example 02 — reading Catalyst's plans back as analyzable artifacts.

Mirrors example-02-native-query-plans.py: execute a query, read the
physical plan back as a node tree, and inspect per-join estimate-vs-
actual q-errors (the EXPLAIN ANALYZE workflow).
"""

from __future__ import annotations

SQL = """
SELECT o_orderpriority, count(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def main(spark=None, sf_dir=None):
    from _shared import bootstrap

    spark, sf_dir, tables = bootstrap(spark, sf_dir)

    from postbound_spark.experiments import join_qerrors
    from postbound_spark.optimizer.qep import executed_plan

    df = spark.sql(SQL)
    df.collect()  # actuals exist only after an action

    plan = executed_plan(df)

    def walk(node, depth=0):
        print("  " * depth + f"{node.name} (rows={node.actual_rows})")
        for child in node.children:
            walk(child, depth + 1)

    walk(plan)
    for pair in join_qerrors(df):
        print(
            f"join {pair['join']}: est={pair['estimate']:.0f} "
            f"actual={pair['actual']:.0f} qerror={pair['qerror']:.2f}"
        )
    return plan


if __name__ == "__main__":
    main()
