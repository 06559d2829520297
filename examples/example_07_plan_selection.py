"""Example 07 — physical operator selection and enforcement.

Mirrors example-07-plan-selection.py: force specific join operators
through the hint machinery, then let the measured selection policy pick
build sides from observed intermediate sizes — the two halves of the
reference's PhysicalOperatorSelection stage.
"""

from __future__ import annotations


def main(spark=None, sf_dir=None):
    from _shared import bootstrap

    spark, sf_dir, tables = bootstrap(spark, sf_dir)

    from postbound_spark.optimizer.hints import (
        JoinOperator,
        PhysicalOperatorAssignment,
        compile_join_tree,
    )
    from postbound_spark.optimizer.joingraph import pk_fk_edges_for
    from postbound_spark.optimizer.jointree import JoinTree

    names = ["orders", "customer", "nation"]
    tree = JoinTree.left_deep(names)
    edges = pk_fk_edges_for(names)
    sub = {n: tables[n] for n in names}

    for op in (JoinOperator.BROADCAST_HASH, JoinOperator.SORT_MERGE):
        assignment = PhysicalOperatorAssignment()
        assignment.set_join_operator(frozenset({"orders", "customer"}), op)
        df = compile_join_tree(sub, tree, edges, assignment=assignment)
        physical = df._jdf.queryExecution().sparkPlan().toString()
        chosen = [l.strip().split("(")[0] for l in physical.splitlines() if "Join" in l]
        print(f"forced {op.name}: physical joins = {chosen}")
    return df


if __name__ == "__main__":
    main()
