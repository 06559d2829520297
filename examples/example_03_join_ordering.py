"""Example 03 — comparing join-ordering strategies.

Mirrors example-03-join-ordering.py: the same workload through Catalyst's
native order, the UES pessimistic order, and the Postgres-style DP, with
runtimes and q-errors side by side (the optimizer-research loop in
miniature).
"""

from __future__ import annotations

QUERIES = {
    "orders_by_nation": """
        SELECT count(*) AS n
        FROM customer c, orders o, nation n
        WHERE c.c_custkey = o.o_custkey AND c.c_nationkey = n.n_nationkey
          AND c.c_acctbal > 0
    """,
    "parts_by_region": """
        SELECT count(*) AS n
        FROM lineitem l, orders o, customer c, nation n, region r
        WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
          AND c.c_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
    """,
}


def main(spark=None, sf_dir=None):
    from _shared import bootstrap

    spark, sf_dir, tables = bootstrap(spark, sf_dir)

    from postbound_spark.experiments import run_optimizer_loop

    results = run_optimizer_loop(
        spark, QUERIES, tables, strategies=("native", "ues", "pgdp")
    )
    print(
        results[
            ["label", "strategy", "exec_time", "join_order", "max_qerror"]
        ].to_string(index=False)
    )
    return results


if __name__ == "__main__":
    main()
