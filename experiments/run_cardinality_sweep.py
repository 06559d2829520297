#!/usr/bin/env python
"""Sweep injected cardinalities for one intermediate and record the plan
flips — the pg_lab ``Card()`` misestimate-sensitivity experiment (ref
``postbound/postgres.py:2343-2460``), affordable on Spark because the
plan-time injector writes nothing: each sweep point costs one plan
compilation.

Usage:
    python experiments/run_cardinality_sweep.py [out.parquet]
        [--table-set customer] [--cards 1e2,1e3,...,1e9] [--execute]

Runs against the TPC-H-shaped fixture at $SPARK_GRAFT_SF_DIR (default
sf0.01): a 3-way lineitem ⋈ orders ⋈ customer aggregate whose customer
subtree's injected cardinality sweeps the broadcast↔sort-merge boundary.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")

SQL = """
SELECT o_orderpriority, count(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
WHERE c_acctbal > 0
GROUP BY o_orderpriority
"""


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_path", nargs="?", default="cardinality_sweep.parquet")
    ap.add_argument("--table-set", default="customer")
    ap.add_argument(
        "--cards", default=",".join(f"1e{e}" for e in range(2, 10))
    )
    ap.add_argument("--execute", action="store_true")
    ns = ap.parse_args()

    from postbound_spark.catalog import register_views
    from postbound_spark.experiments import cardinality_sweep
    from postbound_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("cardinality-sweep")
    register_views(spark, sf_dir, ["customer", "orders", "lineitem"])
    frame = cardinality_sweep(
        spark,
        SQL,
        tuple(ns.table_set.split(",")),
        [float(c) for c in ns.cards.split(",")],
        execute=ns.execute,
    )
    print(frame[["card", "parent_join_operator", "planning_time"]].to_string(index=False))
    flips = (frame.parent_join_operator != frame.parent_join_operator.shift()).sum() - 1
    print(f"{flips} operator flip(s) across {len(frame)} zero-write sweep points")
    frame.to_parquet(ns.out_path, index=False)
    print(f"results -> {ns.out_path}")


if __name__ == "__main__":
    main()
