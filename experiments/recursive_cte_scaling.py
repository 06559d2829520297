#!/usr/bin/env python
"""Scale profile of the WITH RECURSIVE fixpoint (round-9b,
operators/compiler.py visit_recursiveunion).

Two claims to verify, matching the operator's 100-TB story:

1. **Cost ∝ depth, constant per iteration.** Each iteration is one
   localCheckpoint of the delta + an isEmpty probe + a re-planned step
   over ONLY the previous delta — so a ladder of depth d should cost
   ~d × a fixed per-iteration overhead, with no super-linear term from
   lineage growth (the localCheckpoint cut is what prevents the classic
   exponential re-execution tree). Measured: wall at depths 10/40/160,
   reported as sec/iteration.

2. **Data size enters only through the step's own plan.** A fixed-depth
   recursion whose step range-joins a fact table should scale with the
   fact scan like any non-recursive query — the fixpoint machinery adds
   O(depth) driver rounds, independent of table size. Measured: the
   bucket-ladder histogram (depth 10) at sf0.001 / 0.01 / 0.1.

Usage::

    python experiments/recursive_cte_scaling.py \
        [--out=experiments/results/recursive_cte_scaling.json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    out = "experiments/results/recursive_cte_scaling.json"
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out = a.split("=")[1]

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("recursive-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    def run(sql: str, cat=None) -> float:
        t0 = time.perf_counter()
        compile_plan(parse_relalg(parse_query(sql)), spark, cat).count()
        return round(time.perf_counter() - t0, 3)

    # warm the session (JVM + codegen for the recursion shapes)
    run("WITH RECURSIVE w(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM w "
        "WHERE n < 5) SELECT n FROM w")

    # -- claim 1: depth scaling ------------------------------------------
    depth_wall: dict[str, float] = {}
    per_iter: dict[str, float] = {}
    for depth in (10, 40, 160):
        sql = (
            f"WITH RECURSIVE s(n) AS (SELECT 1 UNION ALL SELECT n + 1 "
            f"FROM s WHERE n < {depth}) SELECT count(*) AS c FROM s"
        )
        wall = min(run(sql) for _ in range(3))
        depth_wall[str(depth)] = wall
        per_iter[str(depth)] = round(wall / depth, 4)

    # -- claim 2: data scaling at fixed depth ----------------------------
    ladder_sql = (
        "WITH RECURSIVE b(lo) AS (SELECT 0 UNION ALL SELECT lo + 50000 "
        "FROM b WHERE lo < 450000) "
        "SELECT b.lo AS bucket, count(o_orderkey) AS n FROM b "
        "LEFT OUTER JOIN orders ON o_totalprice >= b.lo "
        "AND o_totalprice < b.lo + 50000 GROUP BY b.lo"
    )
    data_wall: dict[str, float] = {}
    for sf in ("0.001", "0.01", "0.1"):
        cat = load_tables(spark, f"/root/testdata/sf{sf}", ["orders"])
        data_wall[sf] = min(run(ladder_sql, cat) for _ in range(3))

    result = {
        "metric": "recursive_cte_scaling",
        "depth_wall_sec": depth_wall,
        "sec_per_iteration": per_iter,
        "ladder_wall_by_sf": data_wall,
        "notes": (
            "sec_per_iteration ~flat across depths = lineage stays O(1) "
            "per step (localCheckpoint cut); ladder wall tracks the fact "
            "scan, not the recursion"
        ),
    }
    print(json.dumps(result))
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
