#!/usr/bin/env python
"""Round-10 verdict item 4: graph-GROWTH scale profile of the WITH
RECURSIVE fixpoint (the prior recursive_cte_scaling varies depth and
fact size but keeps the closure graph fixture-fixed, so its x10
exponent said nothing about graph growth).

Construction: a layered graph with BOUNDED DIAMETER — D levels of
W = N/D nodes each, every level-l node (l >= 1) with exactly one parent
in level l-1, and the whole of level 0 seeding the recursion. BFS from
the seeds reaches all N nodes in exactly D iterations with a frontier
of W nodes per step, so N grows while the iteration count stays fixed —
the pure graph-growth axis.

Two variants per N:

- UNION (ANSI dedup): each step runs `delta.distinct().subtract(seen)` —
  the subtract re-shuffles the ACCUMULATED result (size -> N) every
  iteration, so total dedup work is O(D * N) even though the frontier
  is N/D. This is the term that dominates once the accumulated set
  dwarfs the frontier.
- UNION ALL (no dedup; the single-parent construction keeps it exact):
  per-step work is the frontier join only.

Reported: wall + exponent on N for both variants, and the dedup share
(union_wall / union_all_wall). Expectation: both ~linear in N (fixed D),
with the UNION constant strictly larger — the documented cost of the
ANSI cycle guard.

Usage: python experiments/recursive_graph_scaling.py [--out=...]
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, ".")

SIZES = [10_000, 100_000, 1_000_000]
DEPTH = 10


def main() -> int:
    out = "experiments/results/recursive_graph_scaling.json"
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out = a.split("=")[1]

    from pyspark.sql import functions as F
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("recursive-graph")
    spark.sparkContext.setLogLevel("ERROR")

    UNION_SQL = (
        "WITH RECURSIVE reach(node) AS ("
        " SELECT r_id AS node FROM roots"
        " UNION SELECT e.dst FROM edges e, reach r WHERE e.src = r.node)"
        " SELECT count(*) AS n FROM reach"
    )
    UNION_ALL_SQL = UNION_SQL.replace("UNION SELECT", "UNION ALL SELECT")

    def build(n: int):
        w = n // DEPTH
        ids = spark.range(n).withColumnRenamed("id", "dst")
        edges = (
            ids.where(F.col("dst") >= w)
            .withColumn(
                "src",
                (F.floor(F.col("dst") / w) - 1) * w + F.col("dst") % w,
            )
            .select("src", "dst")
            .repartition(32)
            .localCheckpoint(eager=True)
        )
        roots = (
            spark.range(w).withColumnRenamed("id", "r_id")
            .localCheckpoint(eager=True)
        )
        return {"edges": edges, "roots": roots}

    def run(sql: str, cat, reps: int = 2) -> tuple[float, int]:
        df = compile_plan(parse_relalg(parse_query(sql)), spark, cat)
        rows = df.collect()[0][0]
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            compile_plan(parse_relalg(parse_query(sql)), spark, cat).collect()
            walls.append(time.perf_counter() - t0)
        return round(min(walls), 3), rows

    results = {"depth": DEPTH, "sizes": {}}
    for n in SIZES:
        cat = build(n)
        u_wall, u_rows = run(UNION_SQL, cat)
        a_wall, a_rows = run(UNION_ALL_SQL, cat)
        assert u_rows == a_rows == n, (u_rows, a_rows, n)
        results["sizes"][str(n)] = {
            "union_wall": u_wall,
            "union_all_wall": a_wall,
            "dedup_share": round(u_wall / a_wall, 2),
        }
        print(f"N={n}: union {u_wall}s, union_all {a_wall}s")

    lo, hi = str(SIZES[0]), str(SIZES[-1])
    factor = SIZES[-1] / SIZES[0]
    for v in ("union_wall", "union_all_wall"):
        e = math.log(
            results["sizes"][hi][v] / results["sizes"][lo][v]
        ) / math.log(factor)
        results[f"{v}_exponent_x{int(factor)}"] = round(e, 3)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)
    print(json.dumps({k: v for k, v in results.items() if k != "sizes"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
