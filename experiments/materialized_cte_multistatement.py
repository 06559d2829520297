#!/usr/bin/env python
"""Multi-statement MATERIALIZED-CTE evidence (round-9 verdict item 5).

Round-8 measured the WITHIN-action case and found AQE exchange reuse
already covers a CTE referenced twice inside one statement — ``cache()``
bought nothing there. The cache's actual payoff is the MULTI-ACTION
case: a session issuing N statements over the same MATERIALIZED CTE.
This experiment measures exactly that through the facade:

- ``session_cte_cache=True``  — the opt-in session cache: the first
  statement compiles + caches the CTE, statements 2..N reuse the
  InMemoryRelation (value-keyed Materialize nodes).
- ``session_cte_cache=False`` — the default statement-scoped lifecycle
  (Postgres MATERIALIZED semantics): every statement re-derives the CTE
  from the parquet scans and unpersists at statement end.

The CTE is a join+aggregate over the sf0.1 fact tables (lineitem ⋈
orders → per-customer revenue); the N outer statements are cheap reads
over it, so the measured difference isolates the re-derivation cost.

Usage::

    python experiments/materialized_cte_multistatement.py \
        [--statements=6] [--reps=3] \
        [--out=experiments/results/materialized_cte_multistatement.json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.1"

CTE_BODY = (
    "SELECT o.o_custkey AS cust, "
    "CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) "
    "AS DECIMAL(18,4))) AS DOUBLE) AS revenue, count(*) AS n_items "
    "FROM lineitem l, orders o WHERE l.l_orderkey = o.o_orderkey "
    "GROUP BY o.o_custkey"
)

#: N cheap consumers over the CTE — different outer shapes so Spark
#: cannot collapse them into one plan, same CTE text so the value-keyed
#: memo hits
OUTER = [
    "SELECT count(*) AS n FROM rev",
    "SELECT CAST(max(n_items) AS BIGINT) AS m FROM rev",
    "SELECT count(*) AS n FROM rev WHERE revenue > 100000",
    "SELECT cust FROM rev ORDER BY revenue DESC LIMIT 5",
    "SELECT count(*) AS n FROM rev WHERE n_items >= 30",
    "SELECT CAST(min(cust) AS BIGINT) AS c FROM rev WHERE revenue > 500000",
]


def run(db, statements: int) -> float:
    t0 = time.perf_counter()
    for outer in OUTER[:statements]:
        db.execute_query(
            f"WITH rev AS MATERIALIZED ({CTE_BODY}) {outer}",
            raw=True,
            native=True,
        )
    return time.perf_counter() - t0


def main() -> int:
    statements, reps = 6, 3
    out = "experiments/results/materialized_cte_multistatement.json"
    for a in sys.argv[1:]:
        if a.startswith("--statements="):
            statements = int(a.split("=")[1])
        elif a.startswith("--reps="):
            reps = int(a.split("=")[1])
        elif a.startswith("--out="):
            out = a.split("=")[1]

    from postbound_spark.database import Database
    from postbound_spark.session import get_spark

    spark = get_spark("mat-cte-exp", cpus=8, shuffle_partitions=8)
    result = {
        "metric": "materialized_cte_multistatement",
        "sf_dir": SF_DIR,
        "statements": statements,
        "reps": reps,
    }
    for mode, flag in (("session_cache", True), ("statement_scoped", False)):
        db = Database(spark, SF_DIR, rebind=True, session_cte_cache=flag)
        try:
            run(db, 1)  # warm: parquet footer reads, codegen
            best = min(run(db, statements) for _ in range(reps))
        finally:
            db.release()
        result[mode] = {"best_sec": round(best, 3)}
        print(f"{mode}: {best:.3f}s for {statements} statements")
    result["speedup"] = round(
        result["statement_scoped"]["best_sec"]
        / result["session_cache"]["best_sec"],
        2,
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
