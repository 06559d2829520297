"""Arbitrary-plan per-intermediate cardinality injection demo/check
(standalone: needs its own JVM with a Hive catalog, so the pytest suite
shells out to this script — same pattern as demo_injection.py).

Proves the SURVEY §7 plan-A capability (ref pg_lab Card hints,
rbergm/PostBOUND postbound/postgres.py:2343-2460): for a query the engine
did NOT hand-build (plain spark.sql text, never touched by
compile_join_tree), two different injected cardinalities for the SAME
intermediate flip the physical plan — broadcast of the intermediate when
the injected count is tiny, sort-merge when it is huge — while results
stay identical.

Prints PASS/FAIL lines; exit code 0 iff all pass.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from postbound_spark.optimizer.injection import CardinalityInjector  # noqa: E402
from postbound_spark.optimizer.intermediates import (  # noqa: E402
    IntermediateCardinalityInjector,
)
from postbound_spark.session import get_spark  # noqa: E402

QUERY = """
WITH active_cust AS (
  SELECT c_custkey, c_nationkey FROM inj_customer WHERE c_acctbal > 1000
)
SELECT a.c_nationkey, count(*) AS n_orders
FROM inj_orders o
JOIN active_cust a ON o.o_custkey = a.c_custkey
GROUP BY a.c_nationkey
"""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        "intermediate-injection-demo",
        cpus=4,
        shuffle_partitions=8,
        enable_hive=True,
        extra_conf={
            # static broadcast decisions only — AQE would re-plan from
            # runtime sizes and mask the injected estimates
            "spark.sql.adaptive.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = CardinalityInjector(spark)
    base.register_parquet("inj_customer", f"{sf_dir}/customer.parquet")
    base.register_parquet("inj_orders", f"{sf_dir}/orders.parquet")
    base.clear("inj_customer")
    # pin the probe side above every broadcast threshold: at sf0.001 the
    # planner would otherwise just broadcast orders itself, masking the
    # intermediate's injected number (fact tables at target scale are
    # never broadcastable — this models that)
    base.inject("inj_orders", 1_000_000_000)

    failures = 0

    def check(label: str, ok: bool, detail: str = "") -> None:
        nonlocal failures
        print(f"{'PASS' if ok else 'FAIL'} {label} {detail}", flush=True)
        failures += 0 if ok else 1

    inj = IntermediateCardinalityInjector(spark)

    def physical(cards: dict[str, float]) -> tuple[str, int]:
        df = inj.plan(QUERY, cards)
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan, df.count()

    tiny_plan, tiny_rows = physical({"active_cust": 10})
    check(
        "tiny-card-broadcasts-intermediate",
        "BroadcastHashJoin" in tiny_plan,
        "(injected 10 rows)",
    )

    huge_plan, huge_rows = physical({"active_cust": 1_000_000_000})
    check(
        "huge-card-degrades-to-shuffle",
        "BroadcastHashJoin" not in huge_plan
        and ("SortMergeJoin" in huge_plan or "ShuffledHashJoin" in huge_plan),
        "(injected 1e9 rows)",
    )
    check("plans-differ", tiny_plan != huge_plan)
    check(
        "results-invariant", tiny_rows == huge_rows, f"({tiny_rows} vs {huge_rows})"
    )

    # the spliced query equals the original CTE query executed untouched
    plain = spark.sql(QUERY)
    spliced = inj.plan(QUERY, {"active_cust": 10})
    same = sorted(map(tuple, plain.collect())) == sorted(map(tuple, spliced.collect()))
    check("splice-preserves-semantics", same)

    # unknown CTE names are rejected loudly
    try:
        inj.plan(QUERY, {"no_such_cte": 5})
        check("unknown-cte-rejected", False)
    except KeyError:
        check("unknown-cte-rejected", True)

    inj.cleanup()
    check(
        "cleanup-drops-tables",
        not spark.catalog.tableExists("active_cust"),
    )

    # a CTE shadowing an existing table/view must be refused, never dropped
    try:
        inj.plan(
            "WITH inj_customer AS "
            "(SELECT * FROM inj_customer WHERE c_acctbal > 0) "
            "SELECT count(*) AS n FROM inj_customer",
            {"inj_customer": 5},
        )
        check("shadowing-cte-refused", False)
    except ValueError:
        check(
            "shadowing-cte-refused",
            spark.catalog.tableExists("inj_customer"),
            "(source table survives)",
        )

    # round-9: SetQuery carries a cte_clause (ref qal/_qal.py:9423), so a
    # set-query CTE body now ABSORBS earlier inline CTEs it references —
    # the old loud refusal is lifted and the materialization succeeds
    try:
        df = inj.plan(
            "WITH a AS (SELECT 1 AS x), "
            "b AS (SELECT x FROM a UNION SELECT 2 AS x) "
            "SELECT count(*) AS n FROM a, b",
            {"b": 10},
        )
        check(
            "set-query-cte-body-absorbs",
            [tuple(r) for r in df.collect()] == [(2,)],
        )
    except Exception as exc:  # noqa: BLE001
        check("set-query-cte-body-absorbs", False, f"({exc})")
    finally:
        inj.cleanup()

    print(f"{9 - failures}/9 passed", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
