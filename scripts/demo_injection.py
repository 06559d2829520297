"""Cardinality-injection demo/check (run standalone: needs its own JVM with
a Hive catalog, so the pytest suite shells out to this script).

Proves the two properties that make injection useful (SURVEY.md §4.3):
1. Catalyst's optimizer *sees* the injected row count (plan statistics).
2. The injected number *changes the physical plan*: nation is broadcast-
   joined at its true size (25 rows), but after injecting 10M rows the
   planner abandons the broadcast for a shuffle join — exactly how the
   reference studies optimizer sensitivity to cardinality misestimates.

Prints PASS/FAIL lines; exit code 0 iff all pass.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from postbound_spark.optimizer.injection import CardinalityInjector  # noqa: E402
from postbound_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        "injection-demo",
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
    inj = CardinalityInjector(spark)
    inj.register_parquet("inj_nation", f"{sf_dir}/nation.parquet")
    inj.register_parquet("inj_customer", f"{sf_dir}/customer.parquet")
    inj.clear("inj_nation")
    inj.clear("inj_customer")

    failures = 0

    def check(label: str, ok: bool, detail: str = "") -> None:
        nonlocal failures
        print(f"{'PASS' if ok else 'FAIL'} {label} {detail}", flush=True)
        failures += 0 if ok else 1

    true_rows = inj.visible_row_count("inj_nation")
    check("true-stats-visible", true_rows == 25, f"(saw {true_rows})")

    join_sql = (
        "SELECT c.c_custkey, n.n_name FROM inj_customer c "
        "JOIN inj_nation n ON c.c_nationkey = n.n_nationkey"
    )
    plan_before = spark.sql(join_sql)._jdf.queryExecution().executedPlan().toString()
    check("small-side-broadcast", "BroadcastHashJoin" in plan_before)

    inj.inject("inj_nation", 10_000_000)
    check("injected-stats-visible", inj.visible_row_count("inj_nation") == 10_000_000)

    # with one side injected large, the planner must flip the build side to
    # the (still small) other table; with BOTH sides injected large, no
    # broadcast is legal at all and the join degrades to a shuffle join —
    # exactly the misestimate-sensitivity experiment the reference runs
    plan_flip = spark.sql(join_sql)._jdf.queryExecution().executedPlan().toString()
    check(
        "injection-flips-build-side",
        "BroadcastHashJoin" in plan_flip and "BuildLeft" in plan_flip,
    )
    inj.inject("inj_customer", 10_000_000)
    plan_after = spark.sql(join_sql)._jdf.queryExecution().executedPlan().toString()
    check(
        "injection-changes-plan",
        "BroadcastHashJoin" not in plan_after
        and ("SortMergeJoin" in plan_after or "ShuffledHashJoin" in plan_after),
    )

    inj.clear("inj_nation")
    inj.clear("inj_customer")
    plan_restored = spark.sql(join_sql)._jdf.queryExecution().executedPlan().toString()
    check("clear-restores-plan", "BroadcastHashJoin" in plan_restored)

    # results are unchanged by statistics (the invariant every injection
    # experiment relies on)
    n = spark.sql(join_sql).count()
    inj.inject("inj_nation", 10_000_000)
    check("results-invariant", spark.sql(join_sql).count() == n)

    print(f"{7 - failures}/7 passed", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
