"""Example 16 — round-10 SQL surface: expression-position subquery
predicates, quantified comparisons, QUALIFY, in-call ordered aggregates,
row-value operations, and the engine-parity defaults.

Everything runs through the NATIVE pipeline (parse_query → parse_relalg
→ compile_plan — spark.sql never sees the text):

1. EXISTS / IN in EXPRESSION position (CASE branches, boolean select
   items) — count-form lift: correlated probes decorrelate into per-key
   grouped counts + LEFT joins, uncorrelated ones become 1-row
   broadcast constants; full three-valued IN;
2. ANY/ALL/SOME quantified comparisons — the min/max form (four 1-row
   aggregates, never a per-row nested loop) with exact ANSI 3VL;
3. QUALIFY — the post-window filter, desugared to a marker column;
4. string_agg/array_agg with in-call ORDER BY — struct-sort lowering;
5. row-value IN over a subquery (multi-column semi join, beyond DuckDB)
   and lexicographic row comparisons (ANSI recursion);
6. parity defaults: ORDER BY nulls place LAST (DuckDB
   default_null_order), extract(dow) is Sunday=0, ANSI backslash
   literals.
"""

from __future__ import annotations


def main(spark=None, sf_dir=None):
    from _shared import bootstrap

    spark, sf_dir, _tables = bootstrap(spark, sf_dir)

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query

    cat = load_tables(
        spark, sf_dir, ["nation", "region", "customer", "supplier", "orders"]
    )

    def run(sql: str):
        return compile_plan(parse_relalg(parse_query(sql)), spark, cat)

    print("===== 1. memberships in EXPRESSION position =====\n")
    flags = run(
        "SELECT n.n_name, "
        "CASE WHEN EXISTS (SELECT 1 FROM customer c "
        "WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000) "
        "THEN 'rich' ELSE 'poor' END AS wealth, "
        "n.n_regionkey IN (SELECT r_regionkey FROM region "
        "WHERE r_name LIKE 'A%') AS in_a_region "
        "FROM nation n ORDER BY n.n_name LIMIT 6"
    )
    flags.show()
    plan = flags._jdf.queryExecution().executedPlan().toString()
    print("no cartesian product:", "CartesianProduct" not in plan)

    print("===== 2. quantified comparisons (min/max form) =====\n")
    run(
        "SELECT n_name, "
        "CAST(n_regionkey > ALL (SELECT r_regionkey FROM region "
        "WHERE r_name LIKE 'A%') AS STRING) AS gt_all_a "
        "FROM nation ORDER BY n_name LIMIT 6"
    ).show()

    print("===== 3. QUALIFY (post-window filter) =====\n")
    run(
        "SELECT o_custkey, o_totalprice, "
        "rank() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey) AS r "
        "FROM orders WHERE o_orderkey < 2000 "
        "QUALIFY r = 1 ORDER BY o_totalprice DESC LIMIT 5"
    ).show()

    print("===== 4. in-call aggregate ORDER BY =====\n")
    run(
        "SELECT n_regionkey, "
        "string_agg(n_name, ', ' ORDER BY n_name) AS members "
        "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"
    ).show(truncate=False)

    print("===== 5. row-value operations =====\n")
    row_in = run(
        "SELECT c.c_name FROM customer c "
        "WHERE (c.c_nationkey, c.c_mktsegment) IN "
        "(SELECT s.s_nationkey, 'BUILDING' FROM supplier s "
        " WHERE s.s_acctbal > 2000) "
        "AND (c.c_nationkey, c.c_custkey) >= (20, 100) "
        "ORDER BY c.c_name LIMIT 5"
    )
    row_in.show()
    plan = row_in._jdf.queryExecution().executedPlan().toString()
    print("row membership = one multi-column semi join:",
          "LeftSemi" in plan)

    print("===== 6. parity defaults =====\n")
    run(
        "SELECT n_name, "
        "CASE WHEN n_regionkey = 2 THEN NULL ELSE n_regionkey END AS k "
        "FROM nation ORDER BY k LIMIT 5"
    ).show()  # NULLs sort LAST: values come back, like DuckDB/Postgres
    run(
        "SELECT extract(dow FROM DATE '2024-01-07') AS sunday_is_zero, "
        "regexp_replace('a_b_c', '_', '-', 'g') AS all_replaced"
    ).show()

    return {"nations": flags.count()}


if __name__ == "__main__":
    main()
