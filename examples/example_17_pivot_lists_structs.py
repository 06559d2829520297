"""Example 17 — round-11 third-batch SQL surface: PIVOT / UNPIVOT,
the LIST function family over bracket literals, and STRUCT literals
with dot field access.

Everything runs through the NATIVE pipeline (parse_query → parse_relalg
→ compile_plan — spark.sql never sees the text):

1. PIVOT — `FROM t PIVOT (agg FOR key IN (...))`, the spelling Spark
   and DuckDB share. Desugars to ONE hash aggregate over the remaining
   columns with a filtered-CASE aggregate per IN item: single scan,
   map-side partials, no second value-discovery pass;
2. UNPIVOT — columns → (name, value) rows via a single-scan index
   explode + CASE pickers (never a re-scan per column); NULL values
   excluded by default, kept under INCLUDE NULLS;
3. LIST functions — bracket literals, list_sort (NULLS LAST on both
   engines), list_contains found-element-wins NULL semantics, the
   NULL-seeded list_sum fold, arrays as GROUP BY keys;
4. STRUCT literals — {'a': x} → named_struct, dot field access in all
   three spellings, struct comparisons.
"""

from __future__ import annotations


def main(spark=None, sf_dir=None):
    from _shared import bootstrap

    spark, sf_dir, _tables = bootstrap(spark, sf_dir)
    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query

    cat = load_tables(spark, sf_dir, ["nation", "orders"])
    schema = {t: list(cat[t].columns) for t in cat}

    def run(sql: str):
        return compile_plan(
            parse_relalg(parse_query(sql, schema=schema)), spark, cat
        )

    print("===== 1. PIVOT: order counts per priority x status =====\n")
    piv = run(
        "SELECT o_orderpriority, CAST(o AS BIGINT) AS open_cnt, "
        "CAST(f AS BIGINT) AS done_cnt "
        "FROM (SELECT o_orderpriority, o_orderstatus, o_orderkey "
        "      FROM orders) "
        "PIVOT (count(o_orderkey) FOR o_orderstatus IN ('O' AS o, 'F' AS f)) "
        "ORDER BY o_orderpriority"
    )
    piv.show()
    plan = piv._jdf.queryExecution().executedPlan().toString()
    print("single scan:", plan.count("FileScan") == 1)
    print("no per-item union:", "Union" not in plan)

    print("===== 2. UNPIVOT back to (metric, value) rows =====\n")
    run(
        "SELECT * FROM (SELECT n_nationkey AS id, n_regionkey AS region, "
        "n_nationkey * 2 AS doubled FROM nation) "
        "UNPIVOT (v FOR metric IN (region, doubled)) "
        "ORDER BY id, metric LIMIT 8"
    ).show()

    print("===== 3. LIST functions over bracket literals =====\n")
    run(
        "SELECT n_nationkey, "
        "array_to_string(list_sort([n_regionkey, 3, 1, NULL]), ',') AS srt, "
        "CAST(list_contains([1, NULL], n_regionkey) AS STRING) AS has_r, "
        "CAST(list_sum([n_nationkey, NULL, 2]) AS BIGINT) AS lsum "
        "FROM nation ORDER BY n_nationkey LIMIT 6"
    ).show()

    print("===== 4. arrays as GROUP BY keys =====\n")
    run(
        "SELECT CAST([n_regionkey] AS STRING) AS k, count(*) AS n "
        "FROM nation GROUP BY [n_regionkey] ORDER BY k"
    ).show()

    print("===== 5. STRUCT literals and field access =====\n")
    run(
        "SELECT n_nationkey, ({'a': n_regionkey, 'b': n_name}).a AS a, "
        "({'o': {'i': n_regionkey * 2}}).o.i AS nested, "
        "struct_extract({'k': n_name}, 'k') AS nm "
        "FROM nation "
        "WHERE {'s': n_regionkey, 't': n_nationkey} < {'s': 4, 't': 99} "
        "ORDER BY n_nationkey LIMIT 6"
    ).show()

    print("===== 6. ASOF JOIN (union-window, one shuffle) =====\n")
    asof = run(
        "SELECT o.o_orderkey, CAST(p.o_orderkey AS STRING) AS prev_key "
        "FROM orders o ASOF LEFT JOIN orders p ON p.o_custkey = "
        "o.o_custkey AND o.o_orderdate > p.o_orderdate "
        "WHERE o.o_orderkey < 30 ORDER BY o.o_orderkey"
    )
    asof.show(8)
    plan = asof._jdf.queryExecution().executedPlan().toString()
    print("no nested loop:", "BroadcastNestedLoopJoin" not in plan)

    print("===== 7. FROM-first, * REPLACE, COLUMNS =====\n")
    run(
        "FROM nation SELECT * REPLACE (n_regionkey * 10 AS n_regionkey) "
        "WHERE n_nationkey < 4 ORDER BY ALL"
    ).show()
    run(
        "SELECT columns('key') FROM nation WHERE n_nationkey < 4 "
        "ORDER BY ALL"
    ).show()

    print("example 17 done")
    return {"pivot_rows": piv.count()}


if __name__ == "__main__":
    main()
