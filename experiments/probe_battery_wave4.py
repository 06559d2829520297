#!/usr/bin/env python
"""Probe battery wave 4 (round-10, verdict item 3). Exotic-but-DuckDB-valid
shapes run through the NATIVE path (parse_query -> parse_relalg ->
compile_plan) and compared against DuckDB on identical text at sf0.01.

Outcomes per probe: PASS (results match), REJECT (loud UnsupportedSqlError/
ParserError — acceptable when documented), DIVERGE (both run, different
rows — always a bug), ERROR (crash past the parser — always a bug).

Usage: python experiments/probe_battery_wave4.py [--out=...]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation", "region", "customer", "orders", "supplier", "lineitem"]

PROBES = {
    # --- FILTER on aggregates used as WINDOW functions ---
    "window_agg_filter": (
        "SELECT n_name, count(*) FILTER (WHERE n_regionkey > 1) "
        "OVER (PARTITION BY n_regionkey) AS c FROM nation ORDER BY n_name"
    ),
    # --- NULLS FIRST/LAST inside window ORDER BY ---
    "window_nulls_last": (
        "SELECT o_orderkey, row_number() OVER (PARTITION BY o_orderstatus "
        "ORDER BY o_orderdate DESC NULLS LAST, o_orderkey) AS rn "
        "FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey"
    ),
    "window_nulls_first_expr": (
        "SELECT o_orderkey, rank() OVER (ORDER BY (CASE WHEN o_totalprice > 200000 "
        "THEN NULL ELSE o_totalprice END) ASC NULLS FIRST, o_orderkey) AS r "
        "FROM orders WHERE o_orderkey < 120 ORDER BY o_orderkey"
    ),
    # --- DISTINCT aggregate in window position (DuckDB executes) ---
    "window_distinct_agg": (
        "SELECT n_name, count(DISTINCT n_regionkey) OVER () AS d "
        "FROM nation ORDER BY n_name"
    ),
    # --- correlated EXISTS in SELECT position (round-10 surface) ---
    "select_corr_exists_agg_outer": (
        # qualified correlation keys (the documented rule; a bare outer
        # ref inside the subquery text stays a loud analysis failure)
        "SELECT n.n_regionkey, count(*) AS n, "
        "CASE WHEN EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey "
        "AND r.r_name LIKE 'A%') THEN 1 ELSE 0 END AS flag "
        "FROM nation n GROUP BY n.n_regionkey ORDER BY n.n_regionkey"
    ),
    "select_exists_of_exists": (
        "SELECT n.n_name, CASE WHEN EXISTS (SELECT 1 FROM customer c WHERE "
        "c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9500) AND EXISTS "
        "(SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey) "
        "THEN 1 ELSE 0 END AS both_f FROM nation n ORDER BY n.n_name"
    ),
    # --- GROUPING SETS x HAVING x grouping() interplay ---
    "grouping_sets_having_marker": (
        "SELECT n_regionkey, n_name, count(*) AS c, grouping(n_name) AS g "
        "FROM nation GROUP BY GROUPING SETS ((n_regionkey), (n_regionkey, n_name)) "
        "HAVING grouping(n_name) = 1 OR count(*) > 0 "
        "ORDER BY n_regionkey, n_name NULLS FIRST"
    ),
    "rollup_having_grouping_mix": (
        "SELECT o_orderstatus, o_orderpriority, count(*) AS c "
        "FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority) "
        "HAVING grouping(o_orderpriority) = 1 AND count(*) > 10 "
        "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"
    ),
    # --- recursive CTE referencing an OUTER (earlier) CTE ---
    "recursive_refs_outer_cte": (
        "WITH RECURSIVE lim(m) AS (SELECT 4), "
        "seq(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM seq, lim WHERE n < m) "
        "SELECT n FROM seq ORDER BY n"
    ),
    "recursive_after_plain_cte": (
        "WITH RECURSIVE base(k) AS (SELECT 0 UNION ALL SELECT 1), "
        "walk(n) AS (SELECT k FROM base UNION SELECT n + 2 FROM walk WHERE n < 8) "
        "SELECT n FROM walk ORDER BY n"
    ),
    # --- misc wave-4 extras ---
    "in_call_order_inside_case": (
        "SELECT CASE WHEN n_regionkey > 1 THEN string_agg(n_name, ',' ORDER BY n_name) "
        "ELSE 'few' END AS agg FROM nation GROUP BY n_regionkey ORDER BY agg"
    ),
    "exists_in_order_by": (
        "SELECT n_name FROM nation n ORDER BY "
        "EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey "
        "AND c.c_acctbal > 9500) DESC, n_name"
    ),
    "exists_in_group_by": (
        "SELECT EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey "
        "AND c.c_acctbal > 9500) AS has_rich, count(*) AS c "
        "FROM nation n GROUP BY has_rich ORDER BY has_rich"
    ),
    "case_in_having": (
        "SELECT n_regionkey, count(*) AS c FROM nation GROUP BY n_regionkey "
        "HAVING CASE WHEN n_regionkey IN (SELECT r_regionkey FROM region "
        "WHERE r_name LIKE 'A%') THEN count(*) > 3 ELSE count(*) > 4 END "
        "ORDER BY n_regionkey"
    ),
    "qualify_clause": (
        "SELECT n_name, n_regionkey FROM nation "
        "QUALIFY row_number() OVER (PARTITION BY n_regionkey ORDER BY n_name) = 1 "
        "ORDER BY n_name"
    ),
    "window_filter_distinct_combo": (
        "SELECT o_orderstatus, count(DISTINCT o_custkey) "
        "FILTER (WHERE o_totalprice > 100000) OVER (PARTITION BY o_orderstatus) AS d "
        "FROM orders WHERE o_orderkey < 400 ORDER BY o_orderstatus, d"
    ),
    "case_result_predicate": (
        "SELECT n_name, CASE WHEN n_regionkey > 2 THEN n_nationkey > 10 "
        "ELSE n_nationkey < 5 END AS f FROM nation ORDER BY n_name"
    ),
    "window_over_membership_bool": (
        # the probe operand must be OUTER-QUALIFIED (the documented rule —
        # a bare operand transplanted into the count subquery could
        # capture an inner binding and rejects loudly)
        "SELECT n.n_name, sum(CASE WHEN n.n_regionkey IN (SELECT r_regionkey FROM region "
        "WHERE r_name LIKE 'A%') THEN 1 ELSE 0 END) OVER (ORDER BY n.n_name "
        "ROWS UNBOUNDED PRECEDING) AS running FROM nation n ORDER BY n.n_name"
    ),
    "lateral_with_exists": (
        "SELECT n.n_name, l.cnt FROM nation n, LATERAL (SELECT count(*) AS cnt "
        "FROM customer c WHERE c.c_nationkey = n.n_nationkey) l "
        "WHERE EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey) "
        "ORDER BY n.n_name"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave4.json"
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out = a.split("=")[1]

    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave4", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    cat = load_tables(spark, SF, TABLES)
    schema = {t: cat[t].columns for t in TABLES}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    results = {}
    for name, sql in PROBES.items():
        try:
            want = con.execute(sql).fetchall()
        except Exception as exc:
            results[name] = {"outcome": "ORACLE_INVALID", "detail": str(exc)[:200]}
            print(f"ORACLE_INVALID {name}: {str(exc)[:120]}")
            continue
        try:
            got = compile_plan(parse_relalg(parse_query(sql, schema=schema)), spark, cat).collect()
        except Exception as exc:
            kind = type(exc).__name__
            outcome = (
                "REJECT"
                if kind in ("UnsupportedSqlError", "ParserError")
                else "ERROR"
            )
            results[name] = {"outcome": outcome, "detail": f"{kind}: {str(exc)[:200]}"}
            print(f"{outcome} {name}: {kind}: {str(exc)[:120]}")
            continue
        norm = lambda rows: sorted(map(repr, (tuple(r) for r in rows)))
        if norm(got) == norm(want):
            results[name] = {"outcome": "PASS", "rows": len(got)}
            print(f"PASS {name} ({len(got)} rows)")
        else:
            results[name] = {
                "outcome": "DIVERGE",
                "got": norm(got)[:3],
                "want": norm(want)[:3],
            }
            print(f"DIVERGE {name}")
    counts = {}
    for r in results.values():
        counts[r["outcome"]] = counts.get(r["outcome"], 0) + 1
    summary = {"counts": counts, "probes": results}
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print("wrote", out, counts)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
