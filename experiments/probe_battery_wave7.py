#!/usr/bin/env python
"""Probe battery wave 7 (round-10): join output semantics, set-operation
type coercion, ordinal references, scope corner cases, and the
`* EXCLUDE` closure. Same rubric as waves 4-6.

Usage: python experiments/probe_battery_wave7.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation", "region", "customer", "orders"]

PROBES = {
    "star_exclude": (
        "SELECT * EXCLUDE (n_name) FROM nation ORDER BY n_nationkey"
    ),
    "star_exclude_multi_where": (
        "SELECT * EXCLUDE (n_name, n_regionkey) FROM nation "
        "WHERE n_regionkey = 2 ORDER BY n_nationkey"
    ),
    # USING coalesces the join column into ONE output column
    "inner_using_output": (
        "SELECT * FROM (SELECT n_regionkey, n_name FROM nation) a "
        "JOIN (SELECT r_regionkey AS n_regionkey, r_name FROM region) b "
        "USING (n_regionkey) ORDER BY n_name"
    ),
    "full_outer_using_coalesced": (
        "SELECT n_regionkey, count(*) AS c FROM "
        "(SELECT n_regionkey FROM nation WHERE n_regionkey < 3) a "
        "FULL OUTER JOIN (SELECT r_regionkey AS n_regionkey FROM region "
        "WHERE r_regionkey > 1) b USING (n_regionkey) "
        "GROUP BY n_regionkey ORDER BY n_regionkey"
    ),
    "natural_join_dedup_cols": (
        "SELECT * FROM (SELECT n_regionkey FROM nation WHERE n_nationkey < 5) x "
        "NATURAL JOIN (SELECT r_regionkey AS n_regionkey FROM region) y "
        "ORDER BY n_regionkey"
    ),
    # set-operation type coercion: INT union DOUBLE / INT union literal
    "union_type_coercion": (
        "SELECT n_regionkey AS v FROM nation WHERE n_nationkey < 3 "
        "UNION ALL SELECT 2.5 ORDER BY v"
    ),
    "values_type_unification": (
        "SELECT v FROM (VALUES (1), (2.5), (3)) AS t(v) ORDER BY v"
    ),
    # ordinal references
    "order_by_ordinal": (
        "SELECT n_name, n_regionkey FROM nation ORDER BY 2 DESC, 1"
    ),
    "group_by_ordinal": (
        "SELECT n_regionkey, count(*) AS c FROM nation GROUP BY 1 ORDER BY 1"
    ),
    # HAVING referencing a select ALIAS (DuckDB allows, Postgres rejects)
    "having_select_alias": (
        "SELECT n_regionkey, count(*) AS c FROM nation "
        "GROUP BY n_regionkey HAVING c > 4 ORDER BY n_regionkey"
    ),
    # scalar subquery in a CASE condition (not result)
    "scalar_in_case_condition": (
        "SELECT n_name, CASE WHEN n_regionkey = (SELECT min(r_regionkey) + 1 "
        "FROM region) THEN 'x' ELSE 'y' END AS f FROM nation ORDER BY n_name"
    ),
    # nested derived tables 3 deep with filters at each level
    "derived_three_deep": (
        "SELECT k FROM (SELECT k + 1 AS k FROM (SELECT n_regionkey AS k "
        "FROM (SELECT * FROM nation WHERE n_nationkey > 2) z "
        "WHERE n_regionkey < 4) y WHERE k > 0) x ORDER BY k"
    ),
    # correlated EXISTS inside a derived table of the outer FROM
    "exists_in_derived": (
        "SELECT d.n_name FROM (SELECT n.n_name, n.n_regionkey FROM nation n "
        "WHERE EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = "
        "n.n_regionkey AND r.r_name LIKE 'A%')) d ORDER BY d.n_name"
    ),
    # division result types: int/int
    "int_division_type": (
        "SELECT n_nationkey, n_nationkey / 4 AS d FROM nation ORDER BY n_nationkey"
    ),
    # BETWEEN over strings
    "between_strings": (
        "SELECT n_name FROM nation WHERE n_name BETWEEN 'NATION_1' AND "
        "'NATION_3' ORDER BY n_name"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave7.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave7", cpus=8, shuffle_partitions=8)
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
            got = compile_plan(
                parse_relalg(parse_query(sql, schema=schema)), spark, cat
            ).collect()
        except Exception as exc:
            kind = type(exc).__name__
            outcome = (
                "REJECT" if kind in ("UnsupportedSqlError", "ParserError") else "ERROR"
            )
            results[name] = {"outcome": outcome, "detail": f"{kind}: {str(exc)[:200]}"}
            print(f"{outcome} {name}: {kind}: {str(exc)[:120]}")
            continue
        norm = lambda rows: sorted(map(repr, (tuple(r) for r in rows)))
        if norm(got) == norm(want):
            results[name] = {"outcome": "PASS", "rows": len(got)}
            print(f"PASS {name} ({len(got)} rows)")
        else:
            diffs = [(g, w) for g, w in zip(norm(got), norm(want)) if g != w][:3]
            results[name] = {"outcome": "DIVERGE", "first_diffs": diffs}
            print(f"DIVERGE {name}: {diffs[:1]}")
    counts = {}
    for r in results.values():
        counts[r["outcome"]] = counts.get(r["outcome"], 0) + 1
    with open(out, "w") as f:
        json.dump({"counts": counts, "probes": results}, f, indent=2)
    print("wrote", out, counts)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
