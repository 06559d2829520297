#!/usr/bin/env python
"""Probe battery wave 22 (round-11): THREE-VALUED LOGIC and boolean
expression edges — parenthesized predicates in EXPRESSION position
(`(a AND b) AS f`, `(x IN (...)) IS NULL`, IS DISTINCT pairs over NULL),
bare-NULL CASE conditions (VOID-typed on Spark), NULL propagation
through NOT/IN lists, boolean sorting, ORDER BY constants. Same rubric
as waves 4-21.

Usage: python experiments/probe_battery_wave22.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation"]

PROBES = {
    "paren_bool_expr_select": (
        "SELECT (NULL AND FALSE) AS a, (NULL OR TRUE) AS b, "
        "(NULL AND TRUE) IS NULL AS c FROM nation WHERE n_nationkey = 0"
    ),
    "paren_in_is_null": (
        "SELECT (NULL IN (1, 2)) IS NULL AS a, "
        "(3 IN (1, NULL)) IS NULL AS b, (1 IN (1, NULL)) AS c "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "is_distinct_null_pairs": (
        "SELECT (NULL IS DISTINCT FROM NULL) AS a, "
        "(NULL IS NOT DISTINCT FROM NULL) AS b, "
        "(1 IS DISTINCT FROM NULL) AS c FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "case_bare_null_condition": (
        "SELECT CASE NULL WHEN NULL THEN 'eq' ELSE 'ne' END AS a, "
        "CASE WHEN NULL THEN 'y' ELSE 'n' END AS b FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "not_of_null_comparison": (
        "SELECT count(*) AS c FROM nation WHERE NOT (n_regionkey = NULL)"
    ),
    "not_in_list_with_null": (
        "SELECT count(*) AS c FROM nation WHERE n_regionkey NOT IN (1, NULL)"
    ),
    "coalesce_chain": (
        "SELECT coalesce(NULL, NULL, n_regionkey, 99) AS v FROM nation "
        "ORDER BY n_nationkey LIMIT 5"
    ),
    "boolean_column_sort": (
        "SELECT n_nationkey, n_regionkey > 2 AS f FROM nation "
        "ORDER BY f, n_nationkey LIMIT 8"
    ),
    "order_by_constant": (
        "SELECT n_nationkey FROM nation ORDER BY 'x', n_nationkey LIMIT 5"
    ),
    "nullif_self_is_null": (
        "SELECT nullif(n_regionkey, n_regionkey) AS z FROM nation "
        "WHERE n_nationkey < 3 ORDER BY n_nationkey"
    ),
    "paren_arithmetic_unchanged": (
        "SELECT (n_nationkey + 1) * 2 AS v FROM nation "
        "WHERE n_nationkey < 3 ORDER BY v"
    ),
    "bool_expr_in_group_by": (
        "SELECT n_regionkey > 2 AS big, count(*) AS n FROM nation "
        "GROUP BY n_regionkey > 2 ORDER BY big NULLS LAST"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave22.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave22", cpus=8, shuffle_partitions=8)
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
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    bad = [n for n, r in results.items() if r["outcome"] in ("DIVERGE", "ERROR")]
    print(f"\n{len(results)} probes; diverge/error: {bad}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
