#!/usr/bin/env python
"""Probe battery wave 18 (round-11): TYPE COERCION at set operations,
comparisons, and CASE — int/double union columns, string/number
comparison casts, NULL-typed columns through set ops, CASE branch type
unification, IN-list mixed types, implicit cast direction in joins, and
division/modulo type results. Same rubric as waves 4-17.

Usage: python experiments/probe_battery_wave18.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation", "customer"]

PROBES = {
    "union_int_double": (
        "SELECT x FROM (SELECT n_nationkey AS x FROM nation "
        "UNION ALL SELECT 1.5 AS x) u ORDER BY x"
    ),
    "union_null_column": (
        "SELECT x FROM (SELECT NULL AS x FROM nation WHERE n_nationkey=0 "
        "UNION ALL SELECT n_nationkey AS x FROM nation) u "
        "ORDER BY x NULLS LAST"
    ),
    "intersect_int_vs_double_values": (
        "SELECT x FROM (SELECT n_regionkey AS x FROM nation "
        "INTERSECT SELECT 2.0 AS x) u"
    ),
    "case_branch_unification": (
        "SELECT n_nationkey, CASE WHEN n_regionkey = 0 THEN 1 "
        "WHEN n_regionkey = 1 THEN 2.5 ELSE 3 END AS v "
        "FROM nation ORDER BY n_nationkey"
    ),
    "in_list_mixed_numeric": (
        "SELECT count(*) AS c FROM nation WHERE n_regionkey IN (1, 2.0)"
    ),
    "string_number_compare": (
        "SELECT count(*) AS c FROM nation WHERE n_nationkey = '7'"
    ),
    "string_number_in_list": (
        "SELECT count(*) AS c FROM nation WHERE n_nationkey IN ('3', '5')"
    ),
    "concat_int_string_operator": (
        "SELECT n_nationkey || '-' || n_regionkey AS tag FROM nation "
        "WHERE n_nationkey < 5 ORDER BY tag"
    ),
    "nullif_typing": (
        "SELECT nullif(n_regionkey, 2) AS a, "
        "coalesce(nullif(n_regionkey, 0), -1) AS b "
        "FROM nation ORDER BY n_nationkey LIMIT 8"
    ),
    "division_result_type": (
        "SELECT n_nationkey, round(n_nationkey / 4, 4) AS q "
        "FROM nation WHERE n_nationkey < 8 ORDER BY n_nationkey"
    ),
    "except_after_coercion": (
        "SELECT x FROM (SELECT n_regionkey AS x FROM nation "
        "EXCEPT SELECT 0.0 AS x) u ORDER BY x"
    ),
    "greatest_mixed_numeric": (
        "SELECT greatest(n_regionkey, 1.5) AS g FROM nation "
        "WHERE n_nationkey < 5 ORDER BY g, n_nationkey"
    ),
    "between_mixed_types": (
        "SELECT count(*) AS c FROM nation "
        "WHERE n_nationkey BETWEEN 1.5 AND '8'"
    ),
    "abs_negative_literal_type": (
        "SELECT abs(-5) AS a, abs(-5.5) AS b, -abs(3) AS c "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "boolean_to_int_cast": (
        "SELECT CAST(n_regionkey > 2 AS INT) AS f FROM nation "
        "ORDER BY n_nationkey LIMIT 8"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave18.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave18", cpus=8, shuffle_partitions=8)
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
