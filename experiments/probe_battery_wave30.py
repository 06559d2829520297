#!/usr/bin/env python
"""Probe battery wave 30 (round-11): CROSS-FEATURE COMPOSITION — the
round's new operators combined with each other and with the existing
surface, where integration bugs live: PIVOT over a CTE, UNPIVOT
feeding a window, ASOF over a pivot output, pivot of an asof output,
struct arrays with subscript-then-field access, lists of structs,
list functions inside join conditions, FROM-first + pivot, dialect
expansions under set operations, asof + QUALIFY, pivot + grouping
above, structs through UNION. Same rubric as waves 4-29.

Usage: python experiments/probe_battery_wave30.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation", "orders", "region"]

PROBES = {
    "pivot_over_cte": (
        "WITH src AS (SELECT o_orderpriority, o_orderstatus, o_orderkey "
        "FROM orders WHERE o_orderkey < 5000) "
        "SELECT o_orderpriority, CAST(o AS BIGINT) AS o FROM ("
        "SELECT * FROM (SELECT * FROM src) "
        "PIVOT (count(o_orderkey) FOR o_orderstatus IN ('O' AS o))) "
        "ORDER BY o_orderpriority"
    ),
    "unpivot_feeding_window": (
        "SELECT id, k, v, CAST(sum(v) OVER (PARTITION BY k ORDER BY id) "
        "AS BIGINT) AS running FROM ("
        "SELECT * FROM (SELECT n_nationkey AS id, n_regionkey AS a, "
        "n_nationkey * 3 AS b FROM nation) "
        "UNPIVOT (v FOR k IN (a, b))) "
        "ORDER BY k, id LIMIT 12"
    ),
    "asof_over_pivot_output": (
        "SELECT e.id, CAST(px.o AS STRING) AS o_cnt FROM "
        "(SELECT o_orderkey AS id, o_custkey AS k FROM orders "
        " WHERE o_orderkey < 100) e "
        "ASOF LEFT JOIN (SELECT * FROM (SELECT o_custkey, o_orderstatus, "
        "o_orderkey FROM orders) PIVOT (max(o_orderkey) FOR "
        "o_orderstatus IN ('O' AS o))) px "
        "ON px.o_custkey = e.k AND e.id >= px.o "
        "ORDER BY e.id"
    ),
    "pivot_of_unpivot_roundtrip_cte": (
        "WITH base AS (SELECT n_nationkey AS id, n_regionkey AS a, "
        "n_nationkey + 10 AS b FROM nation WHERE n_nationkey < 4) "
        "SELECT * FROM (SELECT * FROM base) "
        "UNPIVOT (v FOR k IN (a, b)) "
        "PIVOT (sum(v) FOR k IN ('a' AS a2, 'b' AS b2)) "
        "ORDER BY id"
    ),
    "struct_array_subscript_field": (
        "SELECT ([{'a': n_nationkey}, {'a': n_regionkey}])[2].a AS v "
        "FROM nation WHERE n_nationkey < 3 ORDER BY v"
    ),
    "list_of_structs_in_case": (
        "SELECT CASE WHEN n_regionkey > 2 THEN [{'x': 1}] "
        "ELSE [{'x': 0}] END[1].x AS v FROM nation "
        "WHERE n_nationkey < 4 ORDER BY n_nationkey"
    ),
    "list_fn_in_join_condition": (
        "SELECT n.n_nationkey, r.r_regionkey FROM nation n "
        "JOIN region r ON list_contains([0, 1, n.n_regionkey], "
        "r.r_regionkey) AND r.r_regionkey = n.n_regionkey "
        "ORDER BY n.n_nationkey"
    ),
    "from_first_pivot": (
        "FROM (SELECT n_regionkey, n_nationkey FROM nation) "
        "PIVOT (count(n_nationkey) FOR n_regionkey IN (0 AS r0, 1 AS r1)) "
        "SELECT CAST(r0 AS BIGINT) AS r0, CAST(r1 AS BIGINT) AS r1"
    ),
    "columns_under_union": (
        "SELECT columns('key') FROM nation WHERE n_nationkey < 2 "
        "UNION ALL SELECT columns('key') FROM nation "
        "WHERE n_nationkey BETWEEN 5 AND 6 ORDER BY 1, 2"
    ),
    "asof_then_qualify": (
        "SELECT o.o_orderkey, CAST(p.o_orderkey AS STRING) AS prev_key "
        "FROM orders o ASOF JOIN orders p ON p.o_custkey = o.o_custkey "
        "AND o.o_orderdate > p.o_orderdate "
        "QUALIFY row_number() OVER (PARTITION BY o.o_custkey "
        "ORDER BY o.o_orderkey) = 1 "
        "ORDER BY o.o_orderkey LIMIT 10"
    ),
    "grouping_above_pivot": (
        "SELECT CAST(sum(o) AS BIGINT) AS total_open FROM ("
        "SELECT CAST(o AS DOUBLE) AS o FROM ("
        "SELECT * FROM (SELECT o_orderpriority, o_orderstatus, "
        "o_orderkey FROM orders) PIVOT (count(o_orderkey) FOR "
        "o_orderstatus IN ('O' AS o))))"
    ),
    "structs_through_union": (
        "SELECT s.a AS a FROM (SELECT {'a': n_nationkey} AS s FROM "
        "nation WHERE n_nationkey < 2 UNION ALL "
        "SELECT {'a': n_nationkey + 100} FROM nation "
        "WHERE n_nationkey < 2) t ORDER BY a"
    ),
    "list_sum_of_unpivot_group": (
        "SELECT k, CAST(list_sum(list_sort(array_agg(v))) AS BIGINT) "
        "AS s FROM (SELECT * FROM (SELECT n_nationkey AS id, "
        "n_regionkey AS a, n_nationkey AS b FROM nation) "
        "UNPIVOT (v FOR k IN (a, b))) GROUP BY k ORDER BY k"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave30.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave30", cpus=8, shuffle_partitions=8)
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
