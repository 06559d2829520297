#!/usr/bin/env python
"""Probe battery wave 5 (round-10): ENGINE-PARITY traps — places where
Spark and DuckDB could silently disagree on identical ANSI-looking text
(date-part numbering, arithmetic edge semantics, window frames, scoping
rules) — plus syntax families no earlier wave exercised. Same outcome
rubric as wave 4 (PASS / REJECT / DIVERGE / ERROR / ORACLE_INVALID);
DIVERGE on a shape the engine EXECUTES is always a bug to fix or a
divergence to document loudly.

Usage: python experiments/probe_battery_wave5.py [--out=...]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation", "region", "customer", "orders", "supplier"]

PROBES = {
    # --- date-part numbering parity ---
    "extract_dow": (
        "SELECT o_orderkey, extract(dow FROM o_orderdate) AS d "
        "FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey"
    ),
    "extract_doy_epoch": (
        "SELECT o_orderkey, extract(doy FROM o_orderdate) AS dy, "
        "CAST(extract(epoch FROM o_orderdate) AS BIGINT) AS ep "
        "FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey"
    ),
    "extract_week_quarter": (
        "SELECT o_orderkey, extract(week FROM o_orderdate) AS w, "
        "extract(quarter FROM o_orderdate) AS q "
        "FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey"
    ),
    # --- arithmetic edge semantics ---
    "negative_modulo": (
        "SELECT n_nationkey, (n_nationkey - 12) % 5 AS m, "
        "(12 - n_nationkey) % -5 AS m2 FROM nation ORDER BY n_nationkey"
    ),
    "half_rounding": (
        "SELECT n_nationkey, round(n_nationkey + 0.5) AS r, "
        "round(-(n_nationkey + 0.5)) AS rn FROM nation ORDER BY n_nationkey"
    ),
    "integer_division": (
        "SELECT n_nationkey, CAST(n_nationkey / 4 AS DOUBLE) AS d, "
        "CAST(n_nationkey AS INT) / CAST(4 AS INT) AS d2 "
        "FROM nation ORDER BY n_nationkey"
    ),
    "date_plus_int": (
        "SELECT o_orderkey, CAST(o_orderdate AS DATE) + 5 AS d5 "
        "FROM orders WHERE o_orderkey < 50 ORDER BY o_orderkey"
    ),
    # --- window frames ---
    "range_frame_numeric": (
        # round() before the cast: CAST(double AS BIGINT) truncates in Spark
        # and rounds in DuckDB - a documented engine divergence, not ours
        "SELECT o_orderkey, CAST(round(sum(o_totalprice) OVER (ORDER BY o_orderkey "
        "RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)) AS BIGINT) AS s "
        "FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey"
    ),
    "rows_frame_following": (
        "SELECT o_orderkey, CAST(round(avg(o_totalprice) OVER (PARTITION BY o_orderstatus "
        "ORDER BY o_orderkey ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING)) AS BIGINT) AS a "
        "FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey"
    ),
    # --- named-window inheritance (WINDOW w2 AS (w1 ORDER BY ...)) ---
    "window_inheritance": (
        "SELECT n_name, rank() OVER w2 AS r FROM nation "
        "WINDOW w1 AS (PARTITION BY n_regionkey), "
        "w2 AS (w1 ORDER BY n_name) ORDER BY n_name"
    ),
    # --- scoping ---
    "nested_cte_shadowing": (
        "WITH x AS (SELECT 1 AS v), "
        "y AS (SELECT v + 10 AS v FROM (SELECT 2 AS v) x) "
        "SELECT x.v AS xv, y.v AS yv FROM x, y"
    ),
    "correlated_scalar_in_having": (
        # correlation keys must be qualified (the documented rule; a bare
        # outer ref in expression-embedded subquery text fails loudly)
        "SELECT c.c_nationkey, count(*) AS c FROM customer c "
        "GROUP BY c.c_nationkey HAVING count(*) > "
        "(SELECT count(*) FROM supplier s WHERE s.s_nationkey = c.c_nationkey) "
        "ORDER BY c.c_nationkey"
    ),
    # --- keyword-form calls / string functions ---
    "overlay_call": (
        # DuckDB has no overlay(); exercise the keyword-form call on a
        # function both engines share via POSITION instead
        "SELECT n_name, position('A' IN n_name) AS p "
        "FROM nation ORDER BY n_name"
    ),
    "trim_variants": (
        "SELECT trim(BOTH 'A' FROM n_name) AS t1, "
        "trim(LEADING 'A' FROM n_name) AS t2, "
        "trim(TRAILING 'A' FROM n_name) AS t3 FROM nation ORDER BY n_name"
    ),
    "substring_negative_start": (
        "SELECT n_name, substring(n_name FROM 2 FOR 3) AS s1 "
        "FROM nation ORDER BY n_name"
    ),
    "split_part_fn": (
        "SELECT n_name, split_part(n_name, '_', 1) AS p1, "
        "split_part(n_name, '_', 2) AS p2 FROM nation ORDER BY n_name"
    ),
    # --- DISTINCT ON ordering subtleties ---
    "distinct_on_extra_order": (
        "SELECT DISTINCT ON (c_nationkey) c_nationkey, c_name, c_acctbal "
        "FROM customer ORDER BY c_nationkey, c_acctbal DESC, c_custkey"
    ),
    # --- set ops with parenthesized operands and ORDER inside ---
    "paren_set_operand_order": (
        "(SELECT n_name FROM nation WHERE n_regionkey = 0) "
        "UNION ALL "
        "(SELECT n_name FROM nation WHERE n_regionkey = 1) "
        "ORDER BY n_name"
    ),
    # --- GROUPING SETS with expression keys ---
    "grouping_sets_expr_keys": (
        "SELECT n_regionkey % 2 AS parity, n_regionkey, count(*) AS c "
        "FROM nation GROUP BY GROUPING SETS ((n_regionkey % 2), "
        "(n_regionkey % 2, n_regionkey)) "
        "ORDER BY parity, n_regionkey NULLS FIRST"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave5.json"
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out = a.split("=")[1]

    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave5", cpus=8, shuffle_partitions=8)
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
            diffs = [
                (g, w) for g, w in zip(norm(got), norm(want)) if g != w
            ][:3]
            results[name] = {"outcome": "DIVERGE", "first_diffs": diffs,
                             "rows": (len(got), len(want))}
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
