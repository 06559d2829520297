#!/usr/bin/env python
"""Probe battery wave 27 (round-11): ASOF JOIN — the DuckDB dialect
operator, compiled via the union-window composition. Coverage: backward
inclusive/strict, forward, ASOF LEFT vs inner null-dropping, expression
probes, derived tables on both sides, NULL ordering values (right NULLs
never match; left NULLs match nothing), keyless asof, qualified stars
over the struct-shaped output, aggregation above the join, and the loud
rejections (no/two inequalities, bare star, asof after another join,
non-column right side). Same rubric as waves 4-26.

Usage: python experiments/probe_battery_wave27.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["customer", "orders"]

PROBES = {
    "asof_backward_strict": (
        "SELECT o.o_orderkey, p.o_orderkey AS prev_key FROM orders o "
        "ASOF JOIN orders p ON p.o_custkey = o.o_custkey AND "
        "o.o_orderdate > p.o_orderdate WHERE o.o_orderkey < 60 "
        "ORDER BY o.o_orderkey"
    ),
    "asof_backward_inclusive": (
        "SELECT o.o_orderkey, p.o_orderkey AS prev_key, p.o_orderdate AS "
        "pd FROM orders o ASOF JOIN orders p ON p.o_custkey = "
        "o.o_custkey AND o.o_orderdate >= p.o_orderdate "
        "WHERE o.o_orderkey < 40 ORDER BY o.o_orderkey"
    ),
    "asof_left_keeps_matchless": (
        "SELECT o.o_orderkey, p.o_orderkey AS prev_key FROM orders o "
        "ASOF LEFT JOIN orders p ON p.o_custkey = o.o_custkey AND "
        "o.o_orderdate > p.o_orderdate WHERE o.o_orderkey < 60 "
        "ORDER BY o.o_orderkey"
    ),
    "asof_forward": (
        "SELECT o.o_orderkey, n.o_orderkey AS next_key FROM orders o "
        "ASOF JOIN orders n ON n.o_custkey = o.o_custkey AND "
        "o.o_orderdate < n.o_orderdate WHERE o.o_orderkey < 40 "
        "ORDER BY o.o_orderkey"
    ),
    "asof_expression_probe": (
        "SELECT o.o_orderkey, p.o_orderkey AS prev_key FROM orders o "
        "ASOF LEFT JOIN orders p ON p.o_custkey = o.o_custkey AND "
        "o.o_orderdate - INTERVAL 30 DAY > p.o_orderdate "
        "WHERE o.o_orderkey < 40 ORDER BY o.o_orderkey"
    ),
    "asof_derived_sides": (
        "SELECT e.k, e.ts, px.ts AS pts FROM "
        "(SELECT o_custkey AS k, o_orderkey AS ts FROM orders "
        " WHERE o_orderkey < 200) e "
        "ASOF JOIN (SELECT o_custkey AS k, o_orderkey AS ts FROM orders "
        " WHERE o_orderkey % 3 = 0) px "
        "ON px.k = e.k AND e.ts > px.ts ORDER BY e.k, e.ts"
    ),
    "asof_qualified_stars": (
        "SELECT e.*, px.pts FROM "
        "(SELECT o_orderkey AS id, o_custkey AS k, o_orderkey AS ts "
        " FROM orders WHERE o_orderkey < 150) e "
        "ASOF JOIN (SELECT o_custkey AS k, o_orderkey AS pts FROM orders "
        " WHERE o_orderkey % 2 = 0) px "
        "ON px.k = e.k AND e.ts > px.pts ORDER BY e.id"
    ),
    "asof_agg_above": (
        "SELECT count(*) AS n, CAST(sum(o.o_orderkey - p.o_orderkey) "
        "AS BIGINT) AS gap_sum FROM orders o ASOF JOIN orders p ON "
        "p.o_custkey = o.o_custkey AND o.o_orderkey > p.o_orderkey "
        "WHERE o.o_orderkey < 500"
    ),
    "asof_keyless": (
        "SELECT e.id, px.pts FROM "
        "(SELECT o_orderkey AS id FROM orders WHERE o_orderkey < 20) e "
        "ASOF JOIN (SELECT o_orderkey * 7 AS pts FROM orders "
        " WHERE o_orderkey < 5) px ON e.id >= px.pts ORDER BY e.id"
    ),
    "asof_right_nulls_never_match": (
        "SELECT e.id, px.pts FROM "
        "(SELECT o_orderkey AS id, o_custkey AS k FROM orders "
        " WHERE o_orderkey < 100) e "
        "ASOF LEFT JOIN (SELECT o_custkey AS k, CASE WHEN o_orderkey "
        "% 2 = 0 THEN NULL ELSE o_orderkey END AS pts FROM orders "
        " WHERE o_orderkey < 300) px "
        "ON px.k = e.k AND e.id >= px.pts ORDER BY e.id"
    ),
    "asof_rejects_no_inequality": (
        "SELECT o.o_orderkey FROM orders o ASOF JOIN orders p ON "
        "p.o_custkey = o.o_custkey"
    ),
    "asof_rejects_two_inequalities": (
        "SELECT o.o_orderkey FROM orders o ASOF JOIN orders p ON "
        "o.o_orderdate > p.o_orderdate AND o.o_orderkey > p.o_orderkey"
    ),
    "asof_rejects_bare_star": (
        "SELECT * FROM orders o ASOF JOIN orders p ON p.o_custkey = "
        "o.o_custkey AND o.o_orderdate > p.o_orderdate"
    ),
    "asof_rejects_after_join": (
        "SELECT o.o_orderkey FROM customer c JOIN orders o ON "
        "o.o_custkey = c.c_custkey ASOF JOIN orders p ON p.o_custkey = "
        "o.o_custkey AND o.o_orderdate > p.o_orderdate"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave27.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave27", cpus=8, shuffle_partitions=8)
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
