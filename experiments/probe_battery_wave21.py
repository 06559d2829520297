#!/usr/bin/env python
"""Probe battery wave 21 (round-11): WINDOWS OVER AGGREGATES — window
functions whose arguments are aggregate calls (running totals of
grouped counts, percent-of-total, rank-of-aggregate), and WINDOW CALLS
IN ORDER BY keys (which Spark's Sort operator rejects outright —
desugared to helper select items at parse time). Plus the DECIMAL-
literal typing trap through `*` chains. Same rubric as waves 4-20.

Usage: python experiments/probe_battery_wave21.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation", "customer", "orders"]

PROBES = {
    "window_over_agg_running": (
        "SELECT c_nationkey, count(*) AS n, CAST(sum(count(*)) OVER "
        "(ORDER BY c_nationkey) AS BIGINT) AS running FROM customer "
        "GROUP BY c_nationkey ORDER BY c_nationkey"
    ),
    "window_over_agg_partition": (
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n, "
        "CAST(sum(count(*)) OVER (PARTITION BY o_orderstatus) AS BIGINT) "
        "AS st_total FROM orders GROUP BY o_orderstatus, o_orderpriority "
        "ORDER BY o_orderstatus, o_orderpriority"
    ),
    "pct_of_total": (
        "SELECT c_nationkey, round(100.0 * count(*) / sum(count(*)) "
        "OVER (), 4) AS pct FROM customer GROUP BY c_nationkey "
        "ORDER BY c_nationkey"
    ),
    "rank_of_agg": (
        "SELECT c_nationkey, count(*) AS n, rank() OVER (ORDER BY "
        "count(*) DESC, c_nationkey) AS r FROM customer "
        "GROUP BY c_nationkey ORDER BY c_nationkey"
    ),
    "orderby_window_plain": (
        "SELECT n_name FROM nation ORDER BY row_number() OVER "
        "(ORDER BY n_regionkey, n_nationkey) DESC LIMIT 3"
    ),
    "orderby_window_agg": (
        "SELECT c_nationkey, CAST(sum(c_acctbal) AS BIGINT) AS tot "
        "FROM customer GROUP BY c_nationkey ORDER BY rank() OVER "
        "(ORDER BY sum(c_acctbal) DESC), c_nationkey LIMIT 5"
    ),
    "orderby_window_star": (
        "SELECT * FROM nation ORDER BY row_number() OVER "
        "(ORDER BY n_name DESC) LIMIT 4"
    ),
    "orderby_window_mixed_keys": (
        "SELECT n_name, n_regionkey FROM nation ORDER BY n_regionkey, "
        "rank() OVER (ORDER BY n_name DESC), n_name LIMIT 6"
    ),
    "decimal_literal_mul_chain": (
        "SELECT n_nationkey, 2.5 * n_regionkey AS a, "
        "n_regionkey % 3 * 1.5 AS b FROM nation "
        "WHERE n_nationkey < 5 ORDER BY n_nationkey"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave21.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave21", cpus=8, shuffle_partitions=8)
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
