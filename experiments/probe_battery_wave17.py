#!/usr/bin/env python
"""Probe battery wave 17 (round-11): WINDOW-function edges beyond wave
11 — negative/zero lag-lead offsets, nth_value FROM LAST/IGNORE NULLS,
RANGE frames under DESC ordering, empty OVER(), expression frame
bounds, min/max over moving frames, dense_rank ties, windows in CASE
and arithmetic composition. Same rubric as waves 4-16.

Usage: python experiments/probe_battery_wave17.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation", "customer"]

PROBES = {
    "lag_negative_offset": (
        # lag(x, -1) == lead(x, 1) on both engines
        "SELECT n_nationkey, lag(n_name, -1) OVER (ORDER BY n_nationkey) "
        "AS nxt FROM nation ORDER BY n_nationkey"
    ),
    "lag_zero_offset": (
        "SELECT n_nationkey, lag(n_name, 0) OVER (ORDER BY n_nationkey) "
        "AS self FROM nation ORDER BY n_nationkey"
    ),
    "lead_large_offset": (
        "SELECT n_nationkey, lead(n_name, 100) OVER (ORDER BY "
        "n_nationkey) AS far FROM nation ORDER BY n_nationkey"
    ),
    "range_frame_desc": (
        # RANGE offsets under DESC ordering: preceding = larger values
        "SELECT n_nationkey, CAST(sum(n_nationkey) OVER (ORDER BY "
        "n_nationkey DESC RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) "
        "AS BIGINT) AS s FROM nation ORDER BY n_nationkey"
    ),
    "empty_over": (
        "SELECT n_nationkey, count(*) OVER () AS total, "
        "CAST(sum(n_nationkey) OVER () AS BIGINT) AS s "
        "FROM nation ORDER BY n_nationkey"
    ),
    "min_max_moving_frame": (
        "SELECT n_nationkey, min(n_name) OVER (ORDER BY n_nationkey "
        "ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS mn, "
        "max(n_name) OVER (ORDER BY n_nationkey ROWS BETWEEN 2 "
        "PRECEDING AND 2 FOLLOWING) AS mx FROM nation "
        "ORDER BY n_nationkey"
    ),
    "window_in_arithmetic": (
        "SELECT n_nationkey, CAST(n_nationkey - avg(n_nationkey) OVER "
        "(PARTITION BY n_regionkey) AS DOUBLE) AS dev FROM nation "
        "ORDER BY n_nationkey"
    ),
    "window_in_case": (
        "SELECT n_nationkey, CASE WHEN rank() OVER (ORDER BY "
        "n_nationkey) <= 5 THEN 'top' ELSE 'rest' END AS band "
        "FROM nation ORDER BY n_nationkey"
    ),
    "dense_rank_ties": (
        "SELECT n_nationkey, dense_rank() OVER (ORDER BY n_regionkey) "
        "AS dr, rank() OVER (ORDER BY n_regionkey) AS r "
        "FROM nation ORDER BY n_nationkey"
    ),
    "row_number_two_windows": (
        "SELECT n_nationkey, row_number() OVER (ORDER BY n_name) AS a, "
        "row_number() OVER (ORDER BY n_name DESC) AS b "
        "FROM nation ORDER BY n_nationkey"
    ),
    "nth_value_from_frame_start": (
        "SELECT n_nationkey, nth_value(n_name, 3) OVER (ORDER BY "
        "n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "AS third FROM nation ORDER BY n_nationkey"
    ),
    "last_value_default_frame": (
        # default frame = RANGE UNBOUNDED PRECEDING..CURRENT ROW: peers!
        "SELECT n_nationkey, last_value(n_nationkey) OVER (ORDER BY "
        "n_regionkey) AS lv FROM nation ORDER BY n_nationkey"
    ),
    "sum_over_partition_order_expr": (
        "SELECT c_custkey, CAST(sum(c_custkey) OVER (PARTITION BY "
        "c_nationkey % 3 ORDER BY c_custkey) AS BIGINT) AS s "
        "FROM customer WHERE c_custkey < 120 ORDER BY c_custkey"
    ),
    "avg_over_range_current_group": (
        "SELECT n_nationkey, round(avg(n_nationkey) OVER (ORDER BY "
        "n_regionkey RANGE BETWEEN CURRENT ROW AND CURRENT ROW), 4) "
        "AS a FROM nation ORDER BY n_nationkey"
    ),
    "cume_dist_with_partition": (
        "SELECT n_nationkey, round(cume_dist() OVER (PARTITION BY "
        "n_regionkey ORDER BY n_nationkey), 4) AS cd FROM nation "
        "ORDER BY n_nationkey"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave17.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave17", cpus=8, shuffle_partitions=8)
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
