#!/usr/bin/env python
"""Probe battery wave 19 (round-11): TABLE FUNCTIONS and set-returning
expressions — stepped/descending generate_series (inclusive→exclusive
bound adjustment by step sign), SELECT-position unnest → explode,
range(), multi-DISTINCT aggregates, global HAVING (with and without
surviving groups). WITH ORDINALITY is ORACLE_INVALID — this container's
DuckDB does not implement it either. Same rubric as waves 4-18.

Usage: python experiments/probe_battery_wave19.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation"]

PROBES = {
    "generate_series_step": (
        "SELECT x FROM generate_series(1, 10, 3) AS t(x) ORDER BY x"
    ),
    "generate_series_desc": (
        "SELECT x FROM generate_series(10, 1, -4) AS t(x) ORDER BY x"
    ),
    "generate_series_exact_hit": (
        "SELECT x FROM generate_series(0, 9, 3) AS t(x) ORDER BY x"
    ),
    "generate_series_join": (
        "SELECT n_nationkey, g.x FROM nation, generate_series(1, 3) AS "
        "g(x) WHERE n_nationkey < 3 ORDER BY n_nationkey, g.x"
    ),
    "unnest_in_select": (
        "SELECT n_nationkey, unnest(array[1, 2]) AS v FROM nation "
        "WHERE n_nationkey < 3 ORDER BY n_nationkey, v"
    ),
    "unnest_select_strings": (
        "SELECT unnest(array['x', 'y']) AS s FROM nation "
        "WHERE n_nationkey = 0 ORDER BY s"
    ),
    "unnest_from_position": (
        "SELECT u.v FROM unnest(array[3, 1, 2]) AS u(v) ORDER BY u.v"
    ),
    "range_fn": "SELECT x FROM range(1, 5) AS t(x) ORDER BY x",
    "multi_distinct_aggs": (
        "SELECT count(DISTINCT n_regionkey) AS a, "
        "CAST(sum(DISTINCT n_regionkey) AS BIGINT) AS b, "
        "count(DISTINCT n_name) AS c FROM nation"
    ),
    "global_having": (
        "SELECT count(*) AS n FROM nation HAVING count(*) > 5"
    ),
    "global_having_empty": (
        "SELECT count(*) AS n FROM nation HAVING count(*) > 500"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave19.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave19", cpus=8, shuffle_partitions=8)
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
