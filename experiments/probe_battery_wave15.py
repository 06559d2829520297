#!/usr/bin/env python
"""Probe battery wave 15 (round-11): DATE/TIME function parity —
strftime/strptime format codes, dayname/monthname, week numbering,
date_part aliasing, date subtraction typing, make_date/last_day,
interval arithmetic composition. Same rubric as waves 4-14.

Usage: python experiments/probe_battery_wave15.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["orders", "nation"]

PROBES = {
    "strftime_common_codes": (
        "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS ymd, "
        "strftime(o_orderdate, '%Y/%m') AS ym "
        "FROM orders WHERE o_orderkey < 50 ORDER BY o_orderkey"
    ),
    "strptime_roundtrip": (
        "SELECT CAST(strptime('2024-03-05', '%Y-%m-%d') AS DATE) AS d "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "dayname_monthname": (
        "SELECT o_orderkey, dayname(o_orderdate) AS dn, "
        "monthname(o_orderdate) AS mn "
        "FROM orders WHERE o_orderkey < 50 ORDER BY o_orderkey"
    ),
    "week_numbering": (
        "SELECT o_orderkey, CAST(week(o_orderdate) AS BIGINT) AS w "
        "FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey"
    ),
    "date_part_alias": (
        "SELECT o_orderkey, CAST(date_part('month', o_orderdate) AS "
        "BIGINT) AS m, CAST(date_part('dow', o_orderdate) AS BIGINT) "
        "AS dw FROM orders WHERE o_orderkey < 50 ORDER BY o_orderkey"
    ),
    "make_date_fn": (
        "SELECT make_date(2024, 2, 29) AS d FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "last_day_fn": (
        "SELECT o_orderkey, last_day(CAST(o_orderdate AS DATE)) AS ld "
        "FROM orders WHERE o_orderkey < 50 ORDER BY o_orderkey"
    ),
    "date_subtraction_typing": (
        # DATE - DATE: DuckDB yields BIGINT days, Spark an INTERVAL —
        # pin through datediff which both lower identically
        "SELECT CAST(datediff('day', TIMESTAMP '1995-01-01', "
        "o_orderdate) AS BIGINT) AS days FROM orders "
        "WHERE o_orderkey < 50 ORDER BY o_orderkey"
    ),
    "interval_composition": (
        "SELECT CAST(o_orderdate + INTERVAL 1 MONTH + INTERVAL 3 DAY "
        "AS DATE) AS d FROM orders WHERE o_orderkey < 50 "
        "ORDER BY o_orderkey"
    ),
    "interval_month_end_clamp": (
        "SELECT CAST(TIMESTAMP '2024-01-31' + INTERVAL 1 MONTH AS DATE) "
        "AS d FROM nation WHERE n_nationkey = 0"
    ),
    "date_trunc_week": (
        "SELECT o_orderkey, date_trunc('week', o_orderdate) AS w "
        "FROM orders WHERE o_orderkey < 50 ORDER BY o_orderkey"
    ),
    "greatest_of_dates": (
        "SELECT greatest(CAST(o_orderdate AS DATE), DATE '1996-06-01') "
        "AS g FROM orders WHERE o_orderkey < 50 ORDER BY g, o_orderkey"
    ),
    "extract_quarter_isoyear": (
        "SELECT o_orderkey, CAST(extract(quarter FROM o_orderdate) AS "
        "BIGINT) AS q, CAST(extract(isoyear FROM o_orderdate) AS BIGINT) "
        "AS iy FROM orders WHERE o_orderkey < 50 ORDER BY o_orderkey"
    ),
    "to_char_via_strftime": (
        # month-name + literal text mixing
        "SELECT strftime(o_orderdate, '%d %B %Y') AS pretty "
        "FROM orders WHERE o_orderkey < 20 ORDER BY pretty"
    ),
    "epoch_ms_fn": (
        "SELECT CAST(epoch_ms(o_orderdate) AS BIGINT) AS ms "
        "FROM orders WHERE o_orderkey < 20 ORDER BY ms"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave15.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave15", cpus=8, shuffle_partitions=8)
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
