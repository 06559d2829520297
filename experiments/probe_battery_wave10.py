#!/usr/bin/env python
"""Probe battery wave 10 (round-11): function-library parity sweep —
string functions (pad/repeat/translate/left/right/reverse/md5/ascii),
math (mod, negative-digit round, exp, cbrt-free forms), date/time
(last_day, date_part vs extract, make_date, day arithmetic), and cast
edges (string->date, bool->int, float->string). Same rubric as waves
4-9: every probe is DuckDB-valid; DIVERGE = silent-wrong-results.

Usage: python experiments/probe_battery_wave10.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation", "region", "orders"]

PROBES = {
    "pad_repeat": (
        "SELECT n_name, lpad(n_name, 12, '*') AS lp, rpad(n_name, 12, '.') AS rp, "
        "repeat('ab', n_regionkey + 1) AS rep FROM nation "
        "WHERE n_nationkey < 4 ORDER BY n_name"
    ),
    "left_right_reverse": (
        "SELECT n_name, left(n_name, 3) AS l3, right(n_name, 2) AS r2, "
        "reverse(n_name) AS rev FROM nation WHERE n_nationkey < 4 ORDER BY n_name"
    ),
    "translate_replace": (
        "SELECT translate(n_name, 'NAT', 'xyz') AS tr, "
        "replace(n_name, 'NATION', 'N') AS rp FROM nation "
        "WHERE n_nationkey < 4 ORDER BY tr"
    ),
    "md5_ascii_chr": (
        "SELECT md5(n_name) AS h, ascii(n_name) AS a, chr(65 + n_regionkey) AS c "
        "FROM nation WHERE n_nationkey < 4 ORDER BY h"
    ),
    "lpad_truncates": (
        "SELECT lpad(n_name, 4, '*') AS lp FROM nation "
        "WHERE n_nationkey < 4 ORDER BY lp"
    ),
    "mod_function": (
        "SELECT n_nationkey, mod(n_nationkey, 4) AS m, "
        "mod(0 - n_nationkey, 4) AS mneg FROM nation "
        "WHERE n_nationkey BETWEEN 1 AND 7 ORDER BY n_nationkey"
    ),
    "round_negative_digits": (
        "SELECT round(12345.678, -2) AS rneg, round(12345.678, 0) AS r0, "
        "round(12345.678, 2) AS r2 FROM region WHERE r_regionkey = 0"
    ),
    "exp_floor_ceil": (
        "SELECT round(exp(n_regionkey), 4) AS e, floor(n_nationkey / 2.0) AS f, "
        "ceil(n_nationkey / 2.0) AS c FROM nation "
        "WHERE n_nationkey < 5 ORDER BY n_nationkey"
    ),
    "abs_sign_cast": (
        "SELECT abs(0 - n_nationkey) AS a, CAST(sign(0 - n_nationkey) AS INT) AS s "
        "FROM nation WHERE n_nationkey < 4 ORDER BY a"
    ),
    "last_day_make_date": (
        "SELECT o_orderkey, last_day(o_orderdate) AS ld, "
        "make_date(2020, 2, 29) AS md FROM orders "
        "WHERE o_orderkey < 8 ORDER BY o_orderkey"
    ),
    "date_part_vs_extract": (
        "SELECT o_orderkey, date_part('year', o_orderdate) AS y, "
        "date_part('month', o_orderdate) AS m, "
        "date_part('day', o_orderdate) AS d FROM orders "
        "WHERE o_orderkey < 8 ORDER BY o_orderkey"
    ),
    "day_add_integer": (
        "SELECT o_orderkey, CAST(o_orderdate AS DATE) + 7 AS plus7 FROM orders "
        "WHERE o_orderkey < 8 ORDER BY o_orderkey"
    ),
    "cast_string_date": (
        "SELECT CAST('2020-02-29' AS DATE) AS d, "
        "CAST('2020-02-29 10:30:00' AS TIMESTAMP) AS ts "
        "FROM region WHERE r_regionkey = 0"
    ),
    "cast_bool_int_float": (
        "SELECT CAST(n_regionkey > 2 AS INT) AS bi, "
        "CAST(1.5 AS INT) AS fi, CAST('12' AS BIGINT) AS si "
        "FROM nation WHERE n_nationkey < 4 ORDER BY bi"
    ),
    "nullif_ifnull_coalesce": (
        "SELECT nullif(n_regionkey, 2) AS nf, ifnull(nullif(n_regionkey, 2), -1) AS inf_, "
        "coalesce(nullif(n_regionkey, 2), 99) AS co FROM nation "
        "WHERE n_nationkey < 6 ORDER BY n_nationkey"
    ),
    "greatest_string": (
        "SELECT greatest(n_name, 'NATION_5') AS g, least(n_name, 'NATION_5') AS l "
        "FROM nation WHERE n_nationkey < 4 ORDER BY g"
    ),
    "concat_ws_fn": (
        "SELECT concat_ws('-', n_name, CAST(n_regionkey AS STRING), 'x') AS cw "
        "FROM nation WHERE n_nationkey < 4 ORDER BY cw"
    ),
    "case_sensitive_like": (
        "SELECT n_name FROM nation WHERE lower(n_name) LIKE 'nation%' "
        "AND n_name NOT LIKE 'nation%' ORDER BY n_name LIMIT 3"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave10.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave10", cpus=8, shuffle_partitions=8)
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
