#!/usr/bin/env python
"""Probe battery wave 29 (round-11): NUMERIC EXCEPTIONAL VALUES —
division/modulo by zero (DuckDB reads NULL; Spark's ANSI mode raises —
the NULLIF(divisor, 0) lowering restores the NULL contract in a
spelling both engines parse), integer `//` with zero divisors,
inf/nan literals and propagation, NaN ordering/equality (both engines
treat NaN as equal-to-itself and greater-than-everything), NaN through
max/greatest, exp/power overflow to inf, and round typing. Domain
errors (sqrt(-1), ln(0)) and integer-overflow are LOUD on both engines
or documented loud-vs-silent (see parser.py log lowering comment).
Same rubric as waves 4-28.

Usage: python experiments/probe_battery_wave29.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation"]

PROBES = {
    "div_by_zero_reads_null": (
        "SELECT n_nationkey, n_nationkey / n_regionkey AS q "
        "FROM nation WHERE n_nationkey < 6 ORDER BY n_nationkey"
    ),
    "mod_by_zero_reads_null": (
        "SELECT n_nationkey, n_nationkey % n_regionkey AS m, "
        "n_nationkey % 0 AS z FROM nation WHERE n_nationkey < 6 "
        "ORDER BY n_nationkey"
    ),
    "intdiv_by_zero_reads_null": (
        "SELECT n_nationkey, n_nationkey // n_regionkey AS d "
        "FROM nation WHERE n_nationkey < 6 ORDER BY n_nationkey"
    ),
    "literal_zero_division": (
        "SELECT 1 / 0 AS a, 1.0 / 0 AS b, 5 % 0 AS c "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "inf_nan_literals": (
        "SELECT CAST('inf' AS DOUBLE) AS a, CAST('-inf' AS DOUBLE) AS b, "
        "CAST(isnan(CAST('nan' AS DOUBLE)) AS STRING) AS c "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "exp_power_overflow_inf": (
        "SELECT exp(1000) AS a, power(0, -1) AS b, "
        "CAST(1e300 * 1e300 AS DOUBLE) AS c "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "nan_equality_and_ordering": (
        "SELECT CAST(CAST('nan' AS DOUBLE) = CAST('nan' AS DOUBLE) "
        "AS STRING) AS eq, "
        "CAST(CAST('nan' AS DOUBLE) > 1e308 AS STRING) AS gt "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "nan_through_aggregates": (
        "SELECT CAST(isnan(max(x)) AS STRING) AS m, "
        "CAST(isnan(greatest(min(x), CAST('nan' AS DOUBLE))) AS STRING) "
        "AS g FROM (SELECT CAST(CASE WHEN n_nationkey = 0 THEN 'nan' "
        "ELSE '1.5' END AS DOUBLE) AS x FROM nation) t"
    ),
    "nan_sorts_last_over_values": (
        # CAST(inf/nan AS STRING) formats DIVERGE ('Infinity'/'NaN' on
        # Spark vs 'inf'/'nan' on DuckDB) — compare via predicates; the
        # ORDER BY pins the shared ordering: values < inf < nan
        "SELECT CASE WHEN isnan(x) THEN 'nan' "
        "WHEN x = CAST('inf' AS DOUBLE) THEN 'inf' "
        "ELSE CAST(CAST(x AS BIGINT) AS STRING) END AS xs "
        "FROM (SELECT CAST(CASE WHEN "
        "n_nationkey = 0 THEN 'nan' WHEN n_nationkey = 1 THEN 'inf' "
        "ELSE CAST(n_nationkey AS STRING) END AS DOUBLE) AS x "
        "FROM nation WHERE n_nationkey < 5) t ORDER BY x"
    ),
    "round_half_and_typing": (
        "SELECT round(0.5) AS a, round(-0.5) AS b, round(2.675, 2) AS c, "
        "round(CAST(2.5 AS DOUBLE)) AS d FROM nation WHERE n_nationkey = 0"
    ),
    "float_mod_by_zero": (
        "SELECT CAST(5.0 AS DOUBLE) % 0 AS a, "
        "CAST(5.5 AS DOUBLE) % CAST(2.0 AS DOUBLE) AS b "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "div_zero_inside_aggregate": (
        "SELECT CAST(count(n_nationkey / n_regionkey) AS BIGINT) AS n "
        "FROM nation"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave29.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave29", cpus=8, shuffle_partitions=8)
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
