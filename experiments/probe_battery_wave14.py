#!/usr/bin/env python
"""Probe battery wave 14 (round-11): AGGREGATE-function parity —
arg_max/arg_min vs max_by/min_by naming, median/quantile typing and
interpolation, bool/bit families, multi-column count(DISTINCT),
covariance/regression typing, string_agg defaults. Same rubric as waves
4-13: every DIVERGE/ERROR is closed same-session or documented loud.

Usage: python experiments/probe_battery_wave14.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation", "customer", "orders"]

PROBES = {
    # DuckDB arg_max(arg, val) == Spark max_by(arg, val); DuckDB also
    # aliases max_by — both spellings must work
    "arg_max_min": (
        "SELECT c_nationkey, arg_max(c_name, c_acctbal) AS top, "
        "arg_min(c_name, c_acctbal) AS bot FROM customer "
        "GROUP BY c_nationkey ORDER BY c_nationkey"
    ),
    "max_by_min_by": (
        "SELECT c_nationkey, max_by(c_name, c_acctbal) AS top, "
        "min_by(c_name, c_acctbal) AS bot FROM customer "
        "GROUP BY c_nationkey ORDER BY c_nationkey"
    ),
    "median_int_interpolates": (
        "SELECT c_nationkey, CAST(median(c_custkey) AS DOUBLE) AS m "
        "FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"
    ),
    "quantile_cont_fn": (
        "SELECT c_nationkey, CAST(quantile_cont(c_custkey, 0.25) AS "
        "DOUBLE) AS q FROM customer GROUP BY c_nationkey "
        "ORDER BY c_nationkey"
    ),
    "quantile_disc_fn": (
        "SELECT c_nationkey, CAST(quantile_disc(c_custkey, 0.25) AS "
        "DOUBLE) AS q FROM customer GROUP BY c_nationkey "
        "ORDER BY c_nationkey"
    ),
    "bool_families": (
        "SELECT n_regionkey, bool_and(n_nationkey > 2) AS ba, "
        "bool_or(n_nationkey > 20) AS bo FROM nation "
        "GROUP BY n_regionkey ORDER BY n_regionkey"
    ),
    "count_distinct_pair_expr": (
        # DuckDB has no multi-argument count(DISTINCT a, b) — pin the
        # struct-pair spelling both engines accept
        "SELECT count(DISTINCT o_orderstatus || '|' || o_orderpriority) "
        "AS n FROM orders"
    ),
    "covar_typing": (
        "SELECT round(covar_pop(c_custkey, c_nationkey), 4) AS cp, "
        "round(covar_samp(c_custkey, c_nationkey), 4) AS cs "
        "FROM customer"
    ),
    "regr_family": (
        "SELECT round(regr_slope(c_acctbal, c_custkey), 6) AS s, "
        "round(regr_intercept(c_acctbal, c_custkey), 4) AS i, "
        "CAST(regr_count(c_acctbal, c_custkey) AS BIGINT) AS n "
        "FROM customer"
    ),
    "avg_int_typing": (
        "SELECT c_nationkey, round(avg(c_custkey), 4) AS a "
        "FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"
    ),
    "stddev_int": (
        "SELECT round(stddev(c_custkey), 4) AS sd, "
        "round(var_samp(c_custkey), 2) AS vs FROM customer"
    ),
    "string_agg_one_arg": (
        "SELECT string_agg(n_name ORDER BY n_name) AS s FROM nation "
        "WHERE n_nationkey < 4"
    ),
    "sum_distinct": (
        "SELECT CAST(sum(DISTINCT n_regionkey) AS BIGINT) AS s "
        "FROM nation"
    ),
    "min_max_strings": (
        "SELECT n_regionkey, min(n_name) AS mn, max(n_name) AS mx "
        "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"
    ),
    "product_agg_rejects": (
        # no exact lambda-free Spark lowering — must REJECT loud, never
        # a raw AnalysisException (rubric: REJECT is a pass here)
        "SELECT CAST(product(n_regionkey + 1) AS DOUBLE) AS p "
        "FROM nation WHERE n_nationkey < 5"
    ),
    "any_value_deterministic_group": (
        # any_value over a single-valued group is deterministic on both
        "SELECT n_nationkey, any_value(n_name) AS v FROM nation "
        "GROUP BY n_nationkey ORDER BY n_nationkey"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave14.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave14", cpus=8, shuffle_partitions=8)
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
