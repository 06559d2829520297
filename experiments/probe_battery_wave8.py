#!/usr/bin/env python
"""Probe battery wave 8 (round-11): memberships inside aggregate
arguments, QUALIFY x DISTINCT ON, recursion feeding set ops with windows
above, CASE-of-grouping() keys, FILTER on ordered-set aggregates,
interval arithmetic over month boundaries, comparator ordered-agg with
REAL null keys, fractional epoch, and numeric/function parity traps
(least/greatest NULLs, negative modulo, float division, round-half).
Same rubric as waves 4-7: every probe is DuckDB-valid; outcomes are
PASS / REJECT (clean UnsupportedSqlError) / DIVERGE / ERROR — any
DIVERGE is a silent-wrong-results bug to fix same-round.

Usage: python experiments/probe_battery_wave8.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation", "region", "customer", "orders"]

PROBES = {
    # --- memberships inside aggregate ARGUMENTS ---
    "exists_in_agg_argument": (
        "SELECT c_nationkey, CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM region r "
        "WHERE r.r_regionkey = 2) THEN 1 ELSE 0 END) AS BIGINT) AS s "
        "FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"
    ),
    "corr_exists_in_agg_argument": (
        "SELECT c.c_nationkey, CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM nation n "
        "WHERE n.n_nationkey = c.c_nationkey AND n.n_regionkey > 2) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS s "
        "FROM customer c GROUP BY c.c_nationkey ORDER BY c.c_nationkey"
    ),
    "in_membership_filter_clause": (
        "SELECT c.c_nationkey, count(*) FILTER (WHERE c.c_nationkey IN "
        "(SELECT n_nationkey FROM nation WHERE n_regionkey = 1)) AS c "
        "FROM customer c GROUP BY c.c_nationkey ORDER BY c.c_nationkey"
    ),
    # --- QUALIFY x DISTINCT ON interplay ---
    "qualify_after_distinct_on": (
        "SELECT * FROM (SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey "
        "FROM customer ORDER BY c_nationkey, c_custkey) d "
        "QUALIFY row_number() OVER (ORDER BY c_custkey) <= 5 ORDER BY c_custkey"
    ),
    "distinct_on_expression_key": (
        "SELECT DISTINCT ON (c_nationkey % 3) c_nationkey % 3 AS b, c_custkey "
        "FROM customer ORDER BY c_nationkey % 3, c_custkey"
    ),
    # --- recursive CTE feeding a set op with a window above ---
    "recursive_setop_window": (
        "WITH RECURSIVE seq(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM seq "
        "WHERE n < 6) SELECT n, CAST(sum(n) OVER (ORDER BY n) AS BIGINT) AS run "
        "FROM (SELECT n FROM seq UNION ALL SELECT n + 10 FROM seq) u ORDER BY n"
    ),
    "recursive_intersect_above": (
        "WITH RECURSIVE seq(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM seq "
        "WHERE n < 10) SELECT n FROM seq INTERSECT "
        "SELECT n_regionkey + 1 FROM nation ORDER BY n"
    ),
    # --- CASE-of-grouping() as an output over grouping sets ---
    "case_of_grouping_key": (
        "SELECT CASE WHEN grouping(n_regionkey) = 1 THEN -1 ELSE n_regionkey END "
        "AS k, count(*) AS c FROM nation "
        "GROUP BY GROUPING SETS ((n_regionkey), ()) ORDER BY k"
    ),
    "grouping_in_having": (
        "SELECT n_regionkey, count(*) AS c FROM nation "
        "GROUP BY ROLLUP (n_regionkey) HAVING grouping(n_regionkey) = 0 "
        "ORDER BY n_regionkey"
    ),
    # --- FILTER on ordered-set aggregates ---
    "ordered_set_filter": (
        "SELECT c_mktsegment, round(percentile_cont(0.5) WITHIN GROUP "
        "(ORDER BY c_acctbal) FILTER (WHERE c_nationkey < 10), 2) AS med "
        "FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"
    ),
    "percentile_disc_desc_nulls": (
        "SELECT round(percentile_disc(0.25) WITHIN GROUP "
        "(ORDER BY c_acctbal DESC NULLS LAST), 2) AS q FROM customer"
    ),
    # --- interval arithmetic across month boundaries ---
    "interval_month_end": (
        "SELECT DATE '1996-01-31' + INTERVAL '1' MONTH AS d1, "
        "DATE '1996-02-29' + INTERVAL '1' YEAR AS d2, "
        "DATE '1995-03-31' - INTERVAL '1' MONTH AS d3"
    ),
    "interval_mixed_units": (
        "SELECT o_orderkey, o_orderdate + INTERVAL '2' DAY AS d "
        "FROM orders WHERE o_orderkey < 20 ORDER BY o_orderkey"
    ),
    # --- comparator ordered-agg with REAL null keys ---
    "ordered_agg_null_keys_first": (
        "SELECT c_nationkey, string_agg(c_name, ',' ORDER BY "
        "CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_custkey END "
        "DESC NULLS FIRST, c_custkey ASC) AS names "
        "FROM customer WHERE c_custkey < 40 GROUP BY c_nationkey "
        "ORDER BY c_nationkey"
    ),
    "ordered_agg_null_keys_default": (
        "SELECT c_nationkey, string_agg(c_name, ',' ORDER BY "
        "CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_custkey END ASC, "
        "c_custkey DESC) AS names "
        "FROM customer WHERE c_custkey < 40 GROUP BY c_nationkey "
        "ORDER BY c_nationkey"
    ),
    # --- fractional epoch over sub-second timestamps ---
    "epoch_subsecond": (
        "SELECT extract(epoch FROM TIMESTAMP '2020-06-01 12:00:00.25') AS e1, "
        "extract(epoch FROM TIMESTAMP '1999-12-31 23:59:59.999') AS e2"
    ),
    # --- numeric / function parity traps ---
    "least_greatest_nulls": (
        "SELECT least(n_regionkey, NULL) AS l, greatest(NULL, n_regionkey) AS g "
        "FROM nation WHERE n_nationkey < 3 ORDER BY n_regionkey"
    ),
    "negative_modulo": (
        "SELECT (0 - n_nationkey) % 3 AS m, n_nationkey % (0 - 4) AS m2 "
        "FROM nation WHERE n_nationkey BETWEEN 1 AND 7 ORDER BY n_nationkey"
    ),
    "float_division_type": (
        "SELECT n_nationkey, n_nationkey / 4.0 AS d FROM nation "
        "WHERE n_nationkey < 5 ORDER BY n_nationkey"
    ),
    "round_half_cases": (
        "SELECT round(2.5) AS a, round(3.5) AS b, round(0 - 2.5) AS c, "
        "round(2.45, 1) AS d"
    ),
    "power_and_sqrt_types": (
        "SELECT CAST(power(n_regionkey, 2) AS BIGINT) AS p, "
        "round(sqrt(n_nationkey), 3) AS s FROM nation "
        "WHERE n_nationkey < 5 ORDER BY n_nationkey"
    ),
    # --- scalar subquery in ORDER BY expression position ---
    "scalar_in_order_by": (
        "SELECT n_name FROM nation "
        "ORDER BY abs(n_regionkey - (SELECT avg(r_regionkey) FROM region)), "
        "n_name"
    ),
    # --- correlated LEFT-JOIN scalar + uncorrelated scalar in one conjunct ---
    "mixed_scalars_one_conjunct": (
        "SELECT c.c_custkey FROM customer c WHERE "
        "(SELECT count(o.o_orderkey) FROM nation nx LEFT JOIN orders o "
        "ON o.o_custkey = nx.n_nationkey WHERE nx.n_nationkey = c.c_nationkey) "
        "> (SELECT count(*) FROM region) AND c.c_custkey < 12 "
        "ORDER BY c.c_custkey"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave8.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave8", cpus=8, shuffle_partitions=8)
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
