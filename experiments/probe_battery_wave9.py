#!/usr/bin/env python
"""Probe battery wave 9 (round-11): operator-parity landmines — `^` is
POWER on DuckDB/Postgres but XOR on Spark, 1-arg log() is base-10 vs
natural, array subscripts are 1-based vs 0-based, slices are inclusive
`[a:b]` vs slice(start, length) — plus ANSI call forms (substring FROM
FOR, trim BOTH, position IN), SIMILAR TO, ILIKE, multi-column DISTINCT
aggregates, || coercion, division/modulo edges, and the new top-1
scalar machinery combined with aggregates above. Same rubric as waves
4-8; any DIVERGE is a silent-wrong-results bug.

Usage: python experiments/probe_battery_wave9.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation", "region", "customer", "orders"]

PROBES = {
    # --- operator parity: ^ / log / subscripts / slices ---
    "caret_is_power": (
        "SELECT n_nationkey, round(n_regionkey ^ 2, 1) AS p, "
        "round(2 ^ 3 ^ 2, 1) AS chain FROM nation "
        "WHERE n_nationkey < 6 ORDER BY n_nationkey"
    ),
    "log_base10": (
        "SELECT n_nationkey, round(log(n_nationkey + 10), 4) AS l10, "
        "round(ln(n_nationkey + 10), 4) AS lnat, "
        "round(log(2, n_nationkey + 2), 4) AS l2 FROM nation "
        "WHERE n_nationkey < 6 ORDER BY n_nationkey"
    ),
    "subscript_one_based": (
        "SELECT n_nationkey, (array[n_nationkey, n_regionkey, 99])[1] AS e1, "
        "(array[n_nationkey])[5] AS oob, (array[10,20,30])[-1] AS neg "
        "FROM nation WHERE n_nationkey < 4 ORDER BY n_nationkey"
    ),
    "slice_inclusive": (
        "SELECT (array[10,20,30,40])[2:3] AS s1, (array[10,20,30,40])[:2] AS s2, "
        "(array[10,20,30,40])[3:] AS s3 FROM region WHERE r_regionkey = 0"
    ),
    "subscript_expr_index": (
        "SELECT n_nationkey, (array[100,200,300])[n_regionkey % 3 + 1] AS e "
        "FROM nation WHERE n_nationkey < 6 ORDER BY n_nationkey"
    ),
    # --- ANSI call forms carried verbatim ---
    "substring_from_for": (
        "SELECT n_name, substring(n_name FROM 2 FOR 4) AS mid, "
        "substring(n_name FROM 8) AS tail FROM nation "
        "WHERE n_nationkey < 4 ORDER BY n_name"
    ),
    "trim_both_leading": (
        "SELECT trim(BOTH 'N' FROM n_name) AS t1, "
        "trim(LEADING 'N' FROM n_name) AS t2, "
        "trim(TRAILING '0123456789' FROM 'AB129') AS t3 FROM nation "
        "WHERE n_nationkey < 3 ORDER BY n_name"
    ),
    "position_in": (
        "SELECT n_name, position('_' IN n_name) AS p, "
        "position('zz' IN n_name) AS missing FROM nation "
        "WHERE n_nationkey < 3 ORDER BY n_name"
    ),
    # --- SIMILAR TO / ILIKE ---
    "similar_to": (
        "SELECT n_name FROM nation WHERE n_name SIMILAR TO 'NATION_[0-9]' "
        "ORDER BY n_name"
    ),
    "not_similar_to": (
        "SELECT n_name FROM nation WHERE NOT (n_name SIMILAR TO '%1%') "
        "AND n_nationkey < 12 ORDER BY n_name"
    ),
    "ilike_case_fold": (
        "SELECT n_name FROM nation WHERE n_name ILIKE 'nation#_1' ESCAPE '#' "
        "ORDER BY n_name"
    ),
    # --- aggregates: multi-column DISTINCT, string concat coercion ---
    # (multi-argument count(DISTINCT a, b) dropped: DuckDB has no such
    # spelling, so the identical-text oracle cannot gate it)
    "concat_coercion": (
        "SELECT n_nationkey || '-' || n_name AS tag FROM nation "
        "WHERE n_nationkey < 3 ORDER BY tag"
    ),
    # --- numeric edges ---
    "division_modulo_edges": (
        "SELECT n_nationkey, n_nationkey % 4 AS m, "
        "round(n_nationkey / 4, 4) AS d FROM nation "
        "WHERE n_nationkey BETWEEN 1 AND 8 ORDER BY n_nationkey"
    ),
    # --- top-1 scalar machinery x aggregation above ---
    "top1_scalar_in_having": (
        "SELECT c.c_nationkey, count(*) AS cnt FROM customer c "
        "GROUP BY c.c_nationkey HAVING count(*) > "
        "(SELECT o.o_orderkey % 40 FROM orders o "
        "WHERE o.o_custkey = c.c_nationkey + 1 "
        "ORDER BY o.o_orderkey LIMIT 1) ORDER BY c.c_nationkey"
    ),
    "top1_lateral_two_rows": (
        "SELECT n.n_nationkey, l.ck FROM nation n, LATERAL "
        "(SELECT c.c_custkey AS ck FROM customer c "
        "WHERE c.c_nationkey = n.n_nationkey "
        "ORDER BY c.c_acctbal DESC, c.c_custkey LIMIT 2) l "
        "WHERE n.n_nationkey < 5 ORDER BY n.n_nationkey, l.ck"
    ),
    # --- date_trunc parity ---
    "date_trunc_fields": (
        "SELECT o_orderkey, date_trunc('week', o_orderdate) AS w, "
        "date_trunc('quarter', o_orderdate) AS q, "
        "date_trunc('month', o_orderdate) AS m FROM orders "
        "WHERE o_orderkey < 12 ORDER BY o_orderkey"
    ),
    # --- greatest/least over expressions ---
    "greatest_least_exprs": (
        "SELECT greatest(n_nationkey, n_regionkey * 5, 7) AS g, "
        "least(n_nationkey, n_regionkey * 5, 7) AS l FROM nation "
        "WHERE n_nationkey < 6 ORDER BY n_nationkey"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave9.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave9", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    cat = load_tables(spark, SF, TABLES)
    schema = {t: cat[t].columns for t in TABLES}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    def cells(rows):
        return sorted(
            map(
                repr,
                (
                    tuple(
                        tuple(v) if isinstance(v, list) else v for v in row
                    )
                    for row in rows
                ),
            )
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
        if cells(got) == cells(want):
            results[name] = {"outcome": "PASS", "rows": len(got)}
            print(f"PASS {name} ({len(got)} rows)")
        else:
            diffs = [
                (g, w) for g, w in zip(cells(got), cells(want)) if g != w
            ][:3]
            results[name] = {"outcome": "DIVERGE", "first_diffs": diffs}
            print(f"DIVERGE {name}: {diffs[:1]}")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    bad = [n for n, r in results.items() if r["outcome"] in ("DIVERGE", "ERROR")]
    print(f"\n{len(results)} probes; diverge/error: {bad}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
