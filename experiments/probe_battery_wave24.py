#!/usr/bin/env python
"""Probe battery wave 24 (round-11): PIVOT / UNPIVOT — the FROM-postfix
spelling Spark and DuckDB share. Coverage: count/sum/avg/min pivots,
implicit group-by-everything-else (incl. the count(*) form, which keeps
ALL non-key columns as groups), no-remaining-groups global pivots,
IN items that match no rows, aliased items, numeric items (alias
required — both engines derive result names from item text), aliased
sources, pivot over derived tables, UNPIVOT with/without INCLUDE NULLS,
unpivot aliases, and a pivot→unpivot chain. Same rubric as waves 4-23.

Usage: python experiments/probe_battery_wave24.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation", "orders"]

PROBES = {
    "pivot_count_base_table": (
        "SELECT * FROM nation PIVOT (count(n_name) FOR n_regionkey "
        "IN (0 AS r0, 1 AS r1, 2 AS r2)) ORDER BY n_nationkey"
    ),
    "pivot_sum_groups": (
        "SELECT o_orderpriority, CAST(o AS BIGINT) AS o, "
        "CAST(f AS BIGINT) AS f FROM ("
        "SELECT * FROM (SELECT o_orderpriority, o_orderstatus, "
        "o_orderkey % 10 AS d FROM orders) PIVOT (sum(d) "
        "FOR o_orderstatus IN ('O' AS o, 'F' AS f))) "
        "ORDER BY o_orderpriority"
    ),
    "pivot_avg": (
        "SELECT * FROM (SELECT n_regionkey, n_name, n_nationkey "
        "FROM nation) PIVOT (avg(n_nationkey) FOR n_regionkey "
        "IN (0 AS r0, 1 AS r1)) ORDER BY n_name LIMIT 6"
    ),
    "pivot_min_string": (
        "SELECT * FROM (SELECT n_regionkey, n_name FROM nation) "
        "PIVOT (min(n_name) FOR n_regionkey IN (0 AS r0, 3 AS r3))"
    ),
    "pivot_no_groups_global": (
        "SELECT CAST(o AS BIGINT) AS o, CAST(p AS BIGINT) AS p FROM ("
        "SELECT * FROM (SELECT o_orderstatus FROM orders) "
        "PIVOT (count(*) FOR o_orderstatus IN ('O' AS o, 'P' AS p)))"
    ),
    "pivot_missing_item_null": (
        "SELECT * FROM (SELECT n_regionkey, n_nationkey FROM nation) "
        "PIVOT (sum(n_nationkey) FOR n_regionkey IN (77 AS nope, "
        "1 AS one))"
    ),
    "pivot_count_star_keeps_values": (
        "SELECT * FROM (SELECT n_regionkey, n_nationkey FROM nation "
        "WHERE n_nationkey < 4) PIVOT (count(*) FOR n_regionkey "
        "IN (0 AS r0, 1 AS r1)) ORDER BY n_nationkey"
    ),
    "pivot_aliased_source": (
        "SELECT * FROM nation AS n PIVOT (count(n_name) FOR "
        "n_regionkey IN (4 AS r4)) ORDER BY n_nationkey LIMIT 5"
    ),
    "pivot_then_where": (
        "SELECT n_nationkey, CAST(r2 AS BIGINT) AS r2 FROM ("
        "SELECT * FROM nation PIVOT (count(n_name) FOR n_regionkey "
        "IN (2 AS r2))) WHERE r2 > 0 ORDER BY n_nationkey"
    ),
    "unpivot_basic": (
        "SELECT * FROM (SELECT n_nationkey AS id, n_nationkey * 2 AS x, "
        "n_regionkey AS y FROM nation) UNPIVOT (v FOR k IN (x, y)) "
        "ORDER BY id, k"
    ),
    "unpivot_excludes_nulls": (
        "SELECT * FROM (SELECT n_nationkey AS id, CASE WHEN "
        "n_regionkey = 0 THEN NULL ELSE n_regionkey END AS x, "
        "n_regionkey AS y FROM nation) UNPIVOT (v FOR k IN (x, y)) "
        "ORDER BY id, k"
    ),
    "unpivot_include_nulls": (
        "SELECT * FROM (SELECT n_nationkey AS id, CASE WHEN "
        "n_regionkey = 0 THEN NULL ELSE n_regionkey END AS x, "
        "n_regionkey AS y FROM nation) UNPIVOT INCLUDE NULLS "
        "(v FOR k IN (x, y)) ORDER BY id, k"
    ),
    "unpivot_item_aliases": (
        "SELECT * FROM (SELECT n_nationkey AS id, n_regionkey AS a, "
        "n_nationkey AS b FROM nation) UNPIVOT (amount FOR metric IN "
        "(a AS alpha, b AS beta)) ORDER BY id, metric LIMIT 8"
    ),
    "unpivot_single_column": (
        "SELECT * FROM (SELECT n_nationkey AS id, n_regionkey AS x "
        "FROM nation) UNPIVOT (v FOR k IN (x)) ORDER BY id"
    ),
    "pivot_unpivot_roundtrip": (
        "SELECT * FROM (SELECT n_regionkey, n_nationkey "
        "FROM nation) PIVOT (count(n_nationkey) FOR n_regionkey IN "
        "(0 AS r0, 1 AS r1)) UNPIVOT (cnt FOR region IN (r0, r1)) "
        "ORDER BY region"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave24.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave24", cpus=8, shuffle_partitions=8)
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
            wcols = [d[0] for d in con.description]
        except Exception as exc:
            results[name] = {"outcome": "ORACLE_INVALID", "detail": str(exc)[:200]}
            print(f"ORACLE_INVALID {name}: {str(exc)[:120]}")
            continue
        try:
            df = compile_plan(
                parse_relalg(parse_query(sql, schema=schema)), spark, cat
            )
            gcols = list(df.columns)
            got = df.collect()
        except Exception as exc:
            kind = type(exc).__name__
            outcome = (
                "REJECT" if kind in ("UnsupportedSqlError", "ParserError") else "ERROR"
            )
            results[name] = {"outcome": outcome, "detail": f"{kind}: {str(exc)[:200]}"}
            print(f"{outcome} {name}: {kind}: {str(exc)[:120]}")
            continue
        norm = lambda rows: sorted(map(repr, (tuple(r) for r in rows)))
        if [c.lower() for c in gcols] != [c.lower() for c in wcols]:
            results[name] = {
                "outcome": "DIVERGE",
                "first_diffs": [["columns", gcols, wcols]],
            }
            print(f"DIVERGE {name}: columns {gcols} vs {wcols}")
        elif norm(got) == norm(want):
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
