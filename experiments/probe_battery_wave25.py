#!/usr/bin/env python
"""Probe battery wave 25 (round-11): STRUCT family — DuckDB brace
literals ({'a': 1}), struct_pack(k := v), struct_extract, dot field
access (parenthesized-expression base, derived-table column base, and
the three-part t.s.k spelling), nested structs, structs in
comparisons / GROUP BY / ORDER BY, struct arrays through unnest, and
the loud rejections (MAP literals, non-identifier keys). Structs are
never selected raw (DuckDB fetches dicts, Spark Rows — formats
diverge); probes always extract fields. Same rubric as waves 4-24.

Usage: python experiments/probe_battery_wave25.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation"]

PROBES = {
    "struct_literal_fields": (
        "SELECT ({'a': 1, 'b': 'x'}).a AS a, ({'a': 1, 'b': 'x'}).b AS b "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "struct_pack_fields": (
        "SELECT (struct_pack(a := n_nationkey, b := n_name)).a AS a "
        "FROM nation WHERE n_nationkey < 3 ORDER BY a"
    ),
    "struct_extract_fn": (
        "SELECT struct_extract({'k': n_regionkey}, 'k') AS v "
        "FROM nation WHERE n_nationkey < 3 ORDER BY v"
    ),
    "nested_struct_access": (
        "SELECT ({'o': {'i': n_nationkey + 1}}).o.i AS v FROM nation "
        "WHERE n_nationkey < 3 ORDER BY v"
    ),
    "derived_column_field_access": (
        "SELECT t.id, t.s.k AS k FROM (SELECT n_nationkey AS id, "
        "{'k': n_name} AS s FROM nation) t ORDER BY t.id LIMIT 4"
    ),
    "two_part_field_access": (
        "SELECT s.k AS k FROM (SELECT {'k': n_nationkey} AS s "
        "FROM nation) t ORDER BY k LIMIT 4"
    ),
    "struct_comparison": (
        "SELECT count(*) AS n FROM nation "
        "WHERE {'a': n_regionkey} = {'a': 2}"
    ),
    "struct_ordering": (
        "SELECT n_nationkey FROM nation "
        "WHERE {'a': n_regionkey, 'b': n_nationkey} < {'a': 2, 'b': 99} "
        "ORDER BY n_nationkey LIMIT 5"
    ),
    "struct_group_by_key": (
        "SELECT ({'r': n_regionkey}).r AS r, count(*) AS n FROM nation "
        "GROUP BY {'r': n_regionkey} ORDER BY r"
    ),
    "struct_in_case": (
        "SELECT CASE WHEN n_regionkey > 2 THEN {'v': 1} ELSE {'v': 0} "
        "END.v AS v FROM nation WHERE n_nationkey < 4 "
        "ORDER BY n_nationkey"
    ),
    "unnest_struct_array_two_step": (
        "SELECT d.id, d.u.k AS k, d.u.v AS v FROM ("
        "SELECT n_nationkey AS id, unnest([{'k': 'a', 'v': n_regionkey}, "
        "{'k': 'b', 'v': n_nationkey}]) AS u FROM nation "
        "WHERE n_nationkey < 2) d ORDER BY d.id, k"
    ),
    "unnest_field_access_rejects": (
        "SELECT (unnest([{'v': n_regionkey}])).v AS v FROM nation "
        "WHERE n_nationkey < 2"
    ),
    "struct_is_null": (
        "SELECT ({'a': 1}) IS NULL AS a, "
        "(CASE WHEN n_regionkey < 0 THEN {'a': 1} END) IS NULL AS b "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "map_literal_rejects": (
        "SELECT map {1: 'a'} AS m FROM nation WHERE n_nationkey = 0"
    ),
    "bad_struct_key_rejects": (
        "SELECT {'not a key!': 1} AS s FROM nation WHERE n_nationkey = 0"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave25.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave25", cpus=8, shuffle_partitions=8)
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
