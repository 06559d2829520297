#!/usr/bin/env python
"""Probe battery wave 23 (round-11): the LIST/ARRAY function family —
DuckDB bracket literals (`[1,2,3]`), list_value, list_sort /
list_reverse_sort null placement, len() over lists and strings,
append/prepend/concat and the array `||` overload, position/indexof
missing-element encodings, list_distinct NULL-dropping, list_unique,
list_has_any/list_has_all, list_min/max/sum/avg, flatten,
list_reverse, array_slice function spelling, array comparisons and
arrays as GROUP BY keys. Same rubric as waves 4-22: every probe is
DuckDB-valid; DIVERGE = silent-wrong-results; every DIVERGE/ERROR is
closed same-session or documented loud.

Usage: python experiments/probe_battery_wave23.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation"]

PROBES = {
    "bracket_list_literal": (
        "SELECT [1, 2, 3] AS a, ['x', 'y'] AS b FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "bracket_list_of_columns": (
        "SELECT n_nationkey, [n_nationkey, n_regionkey] AS pair "
        "FROM nation WHERE n_nationkey < 3 ORDER BY n_nationkey"
    ),
    "list_value_ctor": (
        "SELECT list_value(1, 2, NULL) AS a FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "list_sort_nulls_last": (
        "SELECT list_sort([3, 1, NULL, 2]) AS a FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "list_reverse_sort": (
        "SELECT list_reverse_sort([3, 1, NULL, 2]) AS a FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "list_sort_direction_args": (
        "SELECT list_sort([3, 1, NULL], 'DESC') AS a, "
        "list_sort([3, 1, NULL], 'ASC') AS b FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "len_list_and_string": (
        "SELECT len([1, 2, 3]) AS a, len(n_name) AS b FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "list_append_prepend_concat": (
        "SELECT list_append([1, 2], 3) AS a, "
        "list_prepend(0, [1, 2]) AS b, "
        "list_concat([1], [2, 3]) AS c FROM nation WHERE n_nationkey = 0"
    ),
    "array_pipe_concat": (
        "SELECT [1, 2] || [3] AS a, [n_nationkey] || [n_regionkey] AS b "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "list_position_missing": (
        "SELECT list_position([4, 5, 6], 5) AS a, "
        "list_indexof([4, 5, 6], 7) AS b FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "list_contains_null_probe": (
        "SELECT list_contains([1, 2], 2) AS a, "
        "list_contains([1, 2], 3) AS b, "
        "list_contains([1, NULL], 3) AS c FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "list_distinct_drops_nulls": (
        "SELECT list_sort(list_distinct([1, 1, NULL, 2, NULL])) AS a "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "list_unique_count": (
        "SELECT list_unique([1, 1, NULL, 2]) AS a, "
        "list_unique([NULL, NULL]) AS b FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "list_has_any_all": (
        "SELECT list_has_any([1, 2], [2, 3]) AS a, "
        "list_has_any([1, 2], [3, 4]) AS b, "
        "list_has_all([1, 2, 3], [2, 3]) AS c, "
        "list_has_all([1, 2], [2, 9]) AS d FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "list_min_max": (
        "SELECT list_min([3, 1, NULL]) AS a, list_max([3, 1, NULL]) AS b "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "list_sum_avg": (
        "SELECT list_sum([1, 2, NULL]) AS a, list_avg([1, 2, NULL]) AS b "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "flatten_nested": (
        "SELECT flatten([[1], [2, 3], []]) AS a FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "list_reverse_fn": (
        "SELECT list_reverse([1, 2, 3]) AS a FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "array_slice_fn": (
        "SELECT array_slice([1, 2, 3, 4], 2, 3) AS a, "
        "array_slice([1, 2, 3, 4], 2, 99) AS b FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "array_comparisons": (
        "SELECT ([1, 2] < [1, 3]) AS a, ([1, 2] = [1, 2]) AS b, "
        "([2] > [1, 9]) AS c FROM nation WHERE n_nationkey = 0"
    ),
    "group_by_array_key": (
        "SELECT [n_regionkey] AS k, count(*) AS n FROM nation "
        "GROUP BY [n_regionkey] ORDER BY k"
    ),
    "order_by_array": (
        "SELECT n_nationkey FROM nation "
        "ORDER BY [n_regionkey, n_nationkey] LIMIT 5"
    ),
    "subscript_still_works": (
        "SELECT ([10, 20, 30])[2] AS a, [10, 20][9] AS b FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "list_lambda_rejects": (
        "SELECT list_transform([1, 2], x -> x + 1) AS a FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "unnest_bracket_literal": (
        "SELECT unnest([7, 8, 9]) AS v FROM nation WHERE n_nationkey = 0"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave23.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave23", cpus=8, shuffle_partitions=8)
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
