#!/usr/bin/env python
"""Probe battery wave 16 (round-11): JSON function parity —
json_extract_string/get_json_object, the ->> text-extraction arrow,
json_array_length, json_keys, nested and array paths, and the loud
rejections for the JSON-quoted forms (json_extract, bare ->). Same
rubric as waves 4-15.

Usage: python experiments/probe_battery_wave16.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation"]

J = """'{"name": "ann", "age": 7, "tags": ["x", "y"], "addr": {"city": "oslo"}}'"""

PROBES = {
    "json_extract_string_nested": (
        f"SELECT json_extract_string({J}, '$.addr.city') AS city, "
        f"json_extract_string({J}, '$.age') AS age "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "json_extract_string_bare_path": (
        f"SELECT json_extract_string({J}, 'name') AS nm "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "arrow_text_key": (
        f"SELECT {J} ->> 'name' AS nm, {J} ->> 'age' AS age "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "arrow_array_index": (
        "SELECT '[10, 20, 30]' ->> 1 AS second "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "json_array_length_fn": (
        f"SELECT CAST(json_array_length({J}, '$.tags') AS BIGINT) AS n2, "
        "CAST(json_array_length('[1,2,3]') AS BIGINT) AS n "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "json_keys_fn": (
        "SELECT CAST(json_keys('{\"a\": 1, \"b\": 2}') AS STRING) AS ks "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "json_missing_key_null": (
        f"SELECT json_extract_string({J}, '$.zzz') AS missing "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "json_from_column_expr": (
        "SELECT n_nationkey, "
        "concat('{\"k\": ', n_regionkey, '}') ->> 'k' AS v "
        "FROM nation WHERE n_nationkey < 5 ORDER BY n_nationkey"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave16.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave16", cpus=8, shuffle_partitions=8)
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
