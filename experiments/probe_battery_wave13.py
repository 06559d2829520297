#!/usr/bin/env python
"""Probe battery wave 13 (round-11): built-in FUNCTION parity edges —
string and numeric builtins where Spark and DuckDB are known to diverge
on NULL handling, boundary arguments, or typing (concat NULL-skipping,
negative substr/left/right, split_part bounds, greatest/least NULLs,
modulo sign, numeric trunc, keyword substring, integer //). Same rubric
as waves 4-12: every DIVERGE/ERROR is closed same-session or documented
loud.

Usage: python experiments/probe_battery_wave13.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation"]

PROBES = {
    # concat(): DuckDB SKIPS NULL arguments, Spark propagates NULL
    "concat_null_skip": (
        "SELECT n_nationkey, concat(n_name, NULL, '!') AS c "
        "FROM nation WHERE n_nationkey < 3 ORDER BY n_nationkey"
    ),
    "concat_operator_null": (
        "SELECT n_nationkey, n_name || NULL AS c "
        "FROM nation WHERE n_nationkey < 3 ORDER BY n_nationkey"
    ),
    "concat_ws_null": (
        "SELECT concat_ws('-', 'a', NULL, 'b') AS c FROM nation "
        "WHERE n_nationkey = 0"
    ),
    # substr boundaries: start 0, negative start, keyword form
    "substr_zero_start": (
        "SELECT n_nationkey, substr(n_name, 0, 3) AS s FROM nation "
        "WHERE n_nationkey < 3 ORDER BY n_nationkey"
    ),
    "substr_negative_start": (
        "SELECT n_nationkey, substr(n_name, -3) AS s FROM nation "
        "WHERE n_nationkey < 3 ORDER BY n_nationkey"
    ),
    "substring_keyword_form": (
        "SELECT n_nationkey, substring(n_name FROM 2 FOR 3) AS s "
        "FROM nation WHERE n_nationkey < 3 ORDER BY n_nationkey"
    ),
    # left/right with negative counts: DuckDB = all-but-|n| semantics
    "left_negative": (
        "SELECT n_nationkey, left(n_name, -2) AS s FROM nation "
        "WHERE n_nationkey < 3 ORDER BY n_nationkey"
    ),
    "right_negative": (
        "SELECT n_nationkey, right(n_name, -2) AS s FROM nation "
        "WHERE n_nationkey < 3 ORDER BY n_nationkey"
    ),
    "split_part_bounds": (
        "SELECT split_part('a-b-c', '-', 2) AS mid, "
        "split_part('a-b-c', '-', 9) AS oob FROM nation WHERE n_nationkey = 0"
    ),
    "lpad_truncates": (
        "SELECT lpad(n_name, 4, '.') AS s, rpad(n_name, 3, '.') AS r "
        "FROM nation WHERE n_nationkey < 3 ORDER BY s"
    ),
    "repeat_zero": (
        "SELECT repeat('ab', 0) AS z, repeat('ab', 3) AS r FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "translate_fn": (
        "SELECT translate(n_name, 'AEI', 'aei') AS t FROM nation "
        "WHERE n_nationkey < 3 ORDER BY t"
    ),
    "position_keyword": (
        "SELECT n_nationkey, position('A' IN n_name) AS p FROM nation "
        "WHERE n_nationkey < 5 ORDER BY n_nationkey"
    ),
    "greatest_least_nulls": (
        "SELECT greatest(1, NULL, 3) AS g, least(2, NULL) AS l "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "mod_sign": (
        "SELECT (-7) % 3 AS a, 7 % (-3) AS b, mod(-7, 3) AS c "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "int_div_operator": (
        # CAST both sides: DuckDB types `//` INTEGER, the lowering BIGINT
        "SELECT CAST(7 // 2 AS BIGINT) AS a, CAST((-7) // 2 AS BIGINT) "
        "AS b, CAST(n_nationkey // 3 AS BIGINT) AS c FROM nation "
        "WHERE n_nationkey < 5 ORDER BY c, a"
    ),
    "numeric_trunc": (
        # CAST both sides: DuckDB types DECIMAL-literal trunc DECIMAL(p,0)
        "SELECT CAST(trunc(2.7) AS DOUBLE) AS a, "
        "CAST(trunc(-2.7) AS DOUBLE) AS b FROM nation WHERE n_nationkey = 0"
    ),
    "round_half_negative": (
        "SELECT round(2.5) AS a, round(-2.5) AS b, round(2.345, 2) AS c "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "chr_ascii": (
        "SELECT chr(65) AS a, ascii('B') AS b FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "md5_hash": (
        "SELECT md5('abc') AS h FROM nation WHERE n_nationkey = 0"
    ),
    "reverse_string": (
        "SELECT reverse(n_name) AS r FROM nation WHERE n_nationkey < 3 "
        "ORDER BY r"
    ),
    "length_variants": (
        "SELECT length('') AS a, length(CAST(NULL AS STRING)) AS b "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "substr_negative_length": (
        "SELECT substr(n_name, 1, -1) AS a, substr(n_name, 3, 0) AS b "
        "FROM nation WHERE n_nationkey < 3 ORDER BY n_nationkey"
    ),
    "substr_expression_start": (
        "SELECT n_nationkey, substr(n_name, n_nationkey - 1, 4) AS s "
        "FROM nation WHERE n_nationkey < 4 ORDER BY n_nationkey"
    ),
    "concat_numeric_args": (
        "SELECT concat(n_name, '#', n_regionkey) AS c FROM nation "
        "WHERE n_nationkey < 3 ORDER BY c"
    ),
    "left_right_expression_count": (
        "SELECT n_nationkey, left(n_name, n_nationkey - 2) AS l, "
        "right(n_name, n_nationkey - 2) AS r FROM nation "
        "WHERE n_nationkey < 5 ORDER BY n_nationkey"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave13.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave13", cpus=8, shuffle_partitions=8)
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
