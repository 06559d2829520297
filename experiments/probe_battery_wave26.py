#!/usr/bin/env python
"""Probe battery wave 26 (round-11): STRING-function edges — unicode
case folding / reverse / length, keyword TRIM(BOTH|LEADING|TRAILING ...
FROM ...) and POSITION(x IN y) and SUBSTRING(s FROM i FOR n) forms,
2-arg ltrim/rtrim ARGUMENT ORDER (Spark's is reversed — keyword-form
lowering), 2-arg regexp_extract DEFAULT GROUP (DuckDB 0 = whole match,
Spark 1 — silent divergence), empty-pattern replace, negative/overflow
split_part, pad/repeat boundary arguments, chr/ascii/unicode
codepoints, contains/ends_with naming, levenshtein, printf parity, and
the loud rejections (format-fmt, jaro/jaccard/hamming). Same rubric as
waves 4-25.

Usage: python experiments/probe_battery_wave26.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation"]

PROBES = {
    "unicode_case_fold": (
        "SELECT upper('héllo') AS a, lower('ÉØ') AS b, "
        "reverse('héllo') AS c, length('héllo') AS d "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "keyword_trim_forms": (
        "SELECT TRIM(BOTH 'x' FROM 'xxaxx') AS a, "
        "TRIM(LEADING 'xy' FROM 'yxab') AS b, "
        "TRIM(TRAILING 'x' FROM 'axx') AS c, trim('  a  ') AS d "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "ltrim_rtrim_arg_order": (
        "SELECT ltrim('xxabxx', 'x') AS a, rtrim('xxabxx', 'x') AS b, "
        "ltrim('  a') AS c FROM nation WHERE n_nationkey = 0"
    ),
    "position_keyword_and_strpos": (
        "SELECT position('l' IN 'hello') AS a, strpos('hello', 'l') AS b, "
        "instr('hello', 'z') AS c, position('T' IN n_name) AS d "
        "FROM nation WHERE n_nationkey < 3 ORDER BY n_nationkey"
    ),
    "substring_from_for": (
        "SELECT substring('héllo' FROM 2 FOR 3) AS a, "
        "substring(n_name FROM 8) AS b FROM nation "
        "WHERE n_nationkey < 3 ORDER BY n_nationkey"
    ),
    "regexp_extract_default_group": (
        "SELECT regexp_extract('a1b22', '([a-z])([0-9]+)') AS whole, "
        "regexp_extract('a1b22', '([a-z])([0-9]+)', 2) AS g2, "
        "regexp_extract('zzz', '([0-9]+)') AS miss "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "replace_empty_pattern": (
        "SELECT replace('abc', '', '-') AS a, replace('aaa', 'a', '') AS b "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "split_part_bounds": (
        "SELECT split_part('a,b,c', ',', -1) AS a, "
        "split_part('a,b,c', ',', 9) AS b, "
        "split_part('abc', ',', 1) AS c FROM nation WHERE n_nationkey = 0"
    ),
    "pad_repeat_bounds": (
        "SELECT lpad('ab', 5, 'xy') AS a, rpad('ab', 1, 'x') AS b, "
        "lpad('ab', 0, 'x') AS c, lpad('abc', -1, 'x') AS d, "
        "repeat('ab', 0) AS e, repeat('ab', -1) AS f "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "chr_ascii_unicode": (
        "SELECT chr(65) AS a, ascii('A') AS b, unicode('é') AS c "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "contains_ends_with": (
        "SELECT contains('hello', 'ell') AS a, ends_with('hello', 'lo') "
        "AS b, starts_with('hello', 'he') AS c "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "levenshtein_distance": (
        "SELECT levenshtein('kitten', 'sitting') AS a, "
        "levenshtein(n_name, 'NATION_1') AS b FROM nation "
        "WHERE n_nationkey < 3 ORDER BY n_nationkey"
    ),
    "printf_parity": (
        "SELECT printf('%s-%d', n_name, n_nationkey) AS a FROM nation "
        "WHERE n_nationkey < 3 ORDER BY n_nationkey"
    ),
    "translate_dup_chars": (
        "SELECT translate('abcba', 'ab', 'x') AS a, "
        "translate('abc', 'abc', 'cba') AS b "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "concat_ws_nulls": (
        "SELECT concat_ws('-', 'a', NULL, 'b') AS a "
        "FROM nation WHERE n_nationkey = 0"
    ),
    "format_fmt_rejects": (
        "SELECT format('{} and {}', 1, 'x') AS a FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "jaro_rejects": (
        "SELECT jaro_winkler_similarity('duck', 'luck') AS a FROM nation "
        "WHERE n_nationkey = 0"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave26.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave26", cpus=8, shuffle_partitions=8)
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
