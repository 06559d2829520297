#!/usr/bin/env python
"""Probe battery wave 6 (round-10): FUNCTION parity for the scalar
vocabulary LLM-pipeline queries lean on — hashing, string ops, regex,
date_trunc, unicode handling, type coercion in comparisons. A silent
divergence here would poison any oracle built over these functions.

Same rubric as waves 4/5. Usage: python experiments/probe_battery_wave6.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation", "orders", "documents"]

PROBES = {
    "md5_hex": (
        "SELECT n_name, md5(n_name) AS h FROM nation ORDER BY n_name"
    ),
    "sha256_hex": (
        "SELECT n_name, sha256(n_name) AS h FROM nation ORDER BY n_name"
    ),
    "concat_ws_nulls": (
        "SELECT n_name, concat_ws('-', n_name, NULL, CAST(n_regionkey AS STRING)) AS c "
        "FROM nation ORDER BY n_name"
    ),
    "pad_functions": (
        "SELECT n_name, lpad(n_name, 12, '.') AS l, rpad(n_name, 12, '.') AS r "
        "FROM nation ORDER BY n_name"
    ),
    "string_case_len": (
        "SELECT n_name, upper(lower(n_name)) AS u, length(n_name) AS len, "
        "reverse(n_name) AS rev FROM nation ORDER BY n_name"
    ),
    "regexp_replace_groups": (
        # 'g' flag required (flagless = first-match on Postgres/DuckDB,
        # inexpressible in Spark - clean reject); \1 backrefs lower to $1
        "SELECT n_name, regexp_replace(n_name, '([A-Z])_', '\\1#', 'g') AS r "
        "FROM nation ORDER BY n_name"
    ),
    "regexp_replace_flagless_rejects": (
        "SELECT regexp_replace(n_name, 'N', 'X') AS r FROM nation"
    ),
    "like_vs_regex_escape": (
        "SELECT n_name FROM nation WHERE n_name LIKE '%\\_1%' ESCAPE '\\' "
        "ORDER BY n_name"
    ),
    "date_trunc_week_month": (
        "SELECT o_orderkey, CAST(date_trunc('week', o_orderdate) AS DATE) AS w, "
        "CAST(date_trunc('month', o_orderdate) AS DATE) AS m "
        "FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey"
    ),
    "strftime_like_format": (
        "SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y, "
        "CAST(month(o_orderdate) AS INT) AS mo, CAST(day(o_orderdate) AS INT) AS d "
        "FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey"
    ),
    "implicit_string_int_compare": (
        "SELECT n_name FROM nation WHERE CAST(n_regionkey AS STRING) = '2' "
        "AND n_regionkey = CAST('2' AS INT) ORDER BY n_name"
    ),
    "greatest_least_nulls": (
        "SELECT n_nationkey, greatest(n_nationkey, n_regionkey, 5) AS g, "
        "least(n_nationkey, n_regionkey) AS l FROM nation ORDER BY n_nationkey"
    ),
    "nullif_coalesce_chain": (
        "SELECT n_nationkey, coalesce(nullif(n_regionkey, 2), -1) AS c "
        "FROM nation ORDER BY n_nationkey"
    ),
    "unicode_substring_docs": (
        "SELECT doc_id, length(text) AS len, substring(text, 3, 7) AS s "
        "FROM documents WHERE doc_id < 40 ORDER BY doc_id"
    ),
    "repeat_space_trim": (
        "SELECT n_nationkey, repeat('ab', CAST(n_regionkey AS INT)) AS r, "
        "trim('  x  ') AS t FROM nation ORDER BY n_nationkey"
    ),
    "abs_sign_power": (
        # CAST the sign: Spark returns DOUBLE where DuckDB returns INT
        "SELECT n_nationkey, abs(n_regionkey - 2) AS a, CAST(sign(n_regionkey - 2) AS INT) AS s, "
        "CAST(power(2, n_regionkey) AS BIGINT) AS p FROM nation ORDER BY n_nationkey"
    ),
    "log_sqrt_floor_ceil": (
        "SELECT n_nationkey, round(ln(n_nationkey + 1), 6) AS l, "
        "round(sqrt(n_nationkey), 6) AS sq, CAST(floor(n_nationkey / 3.0) AS DOUBLE) AS f, "
        "CAST(ceil(n_nationkey / 3.0) AS DOUBLE) AS c FROM nation ORDER BY n_nationkey"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave6.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave6", cpus=8, shuffle_partitions=8)
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
    counts = {}
    for r in results.values():
        counts[r["outcome"]] = counts.get(r["outcome"], 0) + 1
    with open(out, "w") as f:
        json.dump({"counts": counts, "probes": results}, f, indent=2)
    print("wrote", out, counts)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
