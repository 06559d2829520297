#!/usr/bin/env python
"""Probe battery wave 28 (round-11): DuckDB CONVENIENCE DIALECT —
FROM-first syntax (`FROM t [SELECT ...]`), `* REPLACE (expr AS col)`
in-place star replacement, `COLUMNS('regex')` expansion (partial-search
semantics, verified), `USING SAMPLE n ROWS` (exact-count reservoir →
the TABLESAMPLE machinery), ORDER BY ALL composition with the new
forms, and the loud rejections (percent LIMIT, USING SAMPLE method
parens, COLUMNS in expression position, * REPLACE over a join). Same
rubric as waves 4-27.

Usage: python experiments/probe_battery_wave28.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation", "region"]

PROBES = {
    "from_first_full": (
        "FROM nation SELECT n_nationkey WHERE n_nationkey < 3 "
        "ORDER BY n_nationkey"
    ),
    "from_first_bare": "FROM region",
    "from_first_where_only": (
        "FROM nation WHERE n_regionkey = 2 ORDER BY n_nationkey"
    ),
    "from_first_subquery": (
        "SELECT t.n_nationkey FROM (FROM nation SELECT n_nationkey, "
        "n_regionkey WHERE n_regionkey < 2) t ORDER BY t.n_nationkey"
    ),
    "star_replace_inplace": (
        "SELECT * REPLACE (n_regionkey + 100 AS n_regionkey) "
        "FROM nation WHERE n_nationkey < 3 ORDER BY n_nationkey"
    ),
    "star_replace_two_cols": (
        "SELECT * REPLACE (upper(n_name) AS n_name, n_regionkey * 2 AS "
        "n_regionkey) FROM nation WHERE n_nationkey < 3 "
        "ORDER BY n_nationkey"
    ),
    "star_replace_derived": (
        "SELECT * REPLACE (k + 1 AS k) FROM (SELECT n_nationkey AS k, "
        "n_name FROM nation) d ORDER BY k LIMIT 4"
    ),
    "columns_regex_partial": (
        "SELECT columns('key') FROM nation WHERE n_nationkey < 3 "
        "ORDER BY n_nationkey"
    ),
    "columns_regex_anchored": (
        "SELECT n_nationkey, columns('^n_name$') FROM nation "
        "WHERE n_nationkey < 3 ORDER BY n_nationkey"
    ),
    "using_sample_rows_count": (
        "SELECT count(*) AS n FROM (SELECT * FROM nation "
        "USING SAMPLE 7 ROWS) t"
    ),
    "using_sample_bare_number": (
        "SELECT count(*) AS n FROM (SELECT * FROM nation USING SAMPLE 5) t"
    ),
    "order_by_all_from_first": (
        "FROM nation SELECT n_regionkey, n_nationkey "
        "WHERE n_nationkey < 6 ORDER BY ALL"
    ),
    "limit_percent_rejects": (
        "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 10%"
    ),
    "columns_in_expression_rejects": (
        "SELECT min(columns('key')) FROM nation"
    ),
    "star_replace_join_rejects": (
        "SELECT * REPLACE (n_regionkey + 1 AS n_regionkey) FROM nation "
        "LEFT JOIN region ON r_regionkey = n_regionkey"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave28.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave28", cpus=8, shuffle_partitions=8)
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
