#!/usr/bin/env python
"""Probe battery wave 31 (round-11): ORDERED/STATISTICAL aggregates —
first/last with in-call ORDER BY (→ min_by/max_by over a null-marker
struct; NULL keys sort LAST so they LOSE for the traversal-start picker
and WIN for the traversal-end one, matching DuckDB's in-call default),
kurtosis_pop (≡ Spark's kurtosis — verified), the SAMPLE-vs-POPULATION
skewness/kurtosis divergence (loud rejections: 4.27 vs 0.068 on a
5-row probe), mad/entropy/favg rejections, any_value/bit_count/
approx_count_distinct parity, and list(... ORDER BY) FILTER. Same
rubric as waves 4-30.

Usage: python experiments/probe_battery_wave31.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation", "orders"]

PROBES = {
    "first_last_ordered": (
        "SELECT n_regionkey, first(n_name ORDER BY n_nationkey) AS f, "
        "last(n_name ORDER BY n_nationkey) AS l FROM nation "
        "GROUP BY n_regionkey ORDER BY n_regionkey"
    ),
    "first_last_ordered_desc": (
        "SELECT n_regionkey, first(n_name ORDER BY n_nationkey DESC) "
        "AS f, last(n_name ORDER BY n_nationkey DESC) AS l FROM nation "
        "GROUP BY n_regionkey ORDER BY n_regionkey"
    ),
    "first_multikey": (
        "SELECT first(o_orderkey ORDER BY o_orderdate, o_orderkey) AS f, "
        "last(o_orderkey ORDER BY o_orderdate, o_orderkey) AS l "
        "FROM orders"
    ),
    "first_last_null_keys": (
        # exactly ONE NULL key — the tie-free shape (ties among equal
        # keys are arbitrary on BOTH engines)
        "SELECT last(n_name ORDER BY CASE WHEN n_nationkey = 7 THEN "
        "NULL ELSE n_nationkey END) AS l, first(n_name ORDER BY CASE "
        "WHEN n_nationkey = 7 THEN NULL ELSE n_nationkey END) AS f "
        "FROM nation"
    ),
    "first_last_null_keys_desc": (
        "SELECT last(n_name ORDER BY CASE WHEN n_nationkey = 7 THEN "
        "NULL ELSE n_nationkey END DESC) AS l, first(n_name ORDER BY "
        "CASE WHEN n_nationkey = 7 THEN NULL ELSE n_nationkey END DESC) "
        "AS f FROM nation"
    ),
    "kurtosis_pop_parity": (
        "SELECT round(kurtosis_pop(n_nationkey), 8) AS k FROM nation"
    ),
    "any_value_bitcount": (
        "SELECT any_value(n_regionkey) AS av, "
        "CAST(bit_count(CAST(7 AS BIGINT)) AS BIGINT) AS bc "
        "FROM nation WHERE n_nationkey = 3"
    ),
    "approx_distinct_small_exact": (
        # both sketches are exact at tiny cardinalities
        "SELECT CAST(approx_count_distinct(n_regionkey) AS BIGINT) AS a "
        "FROM nation"
    ),
    "list_ordered_filter": (
        "SELECT CAST(list(n_nationkey ORDER BY n_nationkey DESC) "
        "FILTER (WHERE n_regionkey = 0) AS STRING) AS l FROM nation"
    ),
    "kurtosis_sample_rejects": (
        "SELECT kurtosis(n_nationkey) AS k FROM nation"
    ),
    "skewness_sample_rejects": (
        "SELECT skewness(n_nationkey) AS s FROM nation"
    ),
    "mad_rejects": ("SELECT mad(n_nationkey) AS m FROM nation"),
    "entropy_rejects": ("SELECT entropy(n_regionkey) AS e FROM nation"),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave31.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave31", cpus=8, shuffle_partitions=8)
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
