#!/usr/bin/env python
"""Probe battery wave 11 (round-11, closing sweep): the window-function
family (ntile, percent_rank, cume_dist, nth_value, lag defaults, lead
over DESC, first_value IGNORE NULLS in bounded frames), lateral column
aliases, TRY_CAST + if(), OFFSET without LIMIT, scientific-notation and
unary-plus literals, empty-string comparison, and the EXCLUDE
GROUP/TIES peer-window desugars. Same rubric as waves 4-10.

Usage: python experiments/probe_battery_wave11.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation", "region", "customer"]
FR = "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"

PROBES = {
    "ntile": (
        "SELECT n_nationkey, ntile(4) OVER (ORDER BY n_nationkey) AS q "
        "FROM nation ORDER BY n_nationkey"
    ),
    "percent_rank_cume_dist": (
        "SELECT n_nationkey, round(percent_rank() OVER (ORDER BY n_regionkey), 4) AS pr, "
        "round(cume_dist() OVER (ORDER BY n_regionkey), 4) AS cd "
        "FROM nation ORDER BY n_nationkey"
    ),
    "nth_value_full_frame": (
        "SELECT n_nationkey, nth_value(n_name, 2) OVER (PARTITION BY n_regionkey "
        "ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED "
        "FOLLOWING) AS second FROM nation ORDER BY n_nationkey"
    ),
    "lag_with_default": (
        "SELECT n_nationkey, lag(n_name, 2, 'none') OVER (ORDER BY n_nationkey) AS l2 "
        "FROM nation ORDER BY n_nationkey"
    ),
    "lead_over_desc": (
        "SELECT n_nationkey, lead(n_name, 1) OVER (ORDER BY n_nationkey DESC) AS nxt "
        "FROM nation ORDER BY n_nationkey"
    ),
    "first_value_ignore_nulls_frame": (
        "SELECT c_custkey, first_value(CASE WHEN c_custkey % 3 = 0 THEN NULL "
        "ELSE c_name END IGNORE NULLS) OVER (ORDER BY c_custkey "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS fv "
        "FROM customer WHERE c_custkey < 60 ORDER BY c_custkey"
    ),
    "exclude_group_running": (
        f"SELECT n_nationkey, CAST(sum(n_nationkey) OVER (ORDER BY n_regionkey "
        f"{FR} EXCLUDE GROUP) AS BIGINT) AS s FROM nation ORDER BY n_nationkey"
    ),
    "exclude_ties_running": (
        f"SELECT n_nationkey, CAST(sum(n_nationkey) OVER (ORDER BY n_regionkey "
        f"{FR} EXCLUDE TIES) AS BIGINT) AS s FROM nation ORDER BY n_nationkey"
    ),
    "lateral_column_alias_chain": (
        "SELECT n_nationkey AS x, x + 1 AS y, y * 2 AS z FROM nation "
        "WHERE n_nationkey < 6 ORDER BY x"
    ),
    "try_cast_edges": (
        "SELECT try_cast('12' AS INT) AS a, try_cast('xx' AS INT) AS b, "
        "try_cast('1.5' AS INT) AS r, try_cast(n_name AS INT) AS c "
        "FROM nation WHERE n_nationkey < 3 ORDER BY a"
    ),
    "if_predicate_arg": (
        "SELECT if(n_regionkey IN (1, 2) AND n_nationkey < 10, n_nationkey, -1) AS v "
        "FROM nation ORDER BY v, n_nationkey"
    ),
    "offset_without_limit": (
        "SELECT n_nationkey FROM nation ORDER BY n_nationkey OFFSET 20"
    ),
    "scientific_and_unary_plus": (
        "SELECT n_nationkey, +n_regionkey AS p FROM nation "
        "WHERE n_nationkey < 1e1 ORDER BY n_nationkey"
    ),
    "empty_string_compare": (
        "SELECT count(*) AS c FROM nation WHERE n_name > ''"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave11.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave11", cpus=8, shuffle_partitions=8)
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
