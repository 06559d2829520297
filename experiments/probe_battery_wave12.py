#!/usr/bin/env python
"""Probe battery wave 12 (round-11): GROUPS window frames — the SQL:2011
peer-group frame mode DuckDB runs natively and Spark lacks — after the
dense_rank/RANGE rewrite (plans/parser.py `_rewrite_groups_frame` /
`_desugar_groups`). Duplicate order keys (n_regionkey, o_orderstatus)
exercise the actual peer-group semantics; shapes cover both bound forms,
DESC and NULL-bearing orderings, frame-sensitive navigation functions,
EXCLUDE composition, star selects, named windows, QUALIFY interplay, and
subquery scoping. Same rubric as waves 4-11.

Usage: python experiments/probe_battery_wave12.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation", "region", "customer", "orders"]

G1 = "GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW"

PROBES = {
    # running peer-group sum: each row sees its own full peer group plus
    # the previous one — differs from both ROWS and RANGE-over-values
    "groups_running": (
        f"SELECT n_nationkey, CAST(sum(n_nationkey) OVER (ORDER BY "
        f"n_regionkey {G1}) AS BIGINT) AS s FROM nation ORDER BY n_nationkey"
    ),
    "groups_between_pre_fol": (
        "SELECT n_nationkey, count(*) OVER (ORDER BY n_regionkey "
        "GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS c "
        "FROM nation ORDER BY n_nationkey"
    ),
    "groups_unbounded_pre": (
        "SELECT n_nationkey, CAST(sum(n_nationkey) OVER (ORDER BY "
        "n_regionkey GROUPS UNBOUNDED PRECEDING) AS BIGINT) AS s "
        "FROM nation ORDER BY n_nationkey"
    ),
    "groups_current_row_only": (
        # CURRENT ROW..CURRENT ROW in GROUPS mode = the whole peer group
        "SELECT n_nationkey, count(*) OVER (ORDER BY n_regionkey "
        "GROUPS BETWEEN CURRENT ROW AND CURRENT ROW) AS peer_n "
        "FROM nation ORDER BY n_nationkey"
    ),
    "groups_current_to_unbounded": (
        "SELECT n_nationkey, CAST(sum(n_nationkey) OVER (ORDER BY "
        "n_regionkey GROUPS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) "
        "AS BIGINT) AS s FROM nation ORDER BY n_nationkey"
    ),
    "groups_following_only": (
        "SELECT n_nationkey, count(*) OVER (ORDER BY n_regionkey "
        "GROUPS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS c "
        "FROM nation ORDER BY n_nationkey"
    ),
    "groups_desc_order": (
        f"SELECT n_nationkey, count(*) OVER (ORDER BY n_regionkey DESC "
        f"{G1}) AS c FROM nation ORDER BY n_nationkey"
    ),
    "groups_partitioned": (
        "SELECT o_orderkey, count(*) OVER (PARTITION BY o_orderpriority "
        "ORDER BY o_orderstatus GROUPS BETWEEN 1 PRECEDING AND CURRENT "
        "ROW) AS c FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey"
    ),
    "groups_null_keys": (
        # NULL order keys form ONE peer group; placement must match the
        # engine's NULLS LAST default on both sides
        f"SELECT c_custkey, count(*) OVER (ORDER BY CASE WHEN c_custkey % 5 "
        f"= 0 THEN NULL ELSE c_nationkey END {G1}) AS c "
        f"FROM customer WHERE c_custkey < 80 ORDER BY c_custkey"
    ),
    "groups_first_value": (
        # navigation over a GROUPS frame — positional, so the peer-index
        # rewrite must preserve within-frame row membership
        "SELECT n_nationkey, min(n_name) OVER (ORDER BY n_regionkey "
        "GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS mn "
        "FROM nation ORDER BY n_nationkey"
    ),
    "groups_two_windows": (
        # two distinct GROUPS specs → two peer-index columns
        f"SELECT n_nationkey, count(*) OVER (ORDER BY n_regionkey {G1}) "
        f"AS a, count(*) OVER (ORDER BY n_name GROUPS BETWEEN CURRENT ROW "
        f"AND 1 FOLLOWING) AS b FROM nation ORDER BY n_nationkey"
    ),
    "groups_shared_spec": (
        # same spec reused → ONE peer-index column feeds both calls
        f"SELECT n_nationkey, count(*) OVER (ORDER BY n_regionkey {G1}) "
        f"AS a, CAST(sum(n_nationkey) OVER (ORDER BY n_regionkey {G1}) "
        f"AS BIGINT) AS b FROM nation ORDER BY n_nationkey"
    ),
    "groups_star_select": (
        f"SELECT * , count(*) OVER (ORDER BY r_regionkey {G1}) AS c "
        f"FROM region ORDER BY r_regionkey"
    ),
    "groups_named_window": (
        "SELECT n_nationkey, count(*) OVER w AS c FROM nation "
        "WINDOW w AS (ORDER BY n_regionkey GROUPS BETWEEN 1 PRECEDING "
        "AND CURRENT ROW) ORDER BY n_nationkey"
    ),
    "groups_exclude_current_row": (
        f"SELECT n_nationkey, CAST(sum(n_nationkey) OVER (ORDER BY "
        f"n_regionkey {G1} EXCLUDE CURRENT ROW) AS BIGINT) AS s "
        f"FROM nation ORDER BY n_nationkey"
    ),
    "groups_exclude_group": (
        f"SELECT n_nationkey, CAST(sum(n_nationkey) OVER (ORDER BY "
        f"n_regionkey {G1} EXCLUDE GROUP) AS BIGINT) AS s "
        f"FROM nation ORDER BY n_nationkey"
    ),
    "groups_exclude_ties": (
        f"SELECT n_nationkey, CAST(sum(n_nationkey) OVER (ORDER BY "
        f"n_regionkey {G1} EXCLUDE TIES) AS BIGINT) AS s "
        f"FROM nation ORDER BY n_nationkey"
    ),
    "groups_qualify": (
        f"SELECT n_nationkey, count(*) OVER (ORDER BY n_regionkey {G1}) "
        f"AS c FROM nation QUALIFY c > 6 ORDER BY n_nationkey"
    ),
    "groups_in_subquery": (
        f"SELECT x, c FROM (SELECT n_nationkey AS x, count(*) OVER "
        f"(ORDER BY n_regionkey {G1}) AS c FROM nation) sub "
        f"WHERE c > 6 ORDER BY x"
    ),
    "groups_where_filter": (
        # peer index must be computed AFTER the WHERE filter
        f"SELECT n_nationkey, count(*) OVER (ORDER BY n_regionkey {G1}) "
        f"AS c FROM nation WHERE n_nationkey % 2 = 0 ORDER BY n_nationkey"
    ),
    "groups_multi_order_keys": (
        "SELECT c_custkey, count(*) OVER (ORDER BY c_nationkey, "
        "c_mktsegment GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS c "
        "FROM customer WHERE c_custkey < 120 ORDER BY c_custkey"
    ),
    "groups_with_limit": (
        # windows evaluate over the FULL filtered set, THEN order/limit
        f"SELECT n_nationkey, count(*) OVER (ORDER BY n_regionkey {G1}) "
        f"AS c FROM nation ORDER BY n_nationkey LIMIT 7"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave12.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave12", cpus=8, shuffle_partitions=8)
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
        # DuckDB in this container has no GROUPS mode ("not implemented
        # yet") — the oracle runs the engine's own desugared RENDER
        # (dense_rank CTE + RANGE over the peer index), which DuckDB
        # executes fine. This pins Spark-executes-desugar ==
        # DuckDB-executes-desugar (null ordering, frame clipping, peer
        # aggregation); the REWRITE's own correctness is pinned
        # independently by the pure-Python peer-group reference in
        # tests/test_groups_frames.py.
        try:
            oracle_sql = parse_query(sql, schema=schema).to_sql()
            # dialect shim: Spark star-pruning spells `* EXCEPT (...)`,
            # DuckDB spells `* EXCLUDE (...)`
            oracle_sql = oracle_sql.replace("* EXCEPT (", "* EXCLUDE (")
        except Exception as exc:
            results[name] = {"outcome": "REJECT", "detail": str(exc)[:200]}
            print(f"REJECT {name}: {str(exc)[:120]}")
            continue
        try:
            want = con.execute(oracle_sql).fetchall()
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
