#!/usr/bin/env python
"""Probe battery wave 20 (round-11): PATTERN-MATCHING and lexical edges
— LIKE ESCAPE clauses, regexp_matches/regexp_full_match lowering to
RLIKE (partial vs anchored, flags, negation, inside scalar subqueries —
the lowered text must re-parse), numeric underscore separators, SIMILAR
TO negation, regexp_extract groups. Quoted-identifier mangling is
pinned as a parse-time REJECT in tests/test_parser.py. Same rubric as
waves 4-19.

Usage: python experiments/probe_battery_wave20.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
TABLES = ["nation"]

PROBES = {
    "like_escape_clause": (
        "SELECT count(*) AS c FROM nation WHERE n_name LIKE '%!_%' "
        "ESCAPE '!'"
    ),
    "like_escape_no_match": (
        "SELECT count(*) AS c FROM nation WHERE n_name LIKE '%!%x%' "
        "ESCAPE '!'"
    ),
    "underscore_numeric": (
        "SELECT 1_000_000 AS n, 1_0.5 AS d FROM nation "
        "WHERE n_nationkey = 0"
    ),
    "underscore_in_where": (
        "SELECT count(*) AS c FROM nation WHERE n_nationkey < 1_2"
    ),
    "regexp_matches_fn": (
        "SELECT count(*) AS c FROM nation "
        "WHERE regexp_matches(n_name, 'NATION_[0-9]+')"
    ),
    "regexp_matches_flag_i": (
        "SELECT count(*) AS c FROM nation "
        "WHERE regexp_matches(n_name, 'nation', 'i')"
    ),
    "not_regexp_matches": (
        "SELECT count(*) AS c FROM nation "
        "WHERE NOT regexp_matches(n_name, '_1')"
    ),
    "regexp_full_match_anchored": (
        # single-digit pattern matches only NATION_0..9 under FULL match
        "SELECT count(*) AS c FROM nation "
        "WHERE regexp_full_match(n_name, 'NATION_[0-9]')"
    ),
    "regexp_full_match_in_subquery": (
        # the lowered RLIKE text must survive the scalar-subquery
        # re-parse (wave-20 find: RLIKE was not in the grammar)
        "SELECT count(*) AS a, (SELECT count(*) FROM nation WHERE "
        "regexp_full_match(n_name, 'NATION_[0-9]')) AS b FROM nation "
        "WHERE regexp_full_match(n_name, 'NATION_[0-9]+')"
    ),
    "similar_to_negated": (
        "SELECT count(*) AS c FROM nation "
        "WHERE n_name NOT SIMILAR TO 'NATION_[0-9]+'"
    ),
    "regexp_extract_group": (
        "SELECT regexp_extract(n_name, 'NATION_([0-9]+)', 1) AS num "
        "FROM nation WHERE n_nationkey < 3 ORDER BY num"
    ),
    "regexp_replace_global": (
        "SELECT regexp_replace(n_name, '[0-9]', '#', 'g') AS masked "
        "FROM nation WHERE n_nationkey < 3 ORDER BY masked"
    ),
}


def main() -> int:
    out = "experiments/results/probe_battery_wave20.json"
    import duckdb

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark

    spark = get_spark("probe-wave20", cpus=8, shuffle_partitions=8)
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
