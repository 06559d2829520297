"""Seed-robust soak of the differential execution fuzzer.

Runs the SAME strategy and comparison as
``tests/test_differential_fuzz.py`` for N fresh-seed examples (default
1000) — far beyond the cheap 30-example CI setting — so grammar
widenings are validated against a deep sample before they ship. The
round-7 verdict showed the CI-size run was not seed-robust (the NOT(OR)
partial-binding bug survived ~2,900 committed examples); this soak is
the required gate after every grammar or placement change.

Usage::

    python scripts/soak_fuzz.py [N]

Prints progress every 100 examples and every divergence immediately;
exit code 1 on any divergence.
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import duckdb
from hypothesis import HealthCheck, given, seed, settings

from postbound_spark.operators.compiler import compile_plan
from postbound_spark.plans.algebra import parse_relalg
from postbound_spark.plans.parser import parse_query
from test_differential_fuzz import (TABLES, _duck_text, _norm,
                                    _same_result, sql_query)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    sf_dir = "/root/testdata/sf0.001"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        spark.read.parquet(path).createOrReplaceTempView(t)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    state = {"ok": 0, "fail": 0}

    @settings(
        max_examples=n,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(sql=sql_query())
    def soak(sql: str) -> None:
        got = compile_plan(
            parse_relalg(parse_query(sql, schema=TABLES)), spark
        ).collect()
        want = con.execute(_duck_text(sql)).fetchall()
        if not _same_result(sql, got, want):
            state["fail"] += 1
            print(
                f"DIVERGENCE: {sql}\n  spark={_norm(got)[:5]}\n"
                f"  duck ={_norm(want)[:5]}"
            )
            raise AssertionError(sql)
        state["ok"] += 1
        if state["ok"] % 100 == 0:
            print(f"  {state['ok']}/{n} clean", flush=True)

    try:
        soak()
    finally:
        print(f"soak: {state['ok']} clean, {state['fail']} divergent")
        spark.stop()
    return 1 if state["fail"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
