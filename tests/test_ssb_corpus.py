"""The Star Schema Benchmark corpus (O'Neil et al. 2009; ref
``workloads.py:1039``) shaped onto the fixture tables: all 13 queries
parse, round-trip, compile through the native pipeline, and match DuckDB
on the real sf0.001 parquet — a second real-workload family beyond
JOB-light, exercising multi-dimension star joins, EXTRACT-derived date
dimensions, duplicate dimension aliases (nation/region twice), and
aggregate ORDER BY."""

from __future__ import annotations

import pytest

from postbound_spark.plans.parser import parse_query, to_query_spec
from postbound_spark.workloads import ssb, ssb_shaped_corpus

CORPUS = ssb_shaped_corpus()


def test_corpus_size_matches_workload():
    assert len(CORPUS) == 13  # SSB's query count, 4 flights


def test_front_door_serves_shaped_fallback():
    assert len(ssb()) == 13


@pytest.mark.parametrize("sql", CORPUS.values(), ids=list(CORPUS))
def test_ssb_roundtrip_and_join_graph(sql):
    q = parse_query(sql)
    assert parse_query(q.to_sql()) == q, "parse -> to_sql -> parse not a fixpoint"
    spec = to_query_spec(q)
    # lineitem joins orders in every flight; flights 2-4 hang dimension
    # chains off it — every FROM table must appear in the join graph
    assert {"l", "o"} <= set(spec.tables)
    edge_tables = {tab for e in spec.edges for tab in e.tables()}
    assert set(spec.tables) <= edge_tables | {"l"}


def test_ssb_corpus_executes_and_matches_duckdb(spark, sf_small):
    """Every SSB query executes through parse -> relalg -> compile on the
    fixture parquet and matches DuckDB running the identical text on the
    identical files (the JOB-light regression pattern, now over a
    grouped-aggregate star workload instead of COUNT(*) chains)."""
    from postbound_spark.catalog import load_table
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.testing import (
        _float_columns,
        _normalize,
        _rows_close,
        duckdb_connection,
    )

    tables = (
        "lineitem", "orders", "customer", "supplier", "part", "nation", "region",
    )
    for t in tables:
        load_table(spark, sf_small, t).createOrReplaceTempView(t)

    failures = []
    with duckdb_connection(sf_small) as con:
        for label, sql in CORPUS.items():
            df = compile_plan(parse_relalg(parse_query(sql)), spark)
            got = df.toPandas()
            want = con.execute(sql).df()
            if sorted(got.columns) != sorted(want.columns):
                failures.append((label, "schema", list(got.columns), list(want.columns)))
                continue
            if len(got) != len(want):
                failures.append((label, "rows", len(got), len(want)))
                continue
            fc = _float_columns(got, want)
            diffs = [
                (l, r)
                for l, r in zip(_normalize(got, fc), _normalize(want, fc))
                if not _rows_close(l, r)
            ]
            if diffs:
                failures.append((label, "values", diffs[:2]))
    assert not failures, failures


def test_ssb_strategies_agree_on_grouped_results(spark, sf_small):
    """Join order is a performance choice, never a semantic one — now on
    GROUPED star queries, not just COUNT(*): every SSB query executed
    under the UES pessimistic order and the Postgres-style DP order must
    return exactly the native order's rows (which the DuckDB test above
    already verified)."""
    from postbound_spark.catalog import load_table
    from postbound_spark.experiments import _plan_order, _prepared_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query, to_query_spec

    base = {
        t: load_table(spark, sf_small, t)
        for t in (
            "lineitem", "orders", "customer", "supplier", "part",
            "nation", "region",
        )
    }
    for t, df in base.items():
        df.createOrReplaceTempView(t)

    from postbound_spark.testing import _float_columns, _normalize, _rows_close

    failures = []
    for label, sql in CORPUS.items():
        parsed = parse_query(sql)
        spec = to_query_spec(parsed)
        tables = _prepared_tables(parsed, base)
        native = compile_plan(parse_relalg(parsed), spark).toPandas()
        for strategy in ("ues", "pgdp"):
            order, _, _, _ = _plan_order(spark, strategy, parsed, spec, tables)
            forced = compile_plan(
                parse_relalg(parsed, join_order=list(order)), spark
            ).toPandas()
            # double SUMs accumulate in join-order-dependent sequence, so
            # compare with the oracle harness's float tolerance, not ==
            fc = _float_columns(native, forced)
            diffs = [
                (l, r)
                for l, r in zip(_normalize(native, fc), _normalize(forced, fc))
                if not _rows_close(l, r)
            ]
            if len(native) != len(forced) or diffs:
                failures.append((label, strategy, diffs[:2]))
    assert not failures, failures
