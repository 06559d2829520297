"""The JOB-complex fixture corpus executes end-to-end against DuckDB.

Round-5 verdict item 6: the job-complex workload was fetch-only — no
offline fixture, never exercised in this sandbox. The committed corpus
(``workloads/fixtures/job-complex``, see its README for provenance and
the representative-not-canonical caveat) exercises the workload's
defining feature set — GROUP BY aggregation, HAVING, ORDER BY+LIMIT,
COUNT(DISTINCT), EXISTS/NOT EXISTS, IN-subquery, scalar subquery, CASE,
UNION ALL, LEFT JOIN — through the native pipeline on Spark AND as raw
SQL on DuckDB over the identical parquet.
"""

from __future__ import annotations

import glob
import os

import pytest

from postbound_spark.operators.compiler import compile_plan
from postbound_spark.plans.algebra import parse_relalg
from postbound_spark.plans.parser import parse_query
from postbound_spark.sources.imdb_fixture import IMDB_TABLES

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "workloads",
    "fixtures",
    "job-complex",
)


def _corpus() -> dict[str, str]:
    out = {}
    for path in sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.sql"))):
        label = os.path.splitext(os.path.basename(path))[0]
        with open(path) as fh:
            out[label] = fh.read().strip().rstrip(";")
    return out


CORPUS = _corpus()


def test_corpus_has_at_least_20_queries():
    assert len(CORPUS) >= 20


def test_loader_serves_the_fixture_offline():
    from postbound_spark.workloads import job_complex

    wl = job_complex()
    assert set(wl) == set(CORPUS)


def test_jobcomplex_corpus_executes_and_matches_duckdb(imdb_engines):
    """Every query parses, compiles, executes on Spark, and returns the
    same multiset of rows DuckDB returns for the identical SQL. Results
    are multi-row (grouped/ordered), so rows are compared as sorted
    tuples — the queries carry deterministic ORDER BYs, but cross-engine
    VARCHAR collation must not decide the test."""
    spark, con = imdb_engines

    def key(row):  # None-safe (LEFT JOIN emits NULL columns)
        return tuple((v is None, str(v)) for v in row)

    mismatches, nonempty = [], 0
    for label, sql in CORPUS.items():
        df = compile_plan(parse_relalg(parse_query(sql)), spark)
        got = sorted((tuple(r) for r in df.collect()), key=key)
        want = sorted(
            (tuple(r) for r in con.execute(sql).fetchall()), key=key
        )
        if got != want:
            mismatches.append((label, got[:2], want[:2]))
        if got:
            nonempty += 1
    assert not mismatches, f"{len(mismatches)} mismatches: {mismatches[:3]}"
    assert nonempty >= len(CORPUS) * 2 // 3, (
        f"only {nonempty}/{len(CORPUS)} queries returned rows — the corpus "
        "is not exercising the fixture data"
    )
