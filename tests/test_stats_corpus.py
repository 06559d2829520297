"""The Stats-CEB fixture corpus executes end-to-end against DuckDB.

Companion to ``tests/test_job_corpus.py``: the 146-query committed
corpus (``workloads/fixtures/stats`` — real schema, real grammar incl.
``table as alias`` spelling and ``'...'::timestamp`` casts) runs through
the native pipeline on Spark AND as raw SQL on DuckDB over the same
downscaled Stack-Exchange-stats parquet
(``postbound_spark/sources/stats_fixture.py``) — COUNT(*) answers must
be identical, and the corpus must not be vacuous.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from postbound_spark.operators.compiler import compile_plan
from postbound_spark.plans.algebra import parse_relalg
from postbound_spark.plans.parser import parse_query
from postbound_spark.sources.stats_fixture import STATS_TABLES, generate_stats_fixture

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "workloads",
    "fixtures",
    "stats",
)


def _corpus() -> dict[str, str]:
    out = {}
    for path in sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.sql"))):
        label = os.path.splitext(os.path.basename(path))[0]
        with open(path) as fh:
            out[label] = fh.read().strip().rstrip(";")
    return out


CORPUS = _corpus()


def test_corpus_has_146_queries():
    assert len(CORPUS) == 146  # the Stats-CEB count


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stats"))
    generate_stats_fixture(d)
    con = duckdb.connect()
    for t in STATS_TABLES:
        path = os.path.join(d, f"{t}.parquet")
        spark.read.parquet(path).createOrReplaceTempView(t)
        con.execute(
            f'CREATE VIEW "{t}" AS SELECT * FROM read_parquet(\'{path}\')'
        )
    yield spark, con
    con.close()
    for t in STATS_TABLES:
        spark.catalog.dropTempView(t)


def test_stats_corpus_executes_and_matches_duckdb(engines):
    """All 146 COUNT(*) conjunctive queries produce identical counts on
    both engines; a healthy share must count something (the generator's
    predicate ranges were chosen against the fixture distributions)."""
    spark, con = engines
    mismatches, nonzero = [], 0
    for label, sql in CORPUS.items():
        df = compile_plan(parse_relalg(parse_query(sql)), spark)
        got = df.collect()[0][0]
        want = con.execute(sql).fetchone()[0]
        if got != want:
            mismatches.append((label, got, want))
        if got:
            nonzero += 1
    assert not mismatches, f"{len(mismatches)} mismatches: {mismatches[:5]}"
    assert nonzero >= len(CORPUS) // 2, (
        f"only {nonzero}/{len(CORPUS)} queries counted any rows — fixture "
        "distributions have drifted from the corpus predicate ranges"
    )
