"""The JOB fixture corpus executes end-to-end against a DuckDB oracle.

Round-4 verdict item 1: the real-corpus tests must RUN offline instead of
skipping. ``workloads/fixtures/job`` holds the committed transcription of
the public Join Order Benchmark (all 33 families — see its README for
provenance), and ``postbound_spark/sources/imdb_fixture.py`` generates a
deterministic downscaled IMDB-shaped dataset, so every query executes
through the native pipeline (parse → relalg → compile) on Spark AND as
raw SQL on DuckDB over the identical parquet — the reference's
DB-as-oracle pattern (SURVEY.md §5) at full-corpus scale.

This is also the regression gate for the connectivity-aware join
ordering in ``plans/algebra.py``: JOB lists dimension tables with no
predicates between them, so raw FROM-order folding cross-products the
dimensions and query 33 (14 tables, six self-joined pairs) never
finishes even on this fixture.
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
    "job",
)


def _corpus() -> dict[str, str]:
    out = {}
    for path in sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.sql"))):
        label = os.path.splitext(os.path.basename(path))[0]
        with open(path) as fh:
            out[label] = fh.read().strip().rstrip(";")
    return out


CORPUS = _corpus()


#: variants per canonical JOB family (Leis et al., PVLDB 9(3) — 113 total)
CANONICAL_VARIANTS = {
    1: "abcd", 2: "abcd", 3: "abc", 4: "abc", 5: "abc", 6: "abcdef",
    7: "abc", 8: "abcd", 9: "abcd", 10: "abc", 11: "abcd", 12: "abc",
    13: "abcd", 14: "abc", 15: "abcd", 16: "abcd", 17: "abcdef",
    18: "abc", 19: "abcd", 20: "abc", 21: "abc", 22: "abcd", 23: "abc",
    24: "ab", 25: "abc", 26: "abc", 27: "abc", 28: "abc", 29: "abc",
    30: "abc", 31: "abc", 32: "ab", 33: "abc",
}


def test_corpus_covers_all_113_canonical_queries():
    want = {
        f"{family}{variant}"
        for family, variants in CANONICAL_VARIANTS.items()
        for variant in variants
    }
    assert len(want) == 113
    assert set(CORPUS) == want


@pytest.fixture(scope="module")
def engines(imdb_engines):
    # session-scoped dual-engine IMDB views (tests/conftest.py) — shared
    # with the IMDB CEB-template test so the fixture generates once
    return imdb_engines


def test_job_corpus_executes_and_matches_duckdb(engines):
    """Every fixture query (all 113 incl. every self-join family: 12/13/18/…/33
    with info_type x2, comp_cast_type x2, title x2, movie_companies x2,
    movie_info_idx x2) produces the identical single aggregate row on both
    engines. The fixture data is shaped so the corpus is not vacuous —
    a healthy share of queries must find qualifying rows."""
    spark, con = engines
    mismatches, nonempty = [], 0
    for label, sql in CORPUS.items():
        df = compile_plan(parse_relalg(parse_query(sql)), spark)
        got = tuple(df.collect()[0])
        want = tuple(con.execute(sql).fetchone())
        if got != want:
            mismatches.append((label, got, want))
        if any(v is not None for v in got):
            nonempty += 1
    assert not mismatches, f"{len(mismatches)} mismatches: {mismatches[:3]}"
    # fixture v2 seeds a witness bundle per family
    # (sources/imdb_fixture.py:_seed_job_witnesses), so EVERY query must
    # match at least one row — a NULL aggregate means a broken predicate
    # or a drifted literal, never an expected gap (round-7 audit,
    # experiments/run_job_selectivity.py)
    assert nonempty == len(CORPUS), (
        f"only {nonempty}/{len(CORPUS)} queries matched any data — a "
        "witness bundle regressed or a literal drifted"
    )


def test_self_join_family_resolves_roles(engines):
    """Query 33's six self-joined pairs must bind each alias to its own
    filters: with mi_idx2 < '3.0' but no bound on mi_idx1, the two
    ratings may legitimately differ — pin that the engine keeps the roles
    apart by checking the DuckDB oracle agrees on BOTH rating columns."""
    spark, con = engines
    sql = CORPUS["33a"]
    got = tuple(compile_plan(parse_relalg(parse_query(sql)), spark).collect()[0])
    want = tuple(con.execute(sql).fetchone())
    assert got == want


def test_optimizer_loop_runs_ues_over_self_join_corpus(spark, engines):
    """The optimizer-research loop handles the real JOB grammar end to
    end: UES pessimistic ordering plans queries with self-joined
    dimensions (12a: info_type x2; 33a: six self-joined pairs) and must
    reproduce native results — the strategy changes the plan, never the
    answer."""
    from postbound_spark.experiments import run_optimizer_loop

    base = {t: spark.table(t) for t in IMDB_TABLES}
    corpus = {label: CORPUS[label] for label in ("12a", "32a", "33a")}
    results = run_optimizer_loop(
        spark, corpus, base, strategies=("native", "ues")
    )
    assert len(results) == 6
    assert (results.result_rows == 1).all()
    for label, group in results.groupby("label"):
        orders = set(group.join_order) - {""}
        assert orders, label  # UES actually produced a forced order
