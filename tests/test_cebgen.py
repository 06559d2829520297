"""CEB template-driven variant generation (postbound_spark/cebgen.py).

Round-4 verdict item 3: the reference's base-query + predicate-template
system (``experiments/ceb.py``) generates controlled VARIANTS of seed
queries by sampling predicate values from the live database. The gate
here mirrors the schema-walk sweep in ``test_querygen.py``: 200
template-generated variants per CI run must parse through the native
parser, compile through the algebra, execute on Spark, and match DuckDB
running the identical SQL on the identical parquet.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from postbound_spark.catalog import load_table
from postbound_spark.cebgen import (
    PredicateGenerator,
    QueryTemplate,
    SamplingError,
    generate_workload,
    template_from_toml,
)
from postbound_spark.operators.compiler import compile_plan
from postbound_spark.plans.algebra import parse_relalg
from postbound_spark.plans.parser import parse_query

TEMPLATE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "workloads",
    "templates",
)
TABLES = ["region", "nation", "customer", "orders", "lineitem", "part"]


@pytest.fixture(scope="module")
def ceb_env(spark, sf_small):
    con = duckdb.connect()
    for t in TABLES:
        load_table(spark, sf_small, t).createOrReplaceTempView(t)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_small}/{t}.parquet')"
        )
    yield spark, con
    con.close()


def test_templates_parse_from_toml():
    import glob

    paths = sorted(glob.glob(os.path.join(TEMPLATE_DIR, "*.toml")))
    assert len(paths) >= 4
    for p in paths:
        template = template_from_toml(p)
        assert template.label.startswith("ceb_")
        assert template._generators  # every shipped template samples something


def test_workload_generation_is_deterministic(ceb_env):
    spark, _ = ceb_env
    a = generate_workload(
        TEMPLATE_DIR, spark=spark, queries_per_template=5, seed=11
    )
    b = generate_workload(
        TEMPLATE_DIR, spark=spark, queries_per_template=5, seed=11
    )
    assert a == b
    c = generate_workload(
        TEMPLATE_DIR, spark=spark, queries_per_template=5, seed=12
    )
    assert a != c


def _match(got_rows, want_rows) -> bool:
    if len(got_rows) != len(want_rows):
        return False
    for g, w in zip(sorted(got_rows), sorted(want_rows)):
        if len(g) != len(w):
            return False
        for gv, wv in zip(g, w):
            if isinstance(gv, float) or isinstance(wv, float):
                if not math.isclose(
                    float(gv), float(wv), rel_tol=1e-9, abs_tol=1e-6
                ):
                    return False
            elif gv != wv:
                return False
    return True


def test_200_variants_execute_and_match_duckdb(ceb_env):
    """The CI gate: 4 templates x 50 variants, every one green against
    the DuckDB oracle (ref generate_workload, experiments/ceb.py:799 —
    the reference likewise validates generated queries by running them)."""
    spark, con = ceb_env
    workload = generate_workload(
        TEMPLATE_DIR, spark=spark, queries_per_template=50, seed=5
    )
    assert len(workload) == 200
    failures, nonempty = [], 0
    for label, sql in workload.items():
        try:
            df = compile_plan(parse_relalg(parse_query(sql)), spark)
            got = [tuple(r) for r in df.collect()]
            want = [tuple(r) for r in con.execute(sql).fetchall()]
        except Exception as exc:  # noqa: BLE001 - collected for the report
            failures.append((label, f"{type(exc).__name__}: {str(exc)[:90]}"))
            continue
        if not _match(got, want):
            failures.append((label, f"mismatch {got[:2]} vs {want[:2]}"))
        if got:
            nonempty += 1
    assert not failures, f"{len(failures)} failed, first: {failures[:3]}"
    # sampled-from-data literals mean variants are rarely vacuous
    assert nonempty >= 120, f"only {nonempty}/200 variants returned rows"


def test_dependency_values_flow_into_candidate_sql(ceb_env):
    """date_hi's candidate SQL embeds <<date_lo>> (ref dependency graph,
    experiments/ceb.py): every generated BETWEEN window must be
    non-empty, which only holds if the dependency actually bound."""
    spark, _ = ceb_env
    template = template_from_toml(
        os.path.join(TEMPLATE_DIR, "regional_revenue.toml")
    )
    import random

    for seed in range(5):
        sql = template.instantiate(random.Random(seed), spark)
        lo, hi = (
            s.split("' AS TIMESTAMP")[0][-19:]
            for s in sql.split("BETWEEN ")[1].split(" AND CAST('")
        )
        assert lo <= hi, sql


def test_template_validation_errors():
    with pytest.raises(ValueError, match="exactly two keys"):
        PredicateGenerator(
            "r", keys=["a"], pred_type="range", options=[1, 2]
        )
    with pytest.raises(ValueError, match="exactly one of"):
        PredicateGenerator("r", keys=["a"], pred_type="eq")
    template = QueryTemplate("SELECT <<x>> AS v", label="t")
    with pytest.raises(SamplingError, match="no generator"):
        import random

        template.instantiate(random.Random(0), None)


def test_options_list_needs_no_session():
    """Explicit options lists sample without a live session — the
    reference's ``options`` mode (experiments/ceb.py:62)."""
    import random

    template = QueryTemplate(
        "SELECT * FROM t WHERE c = <<v>>", label="opts"
    )
    template.register_generator(
        PredicateGenerator("v", keys=["v"], pred_type="eq", options=["x", "y"])
    )
    sql = template.instantiate(random.Random(3), None)
    assert sql in ("SELECT * FROM t WHERE c = 'x'", "SELECT * FROM t WHERE c = 'y'")


def test_imdb_template_generates_oracle_checked_variants(imdb_engines):
    """The original CEB generates variants over the IMDB schema — the
    committed IMDB template samples keywords (weighted by usage),
    countries, a rating bound, and a year window from the live views,
    and 40 generated variants must match DuckDB on the IMDB-shaped
    fixture (shared session views, tests/conftest.py)."""
    spark, con = imdb_engines
    template_dir = os.path.join(os.path.dirname(TEMPLATE_DIR), "templates_imdb")
    workload = generate_workload(
        template_dir, spark=spark, queries_per_template=40, seed=3
    )
    assert len(workload) == 40
    failures = 0
    for label, sql in workload.items():
        got = [
            tuple(r)
            for r in compile_plan(parse_relalg(parse_query(sql)), spark).collect()
        ]
        want = [tuple(r) for r in con.execute(sql).fetchall()]
        if not _match(got, want):
            failures += 1
    assert failures == 0


def test_candidate_order_is_row_order_independent(spark):
    """'Deterministic in seed' must hold across machines: collect() has
    no ordering guarantee, so the cached candidate list is sorted before
    rng.choice indexes into it. Two views holding the same rows in
    opposite physical order must yield identical draws (round-5 advisor
    finding)."""
    import random

    rows = [(v,) for v in ("delta", "alpha", "echo", "bravo", "carol")]
    spark.createDataFrame(rows, "val string").coalesce(1).createOrReplaceTempView(
        "cand_fwd"
    )
    spark.createDataFrame(rows[::-1], "val string").coalesce(1).createOrReplaceTempView(
        "cand_rev"
    )
    draws = []
    for view in ("cand_fwd", "cand_rev"):
        gen = PredicateGenerator(
            "p", keys=["v"], pred_type="eq",
            sql=f"SELECT DISTINCT val FROM {view}",
        )
        rng = random.Random(42)
        draws.append([gen.choose(rng, spark, {})["v"] for _ in range(8)])
    assert draws[0] == draws[1]
