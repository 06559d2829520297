"""Differential fuzzing of the OPTIMIZER loop: generated multi-join
queries planned by every strategy (native / UES / textbook DP / pgdp /
TONIC replay) must return the identical result — the strategy changes
the plan, never the answer. The committed strategy matrices pin this on
280 fixed corpus queries; this samples the combinatorial space of join
chains × filters the corpora don't cover. Runs the REAL harness
(``experiments.run_optimizer_loop``) end to end with on_error='raise',
so planning failures are findings, not skips."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

TABLES = ("customer", "orders", "nation", "region")

#: implicit-FROM join chains (join order is the optimizer's to choose)
CHAINS = [
    (
        "customer c, nation n",
        "c.c_nationkey = n.n_nationkey",
    ),
    (
        "customer c, nation n, region r",
        "c.c_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey",
    ),
    (
        "orders o, customer c, nation n",
        "o.o_custkey = c.c_custkey AND c.c_nationkey = n.n_nationkey",
    ),
    (
        "orders o, customer c, nation n, region r",
        "o.o_custkey = c.c_custkey AND c.c_nationkey = n.n_nationkey "
        "AND n.n_regionkey = r.r_regionkey",
    ),
    # self-join: same-customer order pairs — the shape that used to
    # collide trie keys / mispair positional q-errors (round-6 fixes)
    (
        "orders o1, orders o2, customer c",
        "o1.o_custkey = o2.o_custkey AND o1.o_orderkey < o2.o_orderkey "
        "AND o2.o_custkey = c.c_custkey",
    ),
    (
        "customer c1, customer c2, nation n",
        "c1.c_nationkey = c2.c_nationkey AND c1.c_custkey < c2.c_custkey "
        "AND c2.c_nationkey = n.n_nationkey",
    ),
    # outer join in the chain: the LEFT JOIN constrains reordering to the
    # inner component; strategies may only force what is legal to move
    # and must never change the answer (a comma item next to an outer
    # chain is rejected by the parser's re-association guard, so this is
    # one explicit chain)
    (
        "customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey",
        "",
    ),
]

#: alias → (int column, sum column) pools for filters and aggregates
INT_OF = {
    "c": ["c.c_custkey", "c.c_nationkey"],
    "o": ["o.o_orderkey", "o.o_custkey"],
    "n": ["n.n_nationkey", "n.n_regionkey"],
    "r": ["r.r_regionkey"],
    "o1": ["o1.o_orderkey", "o1.o_custkey"],
    "o2": ["o2.o_orderkey", "o2.o_custkey"],
    "c1": ["c1.c_custkey", "c1.c_nationkey"],
    "c2": ["c2.c_custkey", "c2.c_nationkey"],
}


_ALIAS_RE = __import__("re").compile(r"\b(?:customer|orders|nation|region)\s+(\w+)")


def _aliases(from_clause: str) -> list[str]:
    return _ALIAS_RE.findall(from_clause)


@st.composite
def join_query(draw) -> str:
    from_clause, join_cond = draw(st.sampled_from(CHAINS))
    aliases = _aliases(from_clause)
    outer = "LEFT JOIN" in from_clause
    # under an outer join, WHERE predicates stay on the preserved side
    # (a filter on the null-supplied side would collapse it to inner)
    filter_aliases = [aliases[0]] if outer else aliases
    conds = [join_cond] if join_cond else []
    for _ in range(draw(st.integers(0, 2))):
        a = draw(st.sampled_from(filter_aliases))
        col = draw(st.sampled_from(INT_OF[a]))
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "<>"]))
        conds.append(f"{col} {op} {draw(st.integers(0, 25))}")
    if draw(st.integers(0, 3)) == 0:
        # grammar v13: uncorrelated scalar subquery in WHERE — the lifted
        # 1-row cross product must not perturb any strategy's answer or
        # confuse the forced-order enforcement (the subplan sits outside
        # the FROM join fold)
        a = draw(st.sampled_from(filter_aliases))
        col = draw(st.sampled_from(INT_OF[a]))
        op = draw(st.sampled_from(["<", ">=", ">"]))
        sub_t = draw(st.sampled_from(["region", "nation"]))
        sub_c = {"region": "r_regionkey", "nation": "n_nationkey"}[sub_t]
        conds.append(
            f"{col} {op} (SELECT max({sub_c}) FROM {sub_t}) "
            f"- {draw(st.integers(0, 4))}"
        )
    val = draw(st.sampled_from(INT_OF[draw(st.sampled_from(filter_aliases))]))
    where = f" WHERE {' AND '.join(conds)}" if conds else ""
    having = ""
    if draw(st.integers(0, 3)) == 0:
        # grammar v13: scalar subquery in HAVING over the global aggregate
        op = draw(st.sampled_from([">=", "<", ">"]))
        having = f" HAVING count(*) {op} (SELECT count(*) FROM region)"
    return (
        f"SELECT count(*) AS n, sum({val}) AS s, min({val}) AS lo "
        f"FROM {from_clause}{where}{having}"
    )


@pytest.fixture(scope="module")
def base_tables(spark, sf_small):
    base = {}
    for t in TABLES:
        df = spark.read.parquet(f"{sf_small}/{t}.parquet")
        df.createOrReplaceTempView(t)
        base[t] = df
    yield base
    for t in TABLES:
        spark.catalog.dropTempView(t)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=join_query())
def test_every_strategy_returns_identical_results(spark, base_tables, sql):
    from postbound_spark.experiments import run_optimizer_loop

    frame = run_optimizer_loop(
        spark,
        {"fuzz": sql},
        base_tables,
        strategies=("native", "ues", "dp", "pgdp", "tonic"),
    )
    assert len(frame) == 5, f"missing strategy rows for: {sql}"
    fingerprints = frame.result_fingerprint.nunique()
    assert fingerprints == 1, (
        f"strategies disagree on: {sql}\n"
        f"{frame[['strategy', 'result_rows', 'result_fingerprint']]}"
    )
    forced = set(frame.join_order) - {""}
    assert forced, f"no strategy produced a forced order for: {sql}"
