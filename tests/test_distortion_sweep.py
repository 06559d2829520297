"""Cardinality-distortion sweeps through the zero-write injector.

Round-4 verdict item 4: the reference's ``CardinalityDistortion``
experiment (ref ``opt/_cardinalities.py:306``) — plan every query under
true cardinalities scaled by a factor and watch the plan choice respond.
``experiments.distortion_sweep`` runs it through the plan-time injector
(one plan compilation per sweep point, zero writes);
``experiments/run_optimizer_loop.py --workload job --distort ...``
persists the (factor, plan-choice, exec-time, q-error) parquet over the
JOB fixture corpus.
"""

from __future__ import annotations

import pytest

from postbound_spark.catalog import register_views
from postbound_spark.experiments import distortion_sweep

QUERIES = {
    "priority": """
        SELECT o_orderpriority, count(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                      JOIN customer ON o_custkey = c_custkey
        WHERE c_acctbal > 0
        GROUP BY o_orderpriority
    """,
    "nation_rollup": """
        SELECT n_name, count(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        GROUP BY n_name
    """,
    "selfjoin_pairs": """
        SELECT count(*) AS n
        FROM customer c1 JOIN customer c2
          ON c1.c_nationkey = c2.c_nationkey
        WHERE c1.c_custkey < c2.c_custkey
    """,
}
FACTORS = [0.01, 1.0, 1e3, 1e6]


@pytest.fixture(scope="module")
def sweep(spark, sf_small):
    register_views(
        spark, sf_small, ["lineitem", "orders", "customer", "nation", "region"]
    )
    return distortion_sweep(spark, QUERIES, FACTORS, execute=True)


def test_sweep_shape_and_determinism_columns(sweep):
    assert len(sweep) == len(QUERIES) * len(FACTORS)
    assert {
        "label", "distortion_factor", "n_broadcast_joins",
        "n_sortmerge_joins", "planning_time", "exec_time", "result_rows",
    } <= set(sweep.columns)


def test_plan_choice_responds_monotonically(sweep):
    """The pin the loop exists for: Spark's broadcast decision is a size
    threshold, and injected sizes scale with the factor — so per query,
    broadcast-join count must be non-increasing in the factor, and the
    sweep must actually CROSS the boundary somewhere (a flat census would
    mean the injection never reached the planner)."""
    flipped = 0
    for label, group in sweep.sort_values("distortion_factor").groupby("label"):
        counts = list(group.n_broadcast_joins)
        assert counts == sorted(counts, reverse=True), (label, counts)
        if counts[0] != counts[-1]:
            flipped += 1
    assert flipped == len(QUERIES), "every query should cross the threshold"


def test_results_invariant_under_distortion(sweep):
    """Statistics steer the plan, never the results (the reference's core
    injection invariant)."""
    for label, group in sweep.groupby("label"):
        assert group.result_rows.nunique() == 1, label


def test_overestimation_degrades_qerror(sweep):
    """The q-error recorded against executed actuals must grow with the
    distortion — the training signal the loop's parquet feeds."""
    for label, group in sweep.sort_values("distortion_factor").groupby("label"):
        qe = group.max_qerror.dropna()
        if len(qe) >= 2:
            assert qe.iloc[-1] > qe.iloc[0], (label, list(qe))
