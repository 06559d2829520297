"""The optimizer-research loop end to end (ref bench.py:1019-1235):
JOB-light through native + UES ordering, executed, measured, q-errored,
persisted — and the UES CIDR'21 invariant (root bound is a TRUE upper
bound of the actual join cardinality) checked on all 70 corpus queries."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from postbound_spark.experiments import (
    RESULT_COLUMNS,
    imdb_shaped_frames,
    join_qerrors,
    register_frames,
    run_optimizer_loop,
)
from postbound_spark.workloads import job_light_shaped_corpus


@pytest.fixture(scope="module")
def base_tables(spark):
    return register_frames(spark, imdb_shaped_frames())


@pytest.fixture(scope="module")
def loop_results(spark, base_tables, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("exp") / "results.parquet")
    corpus = job_light_shaped_corpus()
    frame = run_optimizer_loop(
        spark, corpus, base_tables, strategies=("native", "ues"), out_path=out
    )
    return frame, out, corpus


def test_result_schema_and_persistence(loop_results):
    frame, out, corpus = loop_results
    assert list(frame.columns) == RESULT_COLUMNS
    assert len(frame) == 2 * len(corpus)
    restored = pd.read_parquet(out)
    assert len(restored) == len(frame)
    assert list(restored.columns) == RESULT_COLUMNS


def test_ues_bound_is_upper_bound_on_all_70(loop_results):
    """The UES guarantee: bound >= actual join cardinality, every query."""
    frame, _, corpus = loop_results
    ues = frame[frame.strategy == "ues"]
    assert len(ues) == len(corpus) == 70
    violations = ues[~(ues.ues_bound >= ues.actual_card)]
    assert violations.empty, violations[["label", "ues_bound", "actual_card"]]


def test_both_strategies_agree_on_results(loop_results):
    """Join order is a performance choice, never a semantic one: COUNT(*)
    under native and UES ordering must match per query."""
    frame, _, _ = loop_results
    pivot = frame.pivot(index="label", columns="strategy", values="actual_card")
    mismatched = pivot[pivot.native != pivot.ues]
    assert mismatched.empty, mismatched


def test_ues_orders_cover_every_table(loop_results):
    frame, _, corpus = loop_results
    for _, row in frame[frame.strategy == "ues"].iterrows():
        sql = corpus[row.label]
        n_tables = sql.upper().count(" JOIN ") + sql.split("WHERE")[0].count(",") + 1
        assert len(row.join_order.split()) == n_tables, (row.label, row.join_order)


def test_join_qerrors_pair_estimates_with_actuals(spark, base_tables):
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query

    sql = list(job_light_shaped_corpus().values())[9]  # 3-table join
    df = compile_plan(parse_relalg(parse_query(sql)), spark)
    df.collect()
    pairs = join_qerrors(df)
    assert len(pairs) == 2  # two joins
    for p in pairs:
        assert p["actual"] >= 0
        assert p["estimate"] > 0
        assert p["qerror"] >= 1 or math.isnan(p["qerror"])
    # estimates without column stats are product-like -> overestimates;
    # at least one join must show a measurable q-error signal
    assert any(p["qerror"] > 1 for p in pairs)


def test_cardinality_sweep_finds_monotone_flip(spark, sf_small):
    """The pg_lab sweep experiment: inject growing cardinalities for the
    customer subtree and watch the parent join flip from broadcast to
    sort-merge EXACTLY ONCE (monotone threshold) — with zero writes, so a
    sweep point costs one plan compilation."""
    from postbound_spark.catalog import register_views
    from postbound_spark.experiments import cardinality_sweep

    register_views(spark, sf_small, ["customer", "orders", "lineitem"])
    sql = """
    SELECT o_orderpriority, count(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal > 0
    GROUP BY o_orderpriority
    """
    res = cardinality_sweep(
        spark, sql, ("customer",), [10.0**e for e in range(2, 10)]
    )
    ops = list(res.parent_join_operator)
    assert ops[0] == "BROADCAST_HASH" and ops[-1] == "SORT_MERGE"
    flips = sum(1 for a, b in zip(ops, ops[1:]) if a != b)
    assert flips == 1, f"expected one monotone flip, got {ops}"
    # zero-write sweeps are cheap: every point after the first (which pays
    # helper load + session warm-up) plans in well under a second
    assert res.planning_time.iloc[1:].max() < 2.0


def test_runtime_variation_harness(spark, sf_small):
    """Round-5 verdict item 7: the variance harness executes a cold pass
    plus reshuffled warm rounds and produces the spread statistics
    BASELINE.md's rep-spread notes quote. Pinned on a 3-query subset:
    schema, execution counts, phase split, reshuffling actually varies
    the order, and summary invariants (spread >= 1, all times > 0)."""
    from postbound_spark.experiments import (
        VARIATION_COLUMNS,
        runtime_variation,
        variation_summary,
    )
    from postbound_spark.queries import load_all

    registry = load_all()
    names = ["q6_revenue_forecast", "q1_pricing_summary", "op_semi_join"]
    builders = {
        n: (lambda n=n: registry[n].builder(spark, sf_small)) for n in names
    }
    frame = runtime_variation(builders, reps=3, seed=23)
    assert list(frame.columns) == VARIATION_COLUMNS
    assert len(frame) == len(names) * 4  # 1 cold + 3 warm rounds
    assert (frame[frame["round"] == 0].phase == "cold").all()
    assert (frame[frame["round"] > 0].phase == "warm").all()
    assert (frame.exec_time > 0).all()
    # the warm rounds reshuffle: at least one round ran in a different
    # order than the label list (seeded, so this is deterministic)
    orders = {
        tuple(g.sort_values("position").label)
        for _, g in frame[frame["round"] > 0].groupby("round")
    }
    assert len(orders | {tuple(names)}) > 1
    summary = variation_summary(frame)
    assert sorted(summary.index) == sorted(names)
    assert (summary.spread >= 1.0).all()
    assert (summary.warm_min > 0).all()
    assert summary.cold_penalty.notna().all()
