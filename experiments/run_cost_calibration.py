#!/usr/bin/env python
"""Calibrate per-operator cost constants from measured probe joins, then
sweep the JOB corpus comparing default-factor vs calibrated-factor DP.

The reference prices plans with the backend's own calibrated constants
(ref ``opt/native.py:57`` ``NativeCostModel`` over Postgres's
cpu_tuple_cost family); Spark publishes no constants, so this script
MEASURES them (``optimizer/costmodel.py``):

1. PROBES — the same two-table TPC-H join executed under each forced
   physical operator (broadcast-hash / shuffle-hash / sort-merge) at
   several deterministic input sizes; per-family constants are
   identified by runtime differences at equal inputs. Committed as
   ``cost_calibration_probes.parquet`` + ``cost_constants.json``.
2. SWEEP — every JOB fixture query planned by the pathlist DP twice
   (asserted factors vs calibrated factors, same statistics estimator),
   both plans executed min-of-``--reps``; fingerprints must agree.
   Committed as ``job_calibrated_dp.parquet``.

Usage:
    python experiments/run_cost_calibration.py [--reps 3] [--probe-reps 3]
        [--results-dir experiments/results]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
import warnings

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _probe_specs():
    """(name, left_table, right_table, edge, left_filter, right_filter):
    deterministic modulo filters scale the inputs; the pairs cover a
    fact⋈dim shape (orders⋈customer) and a fact⋈fact shape
    (lineitem⋈orders)."""
    return [
        ("lo_full", "lineitem", "orders", ("l_orderkey", "o_orderkey"), None, None),
        ("lo_half", "lineitem", "orders", ("l_orderkey", "o_orderkey"),
         "l_linenumber <= 3", "o_orderkey % 2 = 0"),
        ("oc_full", "orders", "customer", ("o_custkey", "c_custkey"), None, None),
        ("oc_quarter", "orders", "customer", ("o_custkey", "c_custkey"),
         "o_orderkey % 4 = 0", "c_custkey % 2 = 0"),
    ]


def main() -> None:
    import pandas as pd

    from postbound_spark.catalog import load_tables
    from postbound_spark.experiments import (
        _prepared_tables,
        _result_fingerprint,
    )
    from postbound_spark.optimizer import (
        JoinOperator,
        JoinTree,
        PhysicalOperatorAssignment,
        PostgresStyleDynProg,
        compile_join_tree,
        pk_fk_edges_for,
    )
    from postbound_spark.optimizer.cardinalities import (
        StatsCardinalityEstimator,
    )
    from postbound_spark.optimizer.costmodel import (
        CostConstants,
        fit_cost_constants,
    )
    from postbound_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--probe-reps", type=int, default=3)
    ap.add_argument("--results-dir", default="experiments/results")
    ns = ap.parse_args()
    os.makedirs(ns.results_dir, exist_ok=True)

    spark = get_spark("cost-calibration")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # ---- 1. probes ------------------------------------------------------
    base = load_tables(spark, sf_dir, ["lineitem", "orders", "customer"])
    probe_rows: list[dict] = []
    families = (
        JoinOperator.BROADCAST_HASH,
        JoinOperator.SHUFFLE_HASH,
        JoinOperator.SORT_MERGE,
    )
    for name, lt, rt, (lc, rc), lf, rf in _probe_specs():
        from pyspark.sql import functions as F

        left = base[lt].filter(F.expr(lf)) if lf else base[lt]
        right = base[rt].filter(F.expr(rf)) if rf else base[rt]
        l_rows, r_rows = left.count(), right.count()
        tables = {lt: left, rt: right}
        edges = [e for e in pk_fk_edges_for([lt, rt])]
        tree = JoinTree.join(JoinTree.leaf(lt), JoinTree.leaf(rt))
        for fam in families:
            assignment = PhysicalOperatorAssignment()
            assignment.set_join_operator(frozenset({lt, rt}), fam)
            df = compile_join_tree(tables, tree, edges, assignment)
            out_rows = None
            best = math.inf
            for _ in range(max(1, ns.probe_reps)):
                t0 = time.perf_counter()
                out_rows = df.count()
                best = min(best, time.perf_counter() - t0)
            fam_name = fam.name.lower()
            probe_rows.append(
                {
                    "probe": name,
                    "family": fam_name,
                    "l_rows": l_rows,
                    "r_rows": r_rows,
                    "out_rows": out_rows,
                    "scan_rows": l_rows + r_rows,
                    "broadcast_rows": (
                        min(l_rows, r_rows) if fam == families[0] else 0
                    ),
                    "shuffle_rows": (
                        l_rows + r_rows if fam == families[1] else 0
                    ),
                    "sort_rows": (
                        l_rows + r_rows if fam == families[2] else 0
                    ),
                    "runtime_sec": best,
                }
            )
            print(
                f"probe {name}/{fam_name}: l={l_rows} r={r_rows} "
                f"out={out_rows} t={best:.3f}s"
            )
    probes = pd.DataFrame(probe_rows)
    probes.to_parquet(
        os.path.join(ns.results_dir, "cost_calibration_probes.parquet"),
        index=False,
    )
    constants = fit_cost_constants(probe_rows)
    with open(os.path.join(ns.results_dir, "cost_constants.json"), "w") as fh:
        fh.write(constants.to_json())
    print("fitted:", constants)
    print("pgdp factors:", constants.pgdp_factors())

    # ---- 2. JOB sweep: default vs calibrated DP -------------------------
    from run_optimizer_loop import _cached_fixture

    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.optimizer.hints import apply_join_hints_to_relalg
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query, to_query_spec
    from postbound_spark.sources.imdb_fixture import (
        IMDB_TABLES,
        generate_imdb_fixture,
    )
    from postbound_spark.workloads import job

    data_dir = _cached_fixture("postbound_spark_imdb", generate_imdb_fixture)
    job_base = {}
    for t in IMDB_TABLES:
        job_base[t] = spark.read.parquet(os.path.join(data_dir, f"{t}.parquet"))
        job_base[t].createOrReplaceTempView(t)
    corpus = {k: v.strip().rstrip(";") for k, v in job().items()}

    LINEAR_ABOVE = 10
    estimator = StatsCardinalityEstimator()
    rows: list[dict] = []
    for label, sql in corpus.items():
        try:
            parsed = parse_query(sql)
            spec = to_query_spec(parsed)
            tables = _prepared_tables(parsed, job_base)
        except Exception as exc:
            warnings.warn(f"{label}: parse/spec failed: {exc}")
            continue
        for mode, cc in (("default", None), ("calibrated", constants)):
            t0 = time.perf_counter()
            try:
                tree, assignment = PostgresStyleDynProg(
                    estimator,
                    linear=len(spec.tables) > LINEAR_ABOVE,
                    cost_constants=cc,
                ).generate_execution_plan(spec, tables)
            except Exception as exc:
                warnings.warn(f"{label}/{mode}: planning failed: {exc}")
                continue
            opt_time = time.perf_counter() - t0
            relalg = parse_relalg(parsed, join_order=tree.tables())
            relalg = apply_join_hints_to_relalg(relalg, assignment)
            df = compile_plan(relalg, spark)
            times, result = [], None
            for _ in range(max(1, ns.reps)):
                t1 = time.perf_counter()
                result = df.collect()
                times.append(time.perf_counter() - t1)
            rows.append(
                {
                    "label": label,
                    "mode": mode,
                    "optimization_time": opt_time,
                    "exec_time": min(times),
                    "join_order": " ".join(tree.tables()),
                    "n_broadcast": sum(
                        1
                        for op in assignment.join_operators.values()
                        if op == JoinOperator.BROADCAST_HASH
                    ),
                    "result_rows": len(result),
                    "result_fingerprint": _result_fingerprint(result),
                }
            )
    frame = pd.DataFrame(rows)
    out_path = os.path.join(ns.results_dir, "job_calibrated_dp.parquet")
    frame.to_parquet(out_path, index=False)

    piv = frame.pivot_table(index="label", columns="mode", values="exec_time")
    piv = piv.dropna()
    wins = (piv["calibrated"] <= piv["default"]).sum()
    orders = frame.pivot_table(
        index="label", columns="mode", values="join_order", aggfunc="first"
    ).dropna()
    changed = (orders["calibrated"] != orders["default"]).sum()
    inv = frame.groupby("label").result_fingerprint.nunique()
    broken = inv[inv > 1]
    print(
        f"calibrated <= default runtime on {wins}/{len(piv)} queries "
        f"(mean {piv['calibrated'].mean():.4f}s vs "
        f"{piv['default'].mean():.4f}s); join order changed on "
        f"{changed}/{len(orders)}"
    )
    print(
        f"result invariance: {len(inv) - len(broken)}/{len(inv)}"
        + (f"; MISMATCHED: {sorted(broken.index)}" if len(broken) else "")
    )
    print(f"results -> {out_path} ({len(frame)} rows)")


if __name__ == "__main__":
    main()
