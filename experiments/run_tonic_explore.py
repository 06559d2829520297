#!/usr/bin/env python
"""Execution-backed QEP-S exploration + replay-optimality check over a
JOB slice (ref ``explore_costs`` opt/tonic.py:1391 and the TONIC paper's
train-then-recommend loop).

Protocol — the round-6 characterization finding applied: a min over N
noisy single-shot timings is selection-biased low, so EVERY timed
execution here (each explored combination AND the replay) is a
min-of-``reps`` over the same warm DataFrame. At equal noise floors the
question "does replaying the trained trie recover the best explored
combination?" becomes answerable.

Usage:
    python experiments/run_tonic_explore.py [--reps=3] [--combos=8]
        [--out=experiments/results/job_tonic_explore_reps.parquet]

Writes one parquet with a ``phase`` column:
  phase="explore": one row per (query, sampled combination)
  phase="replay":  one row per query — the trie-recommended operator
                   word executed under the identical timing protocol,
                   plus explored_min/median and the rank the replay
                   time would take inside the explored spread.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SLICE = ["1a", "3a", "5a", "8a", "10a", "14a", "17a", "22a", "26a", "32a"]
FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "workloads", "fixtures", "job",
)


def main() -> None:
    opts = {
        a.split("=")[0].lstrip("-"): a.split("=", 1)[1]
        for a in sys.argv[1:]
        if a.startswith("--") and "=" in a
    }
    reps = int(opts.get("reps", "3"))
    combos = int(opts.get("combos", "8"))
    out_path = opts.get(
        "out", "experiments/results/job_tonic_explore_reps.parquet"
    )
    trie_path = opts.get(
        "trie", "experiments/results/job_qeps_trie_explored_reps.json"
    )

    import pandas as pd

    from postbound_spark.experiments import (
        _prepared_tables,
        _result_fingerprint,
        tonic_explore,
    )
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.optimizer.hints import apply_join_hints_to_relalg
    from postbound_spark.optimizer.tonic import TonicOperatorSelection
    from postbound_spark.optimizer.ues import UESJoinOrderOptimizer
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query, to_query_spec
    from postbound_spark.session import get_spark
    from postbound_spark.sources.imdb_fixture import (
        IMDB_TABLES,
        generate_imdb_fixture,
    )

    # the one shared fixture cache every experiment runner uses — same
    # helper, same cache name, so the dataset generates once per machine
    from run_optimizer_loop import _cached_fixture

    spark = get_spark("tonic-explore", cpus=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    data_dir = _cached_fixture("postbound_spark_imdb", generate_imdb_fixture)
    base = {}
    for t in IMDB_TABLES:
        df = spark.read.parquet(os.path.join(data_dir, f"{t}.parquet"))
        # compile_plan resolves table names through the session catalog
        df.createOrReplaceTempView(t)
        base[t] = df

    queries = {}
    for label in SLICE:
        with open(os.path.join(FIXTURE_DIR, f"{label}.sql")) as fh:
            queries[label] = fh.read().strip().rstrip(";")

    tonic = TonicOperatorSelection()
    explored = tonic_explore(
        spark, queries, base, tonic, max_combinations=combos, seed=0, reps=reps
    )
    explored = explored.assign(phase="explore")

    replay_rows = []
    for label, sql in queries.items():
        parsed = parse_query(sql)
        spec = to_query_spec(parsed)
        tables = _prepared_tables(parsed, base)
        order = UESJoinOrderOptimizer(spark).optimize_join_order(spec, tables)
        assignment = tonic.select_physical_operators(spec, order)
        joins = [frozenset(j.tables()) for j in order.joins()]
        word = " ".join(
            assignment.join_operators.get(j).value
            if assignment.join_operators.get(j) is not None
            else "?"
            for j in joins
        )
        tree = parse_relalg(parsed, join_order=order.tables())
        tree = apply_join_hints_to_relalg(tree, assignment)
        df = compile_plan(tree, spark)
        # the identical timing protocol tonic_explore applies per
        # combination: first collect counts, then min over reps total
        t0 = time.perf_counter()
        result = df.collect()
        exec_time = time.perf_counter() - t0
        for _ in range(reps - 1):
            t0 = time.perf_counter()
            df.collect()
            exec_time = min(exec_time, time.perf_counter() - t0)

        q = explored[explored.label == label]
        emin, emed = float(q.exec_time.min()), float(q.exec_time.median())
        replay_rows.append(
            {
                "label": label,
                "combination": word,
                "exec_time": exec_time,
                "result_rows": len(result),
                "result_fingerprint": _result_fingerprint(result),
                "phase": "replay",
                "explored_min": emin,
                "explored_median": emed,
                "within_spread": bool(exec_time <= float(q.exec_time.max())),
                "beats_median": bool(exec_time <= emed),
                "gap_to_min": round(exec_time / emin, 3),
            }
        )

    replay = pd.DataFrame(replay_rows)
    frame = pd.concat([explored, replay], ignore_index=True)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    frame.to_parquet(out_path, index=False)
    tonic.save(trie_path)

    # answers must be invariant between exploration and replay
    fps = frame.groupby("label").result_fingerprint.nunique()
    summary = {
        "metric": "tonic_explore_replay",
        "reps": reps,
        "combos": combos,
        "queries": len(queries),
        "invariant": bool((fps == 1).all()),
        "replay_within_spread": int(replay.within_spread.sum()),
        "replay_beats_median": int(replay.beats_median.sum()),
        "mean_gap_to_min": round(float(replay.gap_to_min.mean()), 3),
        "out": out_path,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
