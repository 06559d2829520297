#!/usr/bin/env python
"""The learned-cardinality loop, closed end-to-end over the JOB fixture.

The reference's ML workflow (ref ``examples/example-05-machine-learning.py``
collect → fit, ``opt/_stages.py:592`` the estimator stage slot,
``opt/_cardinalities.py:95`` replay/deploy) run to completion:

1. ground truth — TRUE cardinalities for every join-connected JOB
   intermediate up to ``--max-tables`` (committed as
   ``job_intermediate_cards_mt{K}.parquet``; the JOB-scale sibling of the
   round-6 joblight dump);
2. features — :class:`StatsCardinalityEstimator` components per
   intermediate (estimate, cross product, min/max filtered base, edges);
3. train + evaluate — leave-one-FAMILY-out cross-validation (a model
   that saw 1a may not predict 1b: family-disjoint splits are the
   learned-cardinality evaluation standard), per-arity ridge with the
   identity prior (:mod:`postbound_spark.optimizer.learned`);
4. deploy — each family's held-out corrector wrapped as a
   ``LearnedCardinalityEstimator`` whose estimates inject through the
   ZERO-WRITE plan-time injector next to {native, stats, truecards}
   arms: exec time, broadcast/sort-merge census, result fingerprints
   (modes must agree — statistics steer plans, never answers);
5. artifacts — q-error parquet + runtime parquet + ECDF/bars SVGs + the
   full-corpus corrector JSON (the deployable model).

Usage:
    python experiments/run_learned_cards.py [--max-tables 3] [--reps 2]
        [--skip-runtime] [--results-dir experiments/results]
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

def _family(label: str) -> str:
    digits = "".join(ch for ch in label if ch.isdigit())
    return digits or label


def _qerr(est: float, actual: float) -> float:
    est, actual = max(est, 1.0), max(actual, 1.0)
    return max(est / actual, actual / est)


def main() -> None:
    import pandas as pd

    from run_optimizer_loop import _cached_fixture

    from postbound_spark.experiments import (
        _prepared_tables,
        _result_fingerprint,
        intermediate_cardinalities,
    )
    from postbound_spark.optimizer.cardinalities import (
        PreciseCardinalities,
        StatsCardinalityEstimator,
    )
    from postbound_spark.optimizer.learned import (
        LearnedCardinalityEstimator,
        fit_card_corrector,
    )
    from postbound_spark.optimizer.planstats import PlanTimeCardinalityInjector
    from postbound_spark.plans.parser import parse_query, to_query_spec
    from postbound_spark.session import get_spark
    from postbound_spark.sources.imdb_fixture import (
        IMDB_TABLES,
        generate_imdb_fixture,
    )
    from postbound_spark.workloads import job

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--max-tables", type=int, default=3)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-runtime", action="store_true")
    ap.add_argument("--results-dir", default="experiments/results")
    ns = ap.parse_args()
    os.makedirs(ns.results_dir, exist_ok=True)

    spark = get_spark("learned-cards")
    spark.sparkContext.setLogLevel("ERROR")
    data_dir = _cached_fixture("postbound_spark_imdb", generate_imdb_fixture)
    base = {}
    for t in IMDB_TABLES:
        base[t] = spark.read.parquet(os.path.join(data_dir, f"{t}.parquet"))
        base[t].createOrReplaceTempView(t)
    corpus = {k: v.strip().rstrip(";") for k, v in job().items()}

    # ---- 1. ground truth ------------------------------------------------
    truth_path = os.path.join(
        ns.results_dir, f"job_intermediate_cards_mt{ns.max_tables}.parquet"
    )
    if os.path.exists(truth_path):
        truth = pd.read_parquet(truth_path)
        print(f"ground truth: reusing {truth_path} ({len(truth)} rows)")
    else:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # max-tables cap is expected
            truth = intermediate_cardinalities(
                spark, corpus, max_tables=ns.max_tables
            )
        truth.to_parquet(truth_path, index=False)
        print(f"ground truth -> {truth_path} ({len(truth)} rows)")

    # ---- 2. features ----------------------------------------------------
    stats_est = StatsCardinalityEstimator()
    specs, prepared = {}, {}
    samples: list[dict] = []
    for label, sql in corpus.items():
        sub = truth[truth.label == label]
        parsed = parse_query(sql)
        specs[label] = (parsed, to_query_spec(parsed))
        prepared[label] = _prepared_tables(parsed, base)
        for row in sub.itertuples():
            inter = frozenset(row.tables.split())
            c = stats_est.estimate_components(
                specs[label][1], inter, prepared[label]
            )
            samples.append(
                {
                    "label": label,
                    "family": _family(label),
                    "tables": row.tables,
                    "n_tables": len(inter),
                    "actual": float(row.cardinality),
                    **c,
                }
            )
    feat = pd.DataFrame(samples)

    def to_card_samples(frame) -> list[tuple]:
        return [
            (int(r.n_tables), r.est, r.prod, r.min_base, r.max_base,
             int(r.n_edges), r.actual)
            for r in frame.itertuples()
        ]

    # ---- 3. leave-one-family-out CV ------------------------------------
    correctors = {
        fam: fit_card_corrector(to_card_samples(feat[feat.family != fam]))
        for fam in feat.family.unique()
    }
    est_learned = [
        correctors[r.family].correct(
            int(r.n_tables), r.est, r.prod, r.min_base, r.max_base,
            int(r.n_edges),
        )
        for r in feat.itertuples()
    ]
    qerr = pd.DataFrame(
        {
            "label": feat.label,
            "family": feat.family,
            "tables": feat.tables,
            "n_tables": feat.n_tables,
            "actual": feat.actual,
            "est_stats": feat.est,
            "est_learned": est_learned,
        }
    )
    qerr["qerr_stats"] = [
        _qerr(e, a) for e, a in zip(qerr.est_stats, qerr.actual)
    ]
    qerr["qerr_learned"] = [
        _qerr(e, a) for e, a in zip(qerr.est_learned, qerr.actual)
    ]
    qerr_path = os.path.join(ns.results_dir, "job_learned_qerror.parquet")
    qerr.to_parquet(qerr_path, index=False)

    med_s, med_l = qerr.qerr_stats.median(), qerr.qerr_learned.median()
    p90_s, p90_l = qerr.qerr_stats.quantile(0.9), qerr.qerr_learned.quantile(0.9)
    per_q = qerr.groupby("label")[["qerr_stats", "qerr_learned"]].max()
    print(
        f"per-intermediate q-error median: stats {med_s:.3f} -> learned "
        f"{med_l:.3f}; p90: {p90_s:.1f} -> {p90_l:.2f}"
    )
    print(
        f"per-query MAX q-error median: stats {per_q.qerr_stats.median():.1f}"
        f" -> learned {per_q.qerr_learned.median():.2f}; learned better on "
        f"{(per_q.qerr_learned < per_q.qerr_stats).mean():.0%} of "
        f"{len(per_q)} queries"
    )
    assert med_l < med_s, "gate: learned must beat stats on median q-error"

    # ---- 5a. the deployable full-corpus model ---------------------------
    full = fit_card_corrector(to_card_samples(feat))
    model_path = os.path.join(ns.results_dir, "learned_card_corrector.json")
    with open(model_path, "w") as fh:
        fh.write(full.to_json())
    print(f"full-corpus corrector -> {model_path} ({full!r})")

    # ---- 4. runtime sweep through the zero-write injector ---------------
    if not ns.skip_runtime:
        precise = PreciseCardinalities()
        rows: list[dict] = []
        skipped = 0
        with PlanTimeCardinalityInjector(spark) as injector:
            for label, sql in corpus.items():
                parsed, spec = specs[label]
                full_names = [t.full_name for t in parsed.from_tables]
                if len(set(full_names)) != len(full_names):
                    skipped += 1  # occurrence->alias mapping ambiguous
                    continue
                tables = prepared[label]
                base_to_alias = {
                    t.full_name.lower(): t.identifier
                    for t in parsed.from_tables
                }
                learned_est = LearnedCardinalityEstimator(
                    correctors[_family(label)], stats_est
                )
                tabsets = list(injector.table_sets(sql))
                alias_sets = {
                    tabs: frozenset(
                        base_to_alias[t.partition("#")[0]] for t in tabs
                    )
                    for tabs in tabsets
                }
                truth_cards = {
                    tabs: precise.estimate_cardinality(spec, al, tables)
                    for tabs, al in alias_sets.items()
                }
                mode_cards = {
                    "native": None,
                    "stats": {
                        tabs: stats_est.estimate_cardinality(spec, al, tables)
                        for tabs, al in alias_sets.items()
                    },
                    "learned": {
                        tabs: learned_est.estimate_cardinality(spec, al, tables)
                        for tabs, al in alias_sets.items()
                    },
                    "truecards": truth_cards,
                }
                for mode, cards in mode_cards.items():
                    qerrs = [
                        _qerr(cards[tabs], truth_cards[tabs])
                        for tabs in tabsets
                    ] if cards else []
                    t0 = time.perf_counter()
                    df = injector.plan(sql, cards or {}, adaptive=False)
                    planning = time.perf_counter() - t0
                    plan_text = (
                        df._jdf.queryExecution().sparkPlan().toString()
                    )
                    times, result = [], None
                    for _ in range(max(1, ns.reps)):
                        t1 = time.perf_counter()
                        result = df.collect()
                        times.append(time.perf_counter() - t1)
                    rows.append(
                        {
                            "label": label,
                            "mode": mode,
                            "planning_time": planning,
                            "exec_time": min(times),
                            "n_broadcast_joins": plan_text.count(
                                "BroadcastHashJoin"
                            ),
                            "n_sortmerge_joins": plan_text.count(
                                "SortMergeJoin"
                            ),
                            "max_qerror": max(qerrs) if qerrs else math.nan,
                            "mean_qerror": (
                                sum(qerrs) / len(qerrs) if qerrs else math.nan
                            ),
                            "result_rows": len(result),
                            "result_fingerprint": _result_fingerprint(result),
                        }
                    )
        frame = pd.DataFrame(rows)
        rt_path = os.path.join(ns.results_dir, "job_learned_runtimes.parquet")
        frame.to_parquet(rt_path, index=False)
        census = frame.groupby("mode")[
            ["exec_time", "n_broadcast_joins", "n_sortmerge_joins",
             "max_qerror"]
        ].mean()
        print(census.to_string())
        inv = frame.groupby("label").result_fingerprint.nunique()
        broken = inv[inv > 1]
        print(
            f"result invariance: {len(inv) - len(broken)}/{len(inv)} "
            f"({skipped} self-join queries skipped)"
            + (f"; MISMATCHED: {sorted(broken.index)}" if len(broken) else "")
        )
        print(f"runtime sweep -> {rt_path} ({len(frame)} rows)")

    # ---- 5b. plots ------------------------------------------------------
    from postbound_spark.vis_plots import qerror_ecdf_svg

    ecdf_frame = pd.concat(
        [
            per_q.reset_index().assign(strategy="stats").rename(
                columns={"qerr_stats": "max_qerror"}
            )[["label", "strategy", "max_qerror"]],
            per_q.reset_index().assign(strategy="learned").rename(
                columns={"qerr_learned": "max_qerror"}
            )[["label", "strategy", "max_qerror"]],
        ]
    )
    svg_path = os.path.join(ns.results_dir, "job_learned_qerror_ecdf.svg")
    with open(svg_path, "wb") as fh:
        fh.write(
            qerror_ecdf_svg(
                ecdf_frame,
                title="JOB per-query max q-error: stats vs learned (CV)",
            )
        )
    print(f"plot -> {svg_path}")


if __name__ == "__main__":
    main()
