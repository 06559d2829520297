#!/usr/bin/env python
"""Run the optimizer-research loop over JOB-light and persist results.

The reference's canonical experiment (ref
``examples/experiment-job-true-card-runtimes.py``, ``bench.py:1019-1235``):
execute a workload under several join-ordering strategies, record exec /
optimization time and per-join q-errors, and keep the results as parquet
for analysis.

Usage:
    python experiments/run_optimizer_loop.py [out.parquet] [--strategies native,ues,pgdp] [--titles 300]

Offline-safe: runs on the deterministic IMDB-shaped fixture corpus (the
real JOB-light texts are fetched by ``workloads.job_light(real=True)``
when the host has network access, and are a drop-in replacement here).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def _cached_fixture(name: str, generate) -> str:
    """Idempotent fixture-dataset cache under the tempdir. Generation
    happens in a staging directory that is renamed into place only when
    complete — a crash mid-generation can never leave a half-written
    cache that later runs mistake for a full one (the same
    staging+rename discipline fetch_workload uses for archives)."""
    import shutil
    import tempfile

    # the marker embeds the GENERATOR's data version: a cache built by an
    # older generator regenerates instead of silently serving stale data
    # (round-7 lesson: fixture v2 seeds witness rows for every JOB query)
    try:
        import importlib

        mod = importlib.import_module(generate.__module__)
        version = f"v{getattr(mod, 'FIXTURE_VERSION', 1)}"
    except Exception:
        version = "v1"
    stamp = f"ok {version}\n"
    data_dir = os.path.join(tempfile.gettempdir(), name)
    done = os.path.join(data_dir, ".complete")
    if os.path.exists(done) and open(done).read() == stamp:
        return data_dir
    shutil.rmtree(data_dir, ignore_errors=True)  # stale / partial cache
    staging = data_dir + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    generate(staging)
    with open(os.path.join(staging, ".complete"), "w") as fh:
        fh.write(stamp)
    os.replace(staging, data_dir)
    return data_dir


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_path", nargs="?", default="optimizer_loop_results.parquet")
    ap.add_argument(
        "--strategies",
        default="native,ues",
        help="comma list drawn from native,ues,dp,pgdp,pgdp-precise,tonic "
        "(tonic replays operators learned from the earlier forced-order "
        "strategies — list it last)",
    )
    ap.add_argument(
        "--trie-path",
        default=None,
        help="persist the TONIC QEP-S trie here; every tonic replay then "
        "round-trips through save→load",
    )
    ap.add_argument(
        "--tonic-filter-aware",
        action="store_true",
        help="key the TONIC QEP-S trie by (table, filter fingerprint) "
        "instead of bare table names — the reference's filter-aware "
        "variant (same table, different filters -> separate learned "
        "operators)",
    )
    ap.add_argument(
        "--plots",
        default=None,
        metavar="PREFIX",
        help="write PREFIX_qerror_ecdf.svg / PREFIX_runtime_bars.svg from "
        "the result frame (vis_plots renderers)",
    )
    ap.add_argument("--titles", type=int, default=300)
    ap.add_argument(
        "--training-data",
        default=None,
        metavar="PARQUET",
        help="also emit per-query (runtime, cardinality, cost, plan) and "
        "per-join (estimate, actual, q-error) training samples "
        "(train.collect_*_samples) to PARQUET-prefixed files",
    )
    ap.add_argument(
        "--workload",
        choices=("job-light", "ssb", "job", "stats", "job-complex"),
        default="job-light",
        help="job-light runs the IMDB-shaped fixture corpus; ssb runs the "
        "13-query Star Schema corpus on the TPC-H-shaped parquet at "
        "$SPARK_GRAFT_SF_DIR (default sf0.01); job runs the committed JOB "
        "fixture corpus (workloads/fixtures/job) on the downscaled "
        "IMDB-shaped parquet dataset; stats runs the 146-query Stats-CEB "
        "fixture corpus (workloads/fixtures/stats) on the downscaled "
        "Stack-stats-shaped parquet dataset; job-complex runs the 22-query "
        "aggregate-bearing fixture (GROUP BY/HAVING/COUNT DISTINCT/"
        "EXISTS/UNION ALL) on the same IMDB-shaped dataset",
    )
    ap.add_argument(
        "--distort",
        default=None,
        metavar="FACTORS",
        help="comma list of cardinality distortion factors (e.g. "
        "0.01,0.1,1,10,100): plans every query under true base-table "
        "cardinalities scaled by each factor through the ZERO-WRITE "
        "plan-time injector and persists (factor, plan-choice, exec-time, "
        "q-error) rows — the reference's CardinalityDistortion sweep "
        "(opt/_cardinalities.py:306) at plan-compilation cost",
    )
    ns = ap.parse_args()
    out_path = ns.out_path
    strategies = tuple(ns.strategies.split(","))
    n_titles = ns.titles

    from postbound_spark.experiments import (
        imdb_shaped_frames,
        register_frames,
        run_optimizer_loop,
    )
    from postbound_spark.session import get_spark
    from postbound_spark.workloads import job_light, ssb

    spark = get_spark("optimizer-loop")
    if ns.workload == "ssb":
        from postbound_spark.catalog import load_table

        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
        base = {}
        for t in ("lineitem", "orders", "customer", "supplier", "part",
                  "nation", "region"):
            base[t] = load_table(spark, sf_dir, t)
            base[t].createOrReplaceTempView(t)
        corpus = dict(ssb())
    elif ns.workload == "stats":
        from postbound_spark.sources.stats_fixture import (
            STATS_TABLES,
            generate_stats_fixture,
        )
        from postbound_spark.workloads import stats

        data_dir = _cached_fixture("postbound_spark_stats", generate_stats_fixture)
        base = {}
        for t in STATS_TABLES:
            df = spark.read.parquet(os.path.join(data_dir, f"{t}.parquet"))
            df.createOrReplaceTempView(t)
            # the parser canonicalizes unquoted identifiers to lowercase
            # (postHistory -> posthistory); key both spellings
            base[t] = base[t.lower()] = df
        # the catalog front door (committed offline fixture corpus)
        corpus = {
            label: sql.strip().rstrip(";") for label, sql in stats().items()
        }
    elif ns.workload in ("job", "job-complex"):
        from postbound_spark.sources.imdb_fixture import (
            IMDB_TABLES,
            generate_imdb_fixture,
        )
        from postbound_spark.workloads import job, job_complex

        data_dir = _cached_fixture("postbound_spark_imdb", generate_imdb_fixture)
        base = {}
        for t in IMDB_TABLES:
            base[t] = spark.read.parquet(os.path.join(data_dir, f"{t}.parquet"))
            base[t].createOrReplaceTempView(t)
        # the catalog front door (committed offline fixture corpus)
        loader = job if ns.workload == "job" else job_complex
        corpus = {
            label: sql.strip().rstrip(";") for label, sql in loader().items()
        }
    else:
        base = register_frames(spark, imdb_shaped_frames(n_titles))
        corpus = dict(job_light())

    if ns.distort:
        from postbound_spark.experiments import distortion_sweep

        factors = [float(f) for f in ns.distort.split(",")]
        frame = distortion_sweep(spark, corpus, factors)
        frame.to_parquet(out_path)
        census = frame.groupby("distortion_factor")[
            ["n_broadcast_joins", "n_sortmerge_joins", "exec_time", "max_qerror"]
        ].mean()
        print(census.to_string())
        print(
            f"distortion sweep -> {out_path} ({len(frame)} rows, "
            f"{frame.label.nunique()} queries x {len(factors)} factors)"
        )
        return

    results = run_optimizer_loop(
        spark,
        corpus,
        base,
        strategies=strategies,
        out_path=out_path,
        trie_path=ns.trie_path,
        on_error="skip",
        tonic_filter_aware=ns.tonic_filter_aware,
    )
    by_strategy = results.groupby("strategy")[["exec_time", "optimization_time", "max_qerror"]].mean()
    print(by_strategy.to_string())
    invariance = results.groupby("label").result_fingerprint.nunique()
    broken = invariance[invariance > 1]
    print(
        f"result invariance: {len(invariance) - len(broken)}/{len(invariance)} "
        f"queries identical across strategies"
        + (f"; MISMATCHED: {sorted(broken.index)}" if len(broken) else "")
    )
    if ns.plots:
        from postbound_spark.vis_plots import qerror_ecdf_svg, runtime_bars_svg

        with open(f"{ns.plots}_qerror_ecdf.svg", "wb") as fh:
            fh.write(qerror_ecdf_svg(results, title="q-error ECDF by strategy"))
        with open(f"{ns.plots}_runtime_bars.svg", "wb") as fh:
            fh.write(
                runtime_bars_svg(
                    results.sort_values("exec_time", ascending=False),
                    title="runtime by strategy",
                )
            )
        print(f"plots -> {ns.plots}_qerror_ecdf.svg, {ns.plots}_runtime_bars.svg")
    bounded = results[(results.strategy == "ues") & results.actual_card.notna()]
    if len(bounded):
        ok = (bounded.ues_bound >= bounded.actual_card).sum()
        print(f"UES bound >= actual on {ok}/{len(bounded)} queries")
    else:
        # grouped workloads (SSB) have no scalar COUNT(*) to read the
        # actual join cardinality from — the bound check needs COUNT shapes
        print("UES bound check: n/a (no scalar-count queries in workload)")
    print(f"results -> {out_path} ({len(results)} rows)")

    if ns.training_data:
        from postbound_spark.train import (
            collect_cardinality_samples,
            collect_query_samples,
        )

        stem = ns.training_data.removesuffix(".parquet")
        qs = collect_query_samples(spark, corpus, base)
        qs.to_parquet(f"{stem}_queries.parquet")
        cs = collect_cardinality_samples(spark, corpus, base)
        cs.to_parquet(f"{stem}_cardinalities.parquet")
        print(
            f"training data -> {stem}_queries.parquet ({len(qs)} samples), "
            f"{stem}_cardinalities.parquet ({len(cs)} join labels)"
        )


if __name__ == "__main__":
    main()
