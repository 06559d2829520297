#!/usr/bin/env python
"""Execute JOB under TRUE injected cardinalities vs native estimates.

The reference's signature experiment (ref
``examples/experiment-job-true-card-runtimes.py``): give the planner the
truth for every intermediate and measure what that buys — plus a
misestimation arm (true cards distorted by ``factor**|S|``) that shows
what bad estimates cost. Runs on the committed JOB fixture corpus over
the downscaled IMDB-shaped dataset; self-join queries are skipped (see
``true_card_runtime_experiment``'s docstring).

Usage:
    python experiments/run_true_card_experiment.py [out.parquet]
        [--distort-factor 10000] [--reps 2] [--plots PREFIX]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> None:
    import argparse
    import glob
    import os
    import tempfile
    import warnings

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "out_path", nargs="?", default="true_card_runtimes.parquet"
    )
    # 1e4 at fixture scale ~ the reference's factor-100 sweeps at real
    # scale: the downscaled tables need a larger factor before injected
    # sizes cross Spark's 10 MB broadcast threshold
    ap.add_argument("--distort-factor", type=float, default=10000.0)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plots", default=None, metavar="PREFIX")
    ns = ap.parse_args()

    from postbound_spark.experiments import true_card_runtime_experiment
    from postbound_spark.session import get_spark
    from postbound_spark.sources.imdb_fixture import (
        IMDB_TABLES,
        generate_imdb_fixture,
    )

    spark = get_spark("true-card-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    data_dir = os.path.join(tempfile.gettempdir(), "postbound_spark_imdb")
    if not os.path.exists(os.path.join(data_dir, "title.parquet")):
        generate_imdb_fixture(data_dir)
    base = {}
    for t in IMDB_TABLES:
        base[t] = spark.read.parquet(os.path.join(data_dir, f"{t}.parquet"))
        base[t].createOrReplaceTempView(t)

    fixture_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "workloads",
        "fixtures",
        "job",
    )
    corpus = {}
    for path in sorted(glob.glob(os.path.join(fixture_dir, "*.sql"))):
        label = os.path.splitext(os.path.basename(path))[0]
        with open(path) as fh:
            corpus[label] = fh.read().strip().rstrip(";")

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # self-join skips are expected
        frame = true_card_runtime_experiment(
            spark,
            corpus,
            base,
            distort_factor=ns.distort_factor,
            reps=ns.reps,
            out_path=ns.out_path,
        )

    census = frame.groupby("mode")[
        ["exec_time", "n_broadcast_joins", "n_sortmerge_joins"]
    ].mean()
    print(census.to_string())
    invariance = frame.groupby("label").result_fingerprint.nunique()
    broken = invariance[invariance > 1]
    print(
        f"result invariance: {len(invariance) - len(broken)}/{len(invariance)}"
        + (f"; MISMATCHED: {sorted(broken.index)}" if len(broken) else "")
    )
    piv = frame.pivot_table(index="label", columns="mode", values="exec_time")
    slower = (piv["distorted"] > piv["truecards"]).sum()
    print(
        f"distorted arm slower than true cards on {slower}/{len(piv)} queries; "
        f"mean slowdown {float((piv['distorted'] / piv['truecards']).mean()):.2f}x"
    )
    print(f"results -> {ns.out_path} ({len(frame)} rows)")

    if ns.plots:
        from postbound_spark.vis_plots import runtime_bars_svg

        with open(f"{ns.plots}_runtime_bars.svg", "wb") as fh:
            fh.write(
                runtime_bars_svg(
                    frame.sort_values("exec_time", ascending=False),
                    group_col="mode",
                    title="runtime: native vs true cards vs distorted",
                )
            )
        print(f"plots -> {ns.plots}_runtime_bars.svg")


if __name__ == "__main__":
    main()
