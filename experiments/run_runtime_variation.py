#!/usr/bin/env python
"""Characterize repeated-execution runtime variance of the headline set.

The reference's variance experiment (ref
``examples/experiment-query-runtime-variation.py``): execute each query
once cold, then N warm rounds in reshuffled order, and persist per-
execution timings plus spread statistics — formalizing the rep-spread
notes BASELINE.md records informally. The spread column is the
interpretation key for every A/B timing in this repo: a delta inside a
query's spread band is noise, not a regression.

Usage:
    python experiments/run_runtime_variation.py [out.parquet]
        [--reps 5] [--queries q1_pricing_summary,...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> None:
    import argparse
    import os

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_path", nargs="?", default="runtime_variation.parquet")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--queries",
        default=None,
        help="comma list of registry names (default: bench.py's HEADLINE)",
    )
    ns = ap.parse_args()

    from bench import HEADLINE
    from postbound_spark.experiments import runtime_variation, variation_summary
    from postbound_spark.queries import load_all
    from postbound_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = ns.queries.split(",") if ns.queries else list(HEADLINE)
    registry = load_all()
    spark = get_spark("runtime-variation")
    spark.sparkContext.setLogLevel("ERROR")

    builders = {
        name: (lambda n=name: registry[n].builder(spark, sf_dir))
        for name in names
    }
    frame = runtime_variation(builders, reps=ns.reps, out_path=ns.out_path)
    summary = variation_summary(frame)
    print(summary.to_string(float_format=lambda v: f"{v:.3f}"))
    print(
        f"max warm spread {summary.spread.max():.2f}x "
        f"({summary.spread.idxmax()}); results -> {ns.out_path} "
        f"({len(frame)} rows, {len(names)} queries x {ns.reps}+1 rounds)"
    )


if __name__ == "__main__":
    main()
