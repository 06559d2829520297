#!/usr/bin/env python
"""Dump TRUE cardinalities for every join-connected intermediate of a
workload — the reference's ``experiment-intermediate-cardinalities.py``
on Spark: the ground-truth file that feeds ``PreComputedCardinalities``
replays and estimator training.

Usage:
    python experiments/run_intermediate_cards.py [out.parquet]
        [--workload job-light|job] [--max-tables N] [--titles 300]

Identical fragments are executed once (shared join cores across query
variants), each as one Spark COUNT(*) over the registered fixture views.
JOB-light's 5-table queries enumerate fully; the 17-table JOB corpus
needs --max-tables (the cap is warned, never silent).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_path", nargs="?", default="intermediate_cards.parquet")
    ap.add_argument("--workload", choices=("job-light", "job"), default="job-light")
    ap.add_argument("--max-tables", type=int, default=None)
    ap.add_argument("--titles", type=int, default=300)
    ns = ap.parse_args()

    from run_optimizer_loop import _cached_fixture

    from postbound_spark.experiments import (
        imdb_shaped_frames,
        intermediate_cardinalities,
        register_frames,
    )
    from postbound_spark.session import get_spark

    spark = get_spark("intermediate-cards")
    if ns.workload == "job":
        from postbound_spark.sources.imdb_fixture import (
            IMDB_TABLES,
            generate_imdb_fixture,
        )
        from postbound_spark.workloads import job

        data_dir = _cached_fixture("postbound_spark_imdb", generate_imdb_fixture)
        for t in IMDB_TABLES:
            spark.read.parquet(
                os.path.join(data_dir, f"{t}.parquet")
            ).createOrReplaceTempView(t)
        corpus = {k: v.strip().rstrip(";") for k, v in job().items()}
    else:
        from postbound_spark.workloads import job_light

        register_frames(spark, imdb_shaped_frames(ns.titles))
        corpus = dict(job_light())

    frame = intermediate_cardinalities(
        spark, corpus, max_tables=ns.max_tables
    )
    frame.to_parquet(ns.out_path, index=False)
    print(
        f"{len(frame)} (query, intermediate) rows, "
        f"{frame.attrs['n_unique_fragments']} unique fragments executed, "
        f"{frame.label.nunique()} queries -> {ns.out_path}"
    )


if __name__ == "__main__":
    main()
