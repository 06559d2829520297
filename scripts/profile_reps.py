"""Warm-repetition anatomy: per query, builder() wall vs collect() wall and
the number of Spark jobs each warm collect submits (statusTracker) — the
serial-AQE-round / driver-planning-floor evidence for the optimization round.

Usage: python scripts/profile_reps.py [--sf DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from postbound_spark.queries import load_all
    from postbound_spark.queries.pipeline import release_stage_caches
    from postbound_spark.session import get_spark

    registry = load_all()
    spark = get_spark("profile-reps")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in args.names:
        builder = registry[name].builder
        builder(spark, args.sf).collect()  # warm
        best = None
        for _ in range(args.reps):
            jobs0 = len(tracker.getJobIdsForGroup(None))
            t0 = time.perf_counter()
            df = builder(spark, args.sf)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            jobs1 = len(tracker.getJobIdsForGroup(None))
            rec = {
                "build_s": round(t1 - t0, 3),
                "collect_s": round(t2 - t1, 3),
                "jobs": jobs1 - jobs0,
            }
            if best is None or rec["collect_s"] < best["collect_s"]:
                best = rec
        out[name] = best
        release_stage_caches()
    print(json.dumps({"reps": out, "sf": args.sf,
                      "loadavg": [round(x, 2) for x in os.getloadavg()]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
