"""Per-collect job timeline: submission/completion ms offsets for every job
one warm collect() submits (Spark UI REST API) — the serial-AQE-broadcast-
round evidence. Requires SPARK_UI=true (set automatically below).

Usage: python scripts/job_timeline.py [--sf DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

os.environ.setdefault("SPARK_UI", "true")
sys.path.insert(0, ".")


def _get(url: str):
    with urllib.request.urlopen(url) as fh:
        return json.load(fh)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from postbound_spark.queries import load_all
    from postbound_spark.queries.pipeline import release_stage_caches
    from postbound_spark.session import get_spark

    registry = load_all()
    spark = get_spark("job-timeline")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    out = {}
    for name in args.names:
        builder = registry[name].builder
        builder(spark, args.sf).collect()  # warm
        seen = {j["jobId"] for j in _get(f"{base}/api/v1/applications/{app}/jobs")}
        builder(spark, args.sf).collect()
        jobs = [
            j
            for j in _get(f"{base}/api/v1/applications/{app}/jobs")
            if j["jobId"] not in seen
        ]
        jobs.sort(key=lambda j: j["jobId"])
        from datetime import datetime

        def ms(ts):
            return datetime.strptime(ts, "%Y-%m-%dT%H:%M:%S.%fGMT").timestamp() * 1000

        t0 = min(ms(j["submissionTime"]) for j in jobs) if jobs else 0
        out[name] = [
            {
                "job": j["jobId"],
                "desc": (j.get("description") or j.get("name", ""))[:60],
                "sub_ms": round(ms(j["submissionTime"]) - t0),
                "end_ms": round(ms(j["completionTime"]) - t0)
                if "completionTime" in j
                else None,
            }
            for j in jobs
        ]
        release_stage_caches()
    print(json.dumps({"timeline": out, "sf": args.sf}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
