#!/usr/bin/env python
"""Skew stress: a deliberately hot join key driven through the
measure → policy → mechanism loop (profile → decide_salt → salted_join).

Round-4 verdict item 8: ``profile_key_skew`` produced the diagnostic but
nothing consumed it automatically. ``operators.skew.skew_aware_join``
closes that loop; this script MEASURES it end to end on a corpus where
one key holds ~30% of the fact side:

- ``plain``:      hash join, hot key lands on one reducer
- ``skew_aware``: the profile recommends a salt, rows spread by construction

Prints one JSON line with wall-clock per variant (min-of-reps), the
measured hot share, the chosen salt, and the speedup — the §D evidence
row. AQE is disabled for the measurement so the comparison isolates the
explicit salting path (AQE's skew-join split is the runtime safety net
on top, not the thing under test).

Usage:
    python experiments/skew_stress.py [--rows 4000000] [--hot 0.3] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--dim-rows", type=int, default=20_000)
    ap.add_argument("--hot", type=float, default=0.3)
    ap.add_argument("--reps", type=int, default=3)
    ns = ap.parse_args()

    from pyspark.sql import functions as F

    from postbound_spark.operators.skew import (
        plan_skew_mitigation,
        salted_join,
    )
    from postbound_spark.session import get_spark

    spark = get_spark("skew-stress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    period = int(1 / ns.hot)
    left = (
        spark.range(ns.rows)
        .select(
            F.when((F.col("id") % period) == 0, F.lit(7))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(ns.dim_rows)))
            .alias("k"),
            F.col("id").alias("row_id"),
            (F.col("id") % 1000).alias("v"),
        )
        .localCheckpoint(eager=True)  # pin inputs: measure the join, not range()
    )
    right = (
        spark.range(ns.dim_rows)
        .select(F.col("id").alias("k"), (F.col("id") * 3).alias("payload"))
        .localCheckpoint(eager=True)
    )

    plan = plan_skew_mitigation(left, ["k"], sample_fraction=0.05)

    def run(salt: int) -> float:
        best = float("inf")
        for _ in range(ns.reps):
            t0 = time.perf_counter()
            joined = salted_join(
                left, right, ["k"], salt=salt, salt_on=["k", "row_id"]
            )
            joined.agg(F.sum(F.col("v") + F.col("payload"))).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    run(1)  # warm-up
    t_plain = run(1)
    t_salted = run(max(plan["salt"], 2))

    print(
        json.dumps(
            {
                "metric": "skew_stress",
                "rows": ns.rows,
                "hot_share": round(plan["hot_share"], 4),
                "salt_chosen": plan["salt"],
                "plain_sec": round(t_plain, 3),
                "skew_aware_sec": round(t_salted, 3),
                "speedup": round(t_plain / t_salted, 2),
                "reps": ns.reps,
            }
        )
    )


if __name__ == "__main__":
    main()
