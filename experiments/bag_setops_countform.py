#!/usr/bin/env python
"""Round-10 verdict item 5: can an explicit count-form beat Spark's native
intersectAll/exceptAll on the registry's bag-set-op entries at x100?

Spark's OWN lowering (RewriteIntersectAll / RewriteExceptAll) already IS
the count-difference form — and a better one than a two-sided join: both
inputs union under marker columns, a map-side PARTIAL count compacts
duplicates per partition, then a SINGLE exchange keyed on the row value
feeds the final aggregate and replicaterows. The hand-built alternative
this script measures (per-side groupBy counts + value-keyed join +
sequence-explode) needs one exchange PER SIDE plus the join.

This script times both forms on the exact registry shapes
(parsed_intersect_all, parsed_except_all's A EXCEPT ALL (B INTERSECT ALL
C) chain) at x1 (sf0.1) and xFACTOR, verifies row-count equality, and
writes experiments/results/bag_setops_countform.json. Decision rule per
the verdict: adopt the count-form only on a >=20% win at x100.

Usage: python experiments/bag_setops_countform.py [--factor=100] [--reps=2]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, ".")

from experiments.scale_stress import SRC_DIR, build_scaled_dir  # noqa: E402


def _sides(spark, sf_dir):
    from postbound_spark.catalog import load_tables
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir, ["orders", "customer"])
    o, c = t["orders"], t["customer"]
    A = o.where("o_totalprice > 80000").select(F.col("o_custkey").alias("k"))
    B = o.where("o_orderpriority = '5-LOW'").select(F.col("o_custkey").alias("k"))
    C = c.where("c_acctbal > 0").select(F.col("c_custkey").alias("k"))
    IL = o.where("o_totalprice > 120000").select(F.col("o_custkey").alias("k"))
    IR = o.where("o_orderpriority IN ('1-URGENT', '2-HIGH')").select(
        F.col("o_custkey").alias("k")
    )
    return A, B, C, IL, IR


def _cf_intersect(l, r):
    from pyspark.sql import functions as F

    lc = l.groupBy("k").agg(F.count("*").alias("__lc"))
    rc = r.groupBy("k").agg(F.count("*").alias("__rc"))
    j = lc.join(rc, "k").withColumn("__n", F.least("__lc", "__rc"))
    return j.select(
        "k", F.explode(F.sequence(F.lit(1), F.col("__n"))).alias("__i")
    ).drop("__i")


def _cf_except(l, r):
    from pyspark.sql import functions as F

    lc = l.groupBy("k").agg(F.count("*").alias("__lc"))
    rc = r.groupBy("k").agg(F.count("*").alias("__rc"))
    j = lc.join(rc, "k", "left").withColumn(
        "__n", F.col("__lc") - F.coalesce(F.col("__rc"), F.lit(0))
    ).where("__n > 0")
    return j.select(
        "k", F.explode(F.sequence(F.lit(1), F.col("__n"))).alias("__i")
    ).drop("__i")


def _time(fn, reps):
    fn()  # warm (codegen + AQE stats)
    walls = []
    for _ in range(reps):
        s = time.time()
        fn()
        walls.append(time.time() - s)
    return min(walls), walls


def main() -> int:
    factor = 100
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--factor="):
            factor = int(a.split("=")[1])
        elif a.startswith("--reps="):
            reps = int(a.split("=")[1])

    from postbound_spark.session import get_spark

    spark = get_spark("bag-setops", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    big_dir = build_scaled_dir(spark, SRC_DIR, factor)

    out = {"factor": factor, "reps": reps, "queries": {}}
    for sf_name, sf_dir in (("x1", SRC_DIR), (f"x{factor}", big_dir)):
        A, B, C, IL, IR = _sides(spark, sf_dir)
        variants = {
            "intersect_all_native": lambda: IL.intersectAll(IR).count(),
            "intersect_all_countform": lambda: _cf_intersect(IL, IR).count(),
            "except_all_native": lambda: A.exceptAll(B.intersectAll(C)).count(),
            "except_all_countform": lambda: _cf_except(A, _cf_intersect(B, C)).count(),
        }
        rows = {}
        for name, fn in variants.items():
            wall, walls = _time(fn, reps)
            rows[name] = {"wall": round(wall, 3), "walls": [round(w, 3) for w in walls],
                          "rows": fn()}
            print(f"{sf_name} {name}: {wall:.3f}s ({rows[name]['rows']} rows)")
        assert rows["intersect_all_native"]["rows"] == rows["intersect_all_countform"]["rows"]
        assert rows["except_all_native"]["rows"] == rows["except_all_countform"]["rows"]
        out["queries"][sf_name] = rows

    big = out["queries"][f"x{factor}"]
    for op in ("intersect_all", "except_all"):
        n, c = big[f"{op}_native"]["wall"], big[f"{op}_countform"]["wall"]
        out[f"{op}_countform_speedup"] = round(n / c, 3)
        small_n = out["queries"]["x1"][f"{op}_native"]["wall"]
        out[f"{op}_native_exponent"] = round(
            math.log(big[f"{op}_native"]["wall"] / small_n) / math.log(factor), 3
        )
    os.makedirs("experiments/results", exist_ok=True)
    path = "experiments/results/bag_setops_countform.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
