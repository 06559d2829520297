#!/usr/bin/env python
"""Demonstrate the LSH plane-count scale knob for the candidate-graph
hubness diagnostic (``ann_hubness_candidates``).

The registered entry fixes ``n_planes=8`` (256 buckets) so its DuckDB
oracle stays a static SQL string. Under scale_stress that constant makes
the ×K exponent read *bucket growth*, not operator growth: K× more
vectors over a FIXED bucket count means K× bigger buckets, and the
bucket-local pair volume grows ~K² / n_buckets. The documented contract
is that ``n_planes`` grows with log2(n / target_bucket_size) at corpus
scale — this experiment measures that contract instead of asserting it:

  - at the base scale (sf0.1) build the candidate graph with 8 planes;
  - at the ×10 scale build it with 8 planes (the naive, fixed-knob run)
    AND with 8 + ceil(log2(10)) = 12 planes (the contract-following run);
  - record candidate-pair volume and wall time for each.

Done-criterion: with the plane count following the contract, pair volume
per vector stays ~flat and the time exponent drops toward linear, while
the fixed-plane run shows exactly the super-linear growth the
scale_stress point records (BASELINE.md round-7 notes).

Usage: python experiments/hubness_plane_scaling.py [--factor=10] [--reps=2]
Writes experiments/results/hubness_plane_scaling.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

from postbound_spark.catalog import load_table
from postbound_spark.functions import vectors as V
from postbound_spark.operators.skew import salted_join
from postbound_spark.queries.pipeline import release_stage_caches, stage_cache


def _hubness(spark, sf_dir: str, n_planes: int):
    """The ann_hubness_candidates pipeline with a parametric plane count.
    Since round 8 the operator itself is parametric
    (``queries.pipeline.hubness_candidate_histogram``; the contract is
    registered as ``ann_hubness_adaptive`` with a full SQL oracle) — this
    local copy additionally exposes the intermediate ``pairs`` frame so
    the experiment can record candidate-pair volume."""
    probe_masks = [0] + [1 << p for p in range(n_planes)]
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", V.quantize(F.col("embedding")).alias("qv")
    ).transform(stage_cache)
    b = q.withColumn(
        "bucket", V.hyperplane_bucket(F.col("qv"), dims=64, n_planes=n_planes)
    ).transform(stage_cache)
    pr = b.select(
        F.col("vec_id").alias("src"),
        F.col("qv").alias("src_qv"),
        F.explode(
            F.array(
                *[
                    F.col("bucket").bitwiseXOR(F.lit(m)).cast("long")
                    for m in probe_masks
                ]
            )
        ).alias("bucket"),
    )
    d = b.select(
        F.col("vec_id").alias("dst"),
        F.col("qv").alias("dst_qv"),
        F.col("bucket").cast("long").alias("bucket"),
    )
    pairs = (
        salted_join(pr, d, on=["bucket"], salt=8, salt_on=["src", "bucket"])
        .filter(F.col("dst") != F.col("src"))
        .select(
            "src", "dst", V.cosine_q(F.col("src_qv"), F.col("dst_qv")).alias("cos")
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos"), F.asc("dst"))
    knn = (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("src", "dst")
    )
    hist = (
        knn.groupBy("dst")
        .agg(F.count(F.lit(1)).alias("in_degree"))
        .groupBy("in_degree")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )
    return pairs, hist


def _measure(spark, sf_dir: str, n_planes: int, reps: int):
    best = math.inf
    n_pairs = n_vecs = None
    for _ in range(reps):
        pairs, hist = _hubness(spark, sf_dir, n_planes)
        t0 = time.monotonic()
        hist.collect()
        best = min(best, time.monotonic() - t0)
        if n_pairs is None:
            n_pairs = pairs.count()
            n_vecs = load_table(spark, sf_dir, "embeddings").count()
        release_stage_caches()
    return {
        "n_planes": n_planes,
        "n_vectors": n_vecs,
        "candidate_pairs": n_pairs,
        "pairs_per_vector": round(n_pairs / n_vecs, 2),
        "best_sec": round(best, 3),
    }


def main() -> None:
    factor = 10
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--factor="):
            factor = int(a.split("=", 1)[1])
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])

    from experiments.scale_stress import SRC_DIR, build_scaled_dir
    from postbound_spark.session import get_spark

    spark = get_spark("hubness-plane-scaling", cpus=20, shuffle_partitions=20)
    big_dir = build_scaled_dir(spark, SRC_DIR, factor)

    scaled_planes = 8 + math.ceil(math.log2(factor))
    out = {
        "metric": "hubness_plane_scaling",
        "factor": factor,
        "reps": reps,
        "base_8p": _measure(spark, SRC_DIR, 8, reps),
        "big_fixed_8p": _measure(spark, big_dir, 8, reps),
        "big_scaled": _measure(spark, big_dir, scaled_planes, reps),
    }
    t_small = out["base_8p"]["best_sec"]
    out["exponent_fixed"] = round(
        math.log(out["big_fixed_8p"]["best_sec"] / t_small) / math.log(factor), 3
    )
    out["exponent_scaled"] = round(
        math.log(out["big_scaled"]["best_sec"] / t_small) / math.log(factor), 3
    )
    os.makedirs("experiments/results", exist_ok=True)
    path = "experiments/results/hubness_plane_scaling.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
