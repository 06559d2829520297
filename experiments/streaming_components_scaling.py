#!/usr/bin/env python
"""Per-batch cost profile of the incremental connected-components fold
(round-9, streaming/components.py).

The scale claim is "per-batch cost ∝ the batch's new pairs + one
broadcast relabel of the label store" — NOT ∝ cumulative pair count.
This experiment folds the sf0.1 near-dup corpus in N equal chunks and
times each batch's fold separately: if the fold re-propagated over the
whole graph, later batches would grow super-linearly with the
accumulated state; the contraction design keeps them flat apart from
the label-store scan.

Also times the batch operator (``dedup_components``) end-to-end at the
same corpus as the re-derivation alternative an ingesting pipeline
would otherwise pay per batch.

Usage::

    python experiments/streaming_components_scaling.py \
        [--chunks=4] \
        [--out=experiments/results/streaming_components_scaling.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    chunks = 4
    out = "experiments/results/streaming_components_scaling.json"
    for a in sys.argv[1:]:
        if a.startswith("--chunks="):
            chunks = int(a.split("=")[1])
        elif a.startswith("--out="):
            out = a.split("=")[1]

    from postbound_spark.queries import load_all
    from postbound_spark.session import get_spark
    from postbound_spark.streaming.components import StreamingComponents
    from postbound_spark.streaming.neardup import StreamingNearDup

    spark = get_spark("cc-scaling", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="cc_scaling_")
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        n = docs.count()
        per = (n + chunks - 1) // chunks
        nd = StreamingNearDup(spark, os.path.join(work, "nd"))
        cc = StreamingComponents(spark, os.path.join(work, "cc"))
        batches = []
        for i in range(chunks):
            chunk = docs.filter(
                (docs.doc_id >= i * per) & (docs.doc_id < (i + 1) * per)
            )
            t0 = time.perf_counter()
            nd.process_batch(chunk, batch_id=i)
            nd_sec = time.perf_counter() - t0
            pairs = spark.read.parquet(
                os.path.join(work, "nd", "pairs", f"batch={i:06d}")
            )
            n_pairs = pairs.count()
            t0 = time.perf_counter()
            cc.process_pairs(pairs, batch_id=i)
            cc_sec = time.perf_counter() - t0
            store = cc.labels().count()
            batches.append(
                {
                    "batch": i,
                    "new_pairs": n_pairs,
                    "neardup_sec": round(nd_sec, 3),
                    "cc_fold_sec": round(cc_sec, 3),
                    "label_store_rows": store,
                }
            )
            print(batches[-1])

        # re-derivation alternative: full batch CC over the whole corpus
        from postbound_spark.queries.pipeline import release_stage_caches

        reg = load_all()
        reg["dedup_components"].builder(spark, SF_DIR).collect()  # warm
        t0 = time.perf_counter()
        labels = reg["dedup_components"].builder(spark, SF_DIR).collect()
        batch_sec = round(time.perf_counter() - t0, 3)
        release_stage_caches()

        # correctness cross-check: incremental labeling == batch labeling
        got = {(r["doc_id"], r["component"]) for r in cc.labels().collect()}
        want = {(r.doc_id, r.component) for r in labels}
        assert got == want, "incremental labels diverged from batch"

        result = {
            "metric": "streaming_components_scaling",
            "sf_dir": SF_DIR,
            "chunks": chunks,
            "batches": batches,
            "batch_rederive_sec": batch_sec,
            "stream_equals_batch": True,
        }
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps(result))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
