#!/usr/bin/env python
"""JOB corpus at x10 IMDB fixture scale, native + UES ordering.

Round-11 (verdict item 8): the 113-query Join Order Benchmark corpus
previously executed only at the downscaled CI fixture size (1,500
titles). This experiment regenerates the deterministic IMDB-shaped
dataset at 10x (15,000 titles / 6,000 names — witness bundles are
appended identically, so every query still matches rows), executes the
FULL corpus through the native pipeline against the DuckDB oracle on
identical parquet, and re-runs the self-join-heavy families under the
UES pessimistic join ordering to assert result invariance — the
strategy changes the plan, never the answer, at 10x the data.

Usage: python experiments/job_corpus_x10.py
Writes experiments/results/job_corpus_x10_r11.json (append-only: refuses
to overwrite).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, ".")

FIXTURE_DIR = os.path.join("workloads", "fixtures", "job")
DATA_DIR = os.path.join(".scale_fixtures", "imdb_x10")
OUT = "experiments/results/job_corpus_x10_r11b.json"
UES_LABELS = ("12a", "17a", "18a", "22a", "32a", "33a")


def main() -> int:
    import duckdb

    from postbound_spark.experiments import run_optimizer_loop
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.session import get_spark
    from postbound_spark.sources.imdb_fixture import (
        IMDB_TABLES,
        generate_imdb_fixture,
    )

    if os.path.exists(OUT):
        raise SystemExit(f"refusing to overwrite {OUT}; pick a fresh name")

    corpus: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.sql"))):
        label = os.path.splitext(os.path.basename(path))[0]
        corpus[label] = open(path).read().strip().rstrip(";")
    assert len(corpus) == 113, len(corpus)

    marker = os.path.join(DATA_DIR, ".complete")
    stamp = "imdb x10 n_titles=15000 n_names=6000 seed=42 v2\n"
    if not (os.path.exists(marker) and open(marker).read() == stamp):
        os.makedirs(DATA_DIR, exist_ok=True)
        generate_imdb_fixture(DATA_DIR, seed=42, n_titles=15000, n_names=6000)
        with open(marker, "w") as fh:
            fh.write(stamp)

    spark = get_spark("job-x10")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in IMDB_TABLES:
        p = os.path.join(DATA_DIR, f"{t}.parquet")
        spark.read.parquet(p).createOrReplaceTempView(t)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    mismatches, nonempty, timings = [], 0, {}
    t_corpus0 = time.perf_counter()
    for label, sql in corpus.items():
        t0 = time.perf_counter()
        df = compile_plan(parse_relalg(parse_query(sql)), spark)
        got = tuple(df.collect()[0])
        timings[label] = round(time.perf_counter() - t0, 3)
        want = tuple(con.execute(sql).fetchone())
        if got != want:
            mismatches.append((label, repr(got), repr(want)))
        if any(v is not None for v in got):
            nonempty += 1
    corpus_sec = round(time.perf_counter() - t_corpus0, 3)

    # UES pessimistic ordering over the self-join-heavy families: the
    # forced order must reproduce the native (already-oracle-checked)
    # single-row results at this scale too
    base = {t: spark.table(t) for t in IMDB_TABLES}
    loop = run_optimizer_loop(
        spark,
        {lbl: corpus[lbl] for lbl in UES_LABELS},
        base,
        strategies=("native", "ues"),
    )
    ues_ok = bool((loop.result_rows == 1).all())
    forced = {
        lbl: sorted(set(g.join_order) - {""})
        for lbl, g in loop.groupby("label")
    }

    result = {
        "metric": "job_corpus_x10",
        "n_queries": len(corpus),
        "mismatches": mismatches,
        "nonempty": nonempty,
        "corpus_sec": corpus_sec,
        "slowest": dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:10]
        ),
        "ues_labels": list(UES_LABELS),
        "ues_single_row_all": ues_ok,
        "ues_forced_orders_nonempty": {
            k: bool(v) for k, v in forced.items()
        },
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
    }
    with open(OUT, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: result[k] for k in (
        "n_queries", "nonempty", "corpus_sec", "ues_single_row_all")}))
    print("mismatches:", len(mismatches))
    return 1 if (mismatches or nonempty != len(corpus) or not ues_ok) else 0


if __name__ == "__main__":
    raise SystemExit(main())
