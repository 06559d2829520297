#!/usr/bin/env python
"""Per-query selectivity audit of the JOB fixture corpus.

Round-6 verdict flagged the fixture's literal drift (80/113 queries have
transcribed or reconstructed literals); this audit BOUNDS the drift
instead of hand-waving it: every query's full-predicate match count is
executed dual-engine (Spark AND DuckDB — the counts must agree), tagged
with its transcription-confidence class, and compared against its
family's a-variant. Fixture v2 seeds a witness bundle per family
(``sources/imdb_fixture.py:_seed_job_witnesses``), so a zero count now
means a REGRESSION (broken predicate or drifted literal), not an
expected gap — ``tests/test_job_corpus.py`` pins every query non-empty.

Usage:
    python experiments/run_job_selectivity.py
        [--out experiments/results/job_fixture_selectivity.parquet]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: variants reconstructed in round 6 from the canonical variant pattern
#: (fixture README) — lowest literal confidence
RECONSTRUCTED = {
    "6d", "6e", "6f", "7c", "8c", "8d", "9c", "9d", "11c", "11d", "12c",
    "13c", "13d", "14c", "15c", "15d", "16c", "16d", "19c", "19d", "20c",
    "21c", "22c", "22d", "23c", "25c", "27c", "28c", "29c", "30c", "31c",
}


def confidence(label: str) -> str:
    if label.endswith("a"):
        return "canonical"
    if label in RECONSTRUCTED:
        return "reconstructed"
    return "transcribed"


def main() -> None:
    import duckdb
    import pandas as pd

    from run_optimizer_loop import _cached_fixture

    from postbound_spark.plans.parser import parse_query
    from postbound_spark.plans.transform import as_count_star_query
    from postbound_spark.session import get_spark
    from postbound_spark.sources.imdb_fixture import (
        IMDB_TABLES,
        generate_imdb_fixture,
    )
    from postbound_spark.workloads import job

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--out", default="experiments/results/job_fixture_selectivity.parquet"
    )
    ns = ap.parse_args()

    spark = get_spark("job-selectivity")
    spark.sparkContext.setLogLevel("ERROR")
    data_dir = _cached_fixture("postbound_spark_imdb", generate_imdb_fixture)
    con = duckdb.connect()
    for t in IMDB_TABLES:
        path = os.path.join(data_dir, f"{t}.parquet")
        spark.read.parquet(path).createOrReplaceTempView(t)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    corpus = {k: v.strip().rstrip(";") for k, v in job().items()}
    rows = []
    for label, sql in corpus.items():
        cq = as_count_star_query(parse_query(sql)).to_sql()
        n_spark = int(spark.sql(cq).collect()[0][0])
        n_duck = int(con.execute(cq).fetchone()[0])
        fam = re.match(r"(\d+)", label).group(1)
        rows.append(
            {
                "label": label,
                "family": fam,
                "variant": label[len(fam):],
                "literal_confidence": confidence(label),
                "spark_rows": n_spark,
                "duckdb_rows": n_duck,
            }
        )
    frame = pd.DataFrame(rows).sort_values("label")
    a_rows = frame[frame.variant == "a"].set_index("family").spark_rows
    frame["a_variant_rows"] = frame.family.map(a_rows)
    frame["ratio_vs_a_ppm"] = (
        frame.spark_rows * 1_000_000 // frame.a_variant_rows.clip(lower=1)
    )
    os.makedirs(os.path.dirname(ns.out), exist_ok=True)
    frame.to_parquet(ns.out, index=False)

    assert (frame.spark_rows == frame.duckdb_rows).all(), "engine mismatch"
    empty = frame[frame.spark_rows == 0]
    by_conf = frame.groupby("literal_confidence").spark_rows.agg(
        ["count", "median", "min"]
    )
    print(by_conf.to_string())
    print(
        f"empty queries: {len(empty)}/{len(frame)}"
        + (f" — {sorted(empty.label)}" if len(empty) else "")
    )
    print(f"audit -> {ns.out} ({len(frame)} rows)")


if __name__ == "__main__":
    main()
