#!/usr/bin/env python
"""Generate a CEB-based workload from TOML templates (CLI).

The Spark counterpart of the reference's ``tools/ceb-generator.py`` —
same knobs, except candidate values come from the live SparkSession over
the fixture parquet instead of a Postgres connection.

Usage:
    python scripts/ceb_generator.py -n 25 workloads/templates \\
        [--out-dir ceb_out] [--with-subdirs] [--seed 0] \\
        [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser(description="Generate a CEB-based workload.")
    ap.add_argument("--queries-per-template", "-n", type=int, required=True)
    ap.add_argument("--out-dir", "-o", default=".")
    ap.add_argument("--with-subdirs", action="store_true",
                    help="one subdirectory per template")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("template_dir")
    ns = ap.parse_args()
    if not os.path.isdir(ns.template_dir):
        raise FileNotFoundError(f"template directory {ns.template_dir!r} missing")

    from postbound_spark.catalog import register_views
    from postbound_spark.cebgen import generate_workload
    from postbound_spark.session import get_spark

    spark = get_spark("ceb-generator", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    register_views(
        spark, ns.sf_dir,
        ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"],
    )
    workload = generate_workload(
        ns.template_dir,
        spark=spark,
        queries_per_template=ns.queries_per_template,
        seed=ns.seed,
    )
    for label, sql in workload.items():
        template, _, idx = label.rpartition("-")
        if ns.with_subdirs:
            out_dir = os.path.join(ns.out_dir, template)
            fname = f"{idx}.sql"
        else:
            out_dir = ns.out_dir
            fname = f"{label}.sql"
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, fname), "w") as fh:
            fh.write(sql.strip() + ";\n")
    print(f"wrote {len(workload)} queries to {ns.out_dir}")


if __name__ == "__main__":
    main()
