"""Shared bootstrap for the examples: one fixture session + views."""

from __future__ import annotations

import os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]


def bootstrap(spark=None, sf_dir=None):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from postbound_spark.catalog import load_table
    from postbound_spark.session import get_spark

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
    )
    spark = spark or get_spark("examples", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    tables = {}
    for t in TABLES:
        tables[t] = load_table(spark, sf_dir, t)
        tables[t].createOrReplaceTempView(t)
    return spark, sf_dir, tables
