from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from postbound_spark.session import get_spark

    spark = get_spark("postbound-spark-tests", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE


@pytest.fixture(scope="session")
def imdb_engines(spark, tmp_path_factory):
    """The downscaled IMDB dataset registered in BOTH engines (Spark temp
    views + DuckDB read_parquet views) — shared by the JOB corpus and the
    IMDB CEB-template tests so the fixture generates once per session."""
    import duckdb

    from postbound_spark.sources.imdb_fixture import (
        IMDB_TABLES,
        generate_imdb_fixture,
    )

    d = str(tmp_path_factory.mktemp("imdb"))
    generate_imdb_fixture(d)
    con = duckdb.connect()
    for t in IMDB_TABLES:
        path = f"{d}/{t}.parquet"
        spark.read.parquet(path).createOrReplaceTempView(t)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield spark, con
    con.close()
    for t in IMDB_TABLES:
        spark.catalog.dropTempView(t)
