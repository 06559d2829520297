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
def imdb_dir(tmp_path_factory):
    """The downscaled IMDB parquet dataset, generated ONCE per session
    (the expensive part). View registration stays per-module via
    imdb_engines: other test modules legitimately register temp views
    under the same names (imdb_shaped_frames uses title/cast_info/...),
    so session-lived views would be silently overwritten between a
    session fixture's creation and a later module's use."""
    from postbound_spark.sources.imdb_fixture import generate_imdb_fixture

    d = str(tmp_path_factory.mktemp("imdb"))
    generate_imdb_fixture(d)
    return d


@pytest.fixture(scope="module")
def imdb_engines(spark, imdb_dir):
    """Dual-engine views over the shared IMDB dataset, registered fresh
    per module (cheap) so view-name collisions cannot leak across
    modules."""
    import duckdb

    from postbound_spark.sources.imdb_fixture import IMDB_TABLES

    con = duckdb.connect()
    for t in IMDB_TABLES:
        path = f"{imdb_dir}/{t}.parquet"
        spark.read.parquet(path).createOrReplaceTempView(t)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield spark, con
    con.close()
    for t in IMDB_TABLES:
        spark.catalog.dropTempView(t)
