"""File sources & sinks.

The reference's I/O surface is deliberately thin (SURVEY.md §2.2): base
tables come from the backend catalog, experiment results go to
CSV/Parquet/JSON/ORC/... (``postbound/util/_df.py:12-47``), workloads come
from .sql dirs/CSV (``workloads.py:657``). Here the same surface rides on
``spark.read``/``df.write`` plus the two cluster-scale layout tools Spark
adds:

- **partitioned writes** (``partitionBy``) — directory-level partition
  pruning: a filter on the partition column skips whole directories, the
  closest Spark analog to the reference's IndexScan vocabulary
  (``_core.py:400``, documented mapping);
- **bucketed tables** (``bucketBy``) — pre-shuffled layout so equi-joins
  on the bucket key skip their exchange entirely (the co-located-join
  strategy for repeated 100 TB joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

WRITE_FORMATS = ("parquet", "csv", "json", "orc")


def write_result(df: DataFrame, path: str, fmt: str = "parquet", **options) -> None:
    """Experiment-result sink (ref util/_df.py formats minus the
    pandas-only ones: Excel/HDF/Feather have no Spark writer — documented
    gap; pandas covers them via ``df.toPandas()``)."""
    if fmt not in WRITE_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; use one of {WRITE_FORMATS}")
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path, **options)


def read_result(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    return reader.format(fmt).load(path)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Partition-pruned layout: filters on ``partition_cols`` prune at the
    directory level (verify via ``PartitionFilters`` in ``.explain``)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame, table_name: str, bucket_cols: list[str], n_buckets: int = 8
) -> None:
    """Bucketed managed table: joins/aggregations on ``bucket_cols``
    between tables bucketed the same way need no shuffle (verify: no
    ``Exchange`` above the scans in the join plan)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table_name)
    )
