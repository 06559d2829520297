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


# ---------------------------------------------------------------------------
# extension-dispatched single-FILE result exchange (ref util/_df.py:12-47)
# ---------------------------------------------------------------------------

#: suffix → (pandas reader name, pandas writer method, optional import)
_PANDAS_IO = {
    ".csv": ("read_csv", "to_csv", None),
    ".parquet": ("read_parquet", "to_parquet", None),
    ".json": ("read_json", "to_json", None),
    ".orc": ("read_orc", "to_orc", None),
    ".feather": ("read_feather", "to_feather", None),
    ".xlsx": ("read_excel", "to_excel", "openpyxl"),
    ".xls": ("read_excel", "to_excel", "openpyxl"),
    ".hdf": ("read_hdf", "to_hdf", "tables"),
    ".h5": ("read_hdf", "to_hdf", "tables"),
    ".hdf5": ("read_hdf", "to_hdf", "tables"),
}


def _pandas_io_for(path: str):
    import os

    suffix = os.path.splitext(path)[1].lower()
    entry = _PANDAS_IO.get(suffix)
    if entry is None:
        raise ValueError(
            f"unsupported file format {suffix!r}; one of {sorted(_PANDAS_IO)}"
        )
    reader, writer, dep = entry
    if dep is not None:
        try:
            __import__(dep)
        except ImportError as exc:
            raise ImportError(
                f"{suffix} I/O needs the optional {dep!r} package "
                f"(pip install {dep}); parquet/feather/csv/json/orc work "
                "without extras"
            ) from exc
    return reader, writer


def write_df(df: DataFrame, path: str, *, index: bool = False, **kwargs) -> None:
    """Single-FILE experiment-result writer with extension dispatch (ref
    ``util/_df.py:49`` ``write_df``): CSV / Parquet / JSON / ORC / Feather
    out of the box, Excel and HDF behind their optional pandas engines
    (openpyxl / tables) with an informative ImportError when absent.

    The frame is collected to the driver first — this is the reference's
    pandas-artifact exchange for EXPERIMENT RESULTS (strategy matrices,
    sweeps: thousands of rows), not a dataset sink; datasets stream
    distributed through :func:`write_result`. Like the reference, complex
    object cells are jsonized so every format can hold them."""
    import json
    import os

    _reader, writer = _pandas_io_for(path)
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    pdf = df.toPandas()
    for col in pdf.columns:
        if pdf[col].dtype != "object":
            continue
        if all(isinstance(v, str) or v is None for v in pdf[col]):
            continue
        # toPandas yields numpy arrays for Spark array columns — tolist()
        # first so they jsonize as JSON arrays, not stringified ndarrays
        pdf[col] = pdf[col].map(
            lambda v: json.dumps(
                v.tolist() if hasattr(v, "tolist") else v, default=str
            )
        )
    if writer == "to_hdf":
        kwargs.setdefault("key", "df")
        pdf.to_hdf(path, index=index, **kwargs)
    elif writer in ("to_feather", "to_parquet"):
        # these writers have no index kwarg; the index is dropped by
        # reset_drop below for parity with index=False default
        getattr(pdf.reset_index(drop=not index), writer)(path, **kwargs)
    else:
        getattr(pdf, writer)(path, index=index, **kwargs)


def read_df(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """Single-FILE reader matching :func:`write_df` (ref ``util/_df.py:12``
    ``read_df``): pandas reads by extension on the driver, then the frame
    enters Spark via ``createDataFrame`` — the ingest direction for small
    artifacts (workload manifests, spreadsheets from collaborators)."""
    import pandas as pd

    reader, _writer = _pandas_io_for(path)
    pdf = getattr(pd, reader)(path, **kwargs)
    return spark.createDataFrame(pdf)
