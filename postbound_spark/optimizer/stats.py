"""Statistics interface — emulated and native modes.

Mirrors the reference's ``DatabaseStatistics`` (rbergm/PostBOUND
``postbound/db/_db.py:1965``): *emulated* mode computes every statistic
with plain queries (``_db.py:1983-1987``, ``_calculate_* :2697-2871``);
*native* mode reads the backend's own stats. Here:

- emulated = DataFrame aggregates (COUNT, approx_count_distinct, MIN/MAX,
  groupBy-count-limit for MCVs, ``approxQuantile`` for equi-depth
  histograms) — each one job over the parquet, pushdown-pruned to the
  single column it needs;
- native = ``ANALYZE TABLE ... COMPUTE STATISTICS`` + catalog readback,
  feeding Catalyst CBO the way the reference feeds its cost models.

``max_frequency`` is the one statistic the UES optimizer needs
(ref: ``opt/ues.py:300`` MaxFrequencyStats) — the highest duplication
factor of any value in a join column.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ColumnStats:
    row_count: int
    distinct_count: int
    min_value: object
    max_value: object
    max_frequency: int


class EmulatedStatistics:
    """Exact-by-default statistics via DataFrame jobs (set
    ``approximate=True`` for sketch-based distinct counts — the right
    default at 100 TB, where exact COUNT(DISTINCT) is a full shuffle)."""

    def __init__(self, spark: SparkSession, approximate: bool = False):
        self.spark = spark
        self.approximate = approximate

    def row_count(self, df: DataFrame) -> int:
        return df.count()

    def distinct_count(self, df: DataFrame, column: str) -> int:
        if self.approximate:
            agg = df.agg(F.approx_count_distinct(column).alias("d"))
        else:
            agg = df.agg(F.countDistinct(column).alias("d"))
        return agg.collect()[0]["d"]

    def min_max(self, df: DataFrame, column: str) -> tuple[object, object]:
        row = df.agg(F.min(column).alias("lo"), F.max(column).alias("hi")).collect()[0]
        return row["lo"], row["hi"]

    def max_frequency(self, df: DataFrame, column: str) -> int:
        """max #rows sharing one value in ``column`` (UES's bound input).
        One partial-aggregated groupBy + a 1-row max."""
        row = (
            df.groupBy(column)
            .count()
            .agg(F.max("count").alias("mf"))
            .collect()[0]
        )
        return int(row["mf"] or 0)

    def most_common_values(
        self, df: DataFrame, column: str, k: int = 10
    ) -> list[tuple[object, int]]:
        """MCV list (ref: ``MostCommonValues`` ``_db.py:1600``): value ->
        occurrence count, top-k. groupBy-count-orderBy-limit, exactly the
        reference's emulated SQL."""
        rows = (
            df.groupBy(column)
            .count()
            .orderBy(F.desc("count"), F.asc(column))
            .limit(k)
            .collect()
        )
        return [(r[column], r["count"]) for r in rows]

    def histogram(self, df: DataFrame, column: str, buckets: int = 10) -> list[float]:
        """Equi-depth histogram bounds via ``approxQuantile`` (the Spark
        analog of the reference's percentile-based emulated histogram,
        ``_db.py:2841`` region)."""
        probs = [i / buckets for i in range(buckets + 1)]
        return df.stat.approxQuantile(column, probs, 0.0)

    def column_stats(self, df: DataFrame, column: str) -> ColumnStats:
        lo, hi = self.min_max(df, column)
        return ColumnStats(
            row_count=self.row_count(df),
            distinct_count=self.distinct_count(df, column),
            min_value=lo,
            max_value=hi,
            max_frequency=self.max_frequency(df, column),
        )


class NativeStatistics:
    """Catalyst-native statistics: ANALYZE + catalog readback. Feeding CBO
    this way is the Spark analog of the reference's native mode (the
    backend optimizer owns the numbers)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def analyze(self, table: str, columns: list[str] | None = None) -> None:
        stmt = f"ANALYZE TABLE {table} COMPUTE STATISTICS"
        if columns:
            stmt += " FOR COLUMNS " + ", ".join(columns)
        self.spark.sql(stmt)

    def table_row_count(self, table: str) -> int | None:
        rows = self.spark.sql(f"DESCRIBE EXTENDED {table}").collect()
        for r in rows:
            if r["col_name"] == "Statistics":
                # e.g. "1234 bytes, 56 rows"
                for part in r["data_type"].split(","):
                    part = part.strip()
                    if part.endswith("rows"):
                        return int(part.split()[0])
        return None
