"""Database facade: execute queries, simplify result sets.

Mirrors the reference's ``Database.execute_query`` surface
(rbergm/PostBOUND ``postbound/db/_db.py:432``) including its result-set
simplification rules (``_db.py:257``): a 1×1 result collapses to a scalar,
a single-column result to a flat list, a single-row result to a tuple —
the ergonomics layer every interactive research loop relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from postbound_spark.catalog import register_views
from postbound_spark.session import DEFAULT_SF_DIR


def simplify_result(rows: list[tuple]) -> object:
    """ref ``db/_db.py:257``: [(v,)] -> v; [(a,), (b,)] -> [a, b];
    [(a, b)] -> (a, b); everything else unchanged."""
    if len(rows) == 1 and len(rows[0]) == 1:
        return rows[0][0]
    if len(rows) == 1:
        return tuple(rows[0])
    if rows and all(len(r) == 1 for r in rows):
        return [r[0] for r in rows]
    return [tuple(r) for r in rows]


class Database:
    """Thin execution facade over a SparkSession + fixture catalog."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir
        register_views(spark, sf_dir)

    def execute_query(
        self, query: "str | DataFrame", *, raw: bool = False, native: bool = False
    ):
        """SQL text (or an IR object exposing ``to_sql()``) or a DataFrame;
        returns the simplified result set (``raw=True`` skips
        simplification, like the reference's ``raw`` flag). ``native=True``
        routes SQL text through the engine's own pipeline
        (parse_query → parse_relalg → compile_plan) instead of
        ``spark.sql`` — the reference's parse-then-execute loop."""
        if hasattr(query, "to_sql"):
            query = query.to_sql()
        if isinstance(query, str) and native:
            from postbound_spark.operators.compiler import compile_plan
            from postbound_spark.plans.algebra import parse_relalg
            from postbound_spark.plans.parser import parse_query

            df = compile_plan(parse_relalg(parse_query(query)), self.spark)
        else:
            df = self.spark.sql(query) if isinstance(query, str) else query
        rows = [tuple(r) for r in df.collect()]
        return rows if raw else simplify_result(rows)

    def optimizer(self):
        """Entry to the instrumentation layer (mirrors the reference's
        ``database.optimizer()`` accessor shape)."""
        from postbound_spark import optimizer

        return optimizer
