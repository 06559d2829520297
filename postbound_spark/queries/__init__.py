"""Named query registry — the correctness surface of the engine.

Each entry pairs a Spark builder ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL oracle string (run by DuckDB on the same parquet, the
reference's "DB as oracle" test pattern — SURVEY.md §5). The driver hashes
both result sets, so builders follow two rules:

1. every computed column is aliased identically on both sides;
2. floating-point aggregates are ``round``-ed (identically on both sides) so
   bit-level summation-order differences between engines cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None):
    """Register a query builder under ``name`` with an optional oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(name, fn, oracle)
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    """Import all query modules (side effect: registration) and return the
    registry."""
    from postbound_spark.queries import (  # noqa: F401
        ir_demo,
        operators,
        optimizer_demo,
        parsed,
        pipeline,
        surface,
        tpch,
        udf_demo,
    )

    return REGISTRY
