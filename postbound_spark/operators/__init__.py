"""RelNode → DataFrame compilation and custom operator implementations."""

from postbound_spark.operators.compiler import compile_plan

__all__ = ["compile_plan"]
