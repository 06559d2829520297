"""Named optimization presets.

Mirrors the reference's ``opt/presets.py`` (:29-155 — named bundles like
"ues" and "native" that wire a full pipeline in one call)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from postbound_spark.optimizer.cardinalities import PreciseCardinalities
from postbound_spark.optimizer.dynprog import DynamicProgrammingEnumerator
from postbound_spark.optimizer.stages import (
    MultiStageOptimizationPipeline,
    NoJoinOrderOptimization,
)
from postbound_spark.optimizer.ues import UESJoinOrderOptimizer


def apply_standard_settings(spark: SparkSession, name: str) -> MultiStageOptimizationPipeline:
    """'ues' — pessimistic bound ordering from live statistics;
    'dp-precise' — Selinger DP over true cardinalities (the oracle
    optimizer, expensive: one COUNT(*) per intermediate);
    'native' — identity stages, Catalyst decides everything (ref
    opt/presets.py "native" = delegate to the backend optimizer)."""
    if name == "ues":
        return MultiStageOptimizationPipeline(spark, join_ordering=UESJoinOrderOptimizer(spark))
    if name == "dp-precise":
        return MultiStageOptimizationPipeline(
            spark, join_ordering=DynamicProgrammingEnumerator(PreciseCardinalities())
        )
    if name == "native":
        return MultiStageOptimizationPipeline(spark, join_ordering=NoJoinOrderOptimization())
    if name == "catalyst-native":
        # read Catalyst's own join-order decision back as the artifact
        # (ref opt/native.py:524 NativeOptimizer)
        from postbound_spark.optimizer.native import CatalystNativeOptimizer

        return MultiStageOptimizationPipeline(
            spark, join_ordering=CatalystNativeOptimizer(spark)
        )
    if name == "pgdp":
        # Postgres-style pathlist DP (pruned multi-path enumeration with
        # interesting orders) over true cardinalities
        from postbound_spark.optimizer.pgdp import PostgresStyleDynProg

        class _PgdpOrdering:
            def optimize_join_order(self, spec, tables):
                tree, _assignment = PostgresStyleDynProg(
                    PreciseCardinalities()
                ).generate_execution_plan(spec, tables)
                return tree

        return MultiStageOptimizationPipeline(spark, join_ordering=_PgdpOrdering())
    raise ValueError(
        f"unknown preset {name!r}; use ues | dp-precise | pgdp | native | "
        "catalyst-native"
    )
