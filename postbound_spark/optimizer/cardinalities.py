"""Cardinality estimators: true counts, replayed counts, distorted counts.

Mirrors the reference's ``opt/_cardinalities.py``: ``PreciseCardinalities``
(:20 — runs COUNT(*) per intermediate: the ground-truth oracle),
``PreComputedCardinalities`` (:95 — replay from a mapping/CSV) and
``CardinalityDistortion`` (:306 — perturb another estimator, for
sensitivity studies). Precise counting executes one COUNT(*) DataFrame
job per intermediate — Catalyst collapses it to a partial-count +
single-row exchange, so even huge intermediates only shuffle one long per
partition.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from postbound_spark.optimizer.hints import compile_join_tree
from postbound_spark.optimizer.jointree import JoinTree
from postbound_spark.optimizer.stages import CardinalityEstimator, QuerySpec


class PreciseCardinalities(CardinalityEstimator):
    """COUNT(*) over the actual intermediate join (ref ``opt/_cardinalities.py:20``)."""

    def __init__(self):
        self._cache: dict[frozenset[str], float] = {}

    def estimate_cardinality(
        self, spec: QuerySpec, intermediate: frozenset[str], tables: dict[str, DataFrame]
    ) -> float:
        key = frozenset(intermediate)
        if key not in self._cache:
            tree = JoinTree.left_deep(sorted(intermediate))
            df = compile_join_tree(tables, tree, list(spec.edges))
            self._cache[key] = float(df.count())
        return self._cache[key]


class PreComputedCardinalities(CardinalityEstimator):
    """Replay cardinalities from a mapping (ref ``:95``)."""

    def __init__(self, cardinalities: dict[frozenset[str], float], default: float = math.nan):
        self.cardinalities = {frozenset(k): v for k, v in cardinalities.items()}
        self.default = default

    def estimate_cardinality(self, spec, intermediate, tables) -> float:
        return self.cardinalities.get(frozenset(intermediate), self.default)


class CardinalityDistortion(CardinalityEstimator):
    """Deterministically perturb another estimator by ``factor**depth``
    (ref ``:306`` — used to study optimizer robustness to misestimates).
    Deterministic (no RNG) so experiments replay exactly."""

    def __init__(self, inner: CardinalityEstimator, factor: float):
        self.inner = inner
        self.factor = factor

    def estimate_cardinality(self, spec, intermediate, tables) -> float:
        true = self.inner.estimate_cardinality(spec, intermediate, tables)
        return true * (self.factor ** max(len(intermediate) - 1, 1))
