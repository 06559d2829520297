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
import weakref

from pyspark.sql import DataFrame

from postbound_spark.optimizer.hints import compile_join_tree
from postbound_spark.optimizer.jointree import JoinTree
from postbound_spark.optimizer.stages import CardinalityEstimator, QuerySpec


class PreciseCardinalities(CardinalityEstimator):
    """COUNT(*) over the actual intermediate join (ref ``opt/_cardinalities.py:20``).

    The memo key includes the join edges AND the identity of the input
    DataFrames — the same instance is commonly reused across queries (e.g.
    the dp-precise preset), and two queries can pass the same table NAMES
    with different filters applied; a name-set-only key would replay the
    first query's counts as "ground truth" for the second.

    ``id()`` alone is only unique among LIVE objects, so the cache entry
    carries a *weak* reference to each keyed frame and verifies, on every
    hit, that the weakref still resolves to the very object being asked
    about. A recycled id therefore reads as a cache miss and recounts —
    the staleness protection of pinning, without pinning: a long session
    reusing one estimator (the dp-precise preset's documented pattern)
    holds no strong references and cannot grow frame memory without
    bound."""

    def __init__(self):
        # key -> (count, weakrefs to the frames whose ids appear in the key)
        self._cache: dict[
            tuple, tuple[float, tuple["weakref.ref[DataFrame]", ...]]
        ] = {}

    def estimate_cardinality(
        self, spec: QuerySpec, intermediate: frozenset[str], tables: dict[str, DataFrame]
    ) -> float:
        keyed = sorted(
            (name, df) for name, df in tables.items() if name in intermediate
        )
        key = (
            frozenset(intermediate),
            tuple(sorted(map(str, spec.edges))),
            tuple((name, id(df)) for name, df in keyed),
        )
        hit = self._cache.get(key)
        if hit is not None:
            count, refs = hit
            if all(r() is df for r, (_n, df) in zip(refs, keyed)):
                return count
            del self._cache[key]  # id recycled onto a different frame
        tree = JoinTree.left_deep(sorted(intermediate))
        df = compile_join_tree(tables, tree, list(spec.edges))
        count = float(df.count())
        # weakref CALLBACK evicts the entry the moment any keyed frame
        # dies — without it, stale keys (which embed dead ids) could only
        # be deleted by an exact-key re-hit and would accumulate without
        # bound across a long session of fresh frames
        self._cache[key] = (
            count,
            tuple(
                weakref.ref(frame, lambda _r, k=key: self._cache.pop(k, None))
                for _, frame in keyed
            ),
        )
        return count


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
        # depth = joins performed = |tables| - 1; a base table (depth 0)
        # gets factor**0 == no distortion, so sensitivity curves actually
        # start from truthful leaves and compound per join as documented
        return true * (self.factor ** (len(intermediate) - 1))
