"""Learned cardinality correction — closing the reference's ML loop.

The reference collects MSCN-shaped training samples (ref
``train/_train.py:217`` ``TrainingData``; ``examples/
example-05-machine-learning.py`` fits a toy corrector) and defines the
``CardinalityEstimator`` stage slot (ref ``opt/_stages.py:592``) a
trained model deploys into — but leaves assembling the full
train → wrap → deploy → sweep loop to the user. This module assembles
it:

- :func:`fit_card_corrector` — closed-form ridge regression of
  log10(actual) on a 5-feature encoding of the statistics estimate,
  fitted PER JOIN ARITY with a pooled fallback. The features are the
  System-R estimate itself plus the quantities that explain its failure
  modes: the pre-division cross product (how much independence
  discounting was applied), the number of join edges inside the
  intermediate (multi-edge hubs compound the containment error), and
  the min/max filtered base cardinalities (selectivity correlation).
  The regularizer shrinks toward the IDENTITY correction (coefficient 1
  on the log-estimate, 0 elsewhere), so with little evidence the model
  trusts the base estimator. This is the minimal member of the learned
  family (MSCN et al. learn the same log-space target from richer
  featurizations) and deliberately closed-form — no SGD, no RNG — so
  experiment sweeps replay exactly.
- :class:`LearnedCardinalityEstimator` — wraps
  :class:`~postbound_spark.optimizer.cardinalities.StatsCardinalityEstimator`
  (any estimator exposing ``estimate_components``) and applies the
  fitted correction, clamped to ``[1, cross-product]`` (the trivial
  upper bound no true cardinality exceeds); a drop-in
  ``CardinalityEstimator`` for the DP/pgdp enumerators and the
  zero-write plan-time injector, exactly like the reference's
  precomputed/distorted wrappers (ref ``opt/_cardinalities.py:95,306``).
- :func:`training_samples_from_intermediates` — join an
  ``intermediate_cardinalities`` ground-truth dump (committed training
  parquet) with base-estimator components recomputed on the same
  fixture, yielding the training rows.

Measured on the JOB fixture corpus (leave-one-family-out CV,
``experiments/run_learned_cards.py``, fixture v2): the correction cuts
the per-intermediate q-error p90 from ~1900 to ~9 and the per-query MAX
q-error median from ~5700 to ~20 while also improving the median —
the System-R estimator's catastrophic failure mode (multi-edge
intermediates dividing to ~1 while actuals are thousands) is exactly
what the product/edge features expose.

Scale shape: training reads a few-hundred-row parquet; inference is
O(1) arithmetic on top of the base estimator's one stats pass per
table (COUNT + HLL, partial-aggregated map-side).
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession

from postbound_spark.optimizer.stages import CardinalityEstimator, QuerySpec

__all__ = [
    "CardCorrector",
    "CardSample",
    "LearnedCardinalityEstimator",
    "fit_card_corrector",
    "training_samples_from_intermediates",
]

#: (arity, estimate, cross_product, min_base, max_base, n_edges, actual)
CardSample = tuple[int, float, float, float, float, int, float]

#: fitted feature order: [1, log10 est, log10 prod, n_edges,
#: log10 min_base, log10 max_base]
N_FEATURES = 6


def _log10c(v: float) -> float:
    return math.log10(max(v, 1.0))


def _features(
    est: float, prod: float, min_base: float, max_base: float, n_edges: int
) -> list[float]:
    return [
        1.0,
        _log10c(est),
        _log10c(prod),
        float(n_edges),
        _log10c(min_base),
        _log10c(max_base),
    ]


def _solve(a: list[list[float]], b: list[float]) -> list[float]:
    """Gaussian elimination with partial pivoting (6×6 — no numpy needed,
    keeps the fit dependency-free and bit-deterministic)."""
    n = len(b)
    m = [row[:] + [b[i]] for i, row in enumerate(a)]
    for col in range(n):
        piv = max(range(col, n), key=lambda r: abs(m[r][col]))
        m[col], m[piv] = m[piv], m[col]
        d = m[col][col]
        for r in range(n):
            if r != col and m[r][col] != 0.0:
                f = m[r][col] / d
                for c in range(col, n + 1):
                    m[r][c] -= f * m[col][c]
    return [m[i][n] / m[i][i] for i in range(n)]


def _ridge_fit(
    rows: list[tuple[list[float], float]], l2: float
) -> list[float]:
    """Closed-form ridge with the identity prior: the penalty is
    ``l2·‖w − w_id‖²`` where ``w_id`` puts coefficient 1 on the
    log-estimate and 0 elsewhere — shrinkage toward "trust the base
    estimator", not toward the zero predictor."""
    xtx = [[0.0] * N_FEATURES for _ in range(N_FEATURES)]
    xty = [0.0] * N_FEATURES
    for x, y in rows:
        for i in range(N_FEATURES):
            xi = x[i]
            if xi == 0.0:
                continue
            xty[i] += xi * y
            for j in range(N_FEATURES):
                xtx[i][j] += xi * x[j]
    prior = [0.0] * N_FEATURES
    prior[1] = 1.0  # identity on log10(est)
    for i in range(N_FEATURES):
        xtx[i][i] += l2
        xty[i] += l2 * prior[i]
    return _solve(xtx, xty)


class CardCorrector:
    """Per-arity linear models over the 6-feature log-space encoding.

    ``models`` maps join arity (|tables| in the intermediate) to
    ``(weights, n_samples)``; ``pooled`` is the all-arities fallback for
    arities with too few training rows — including arities never seen in
    training (deeper joins at deploy time than the training workload
    contains, the common cross-workload case)."""

    def __init__(
        self,
        models: Mapping[int, tuple[list[float], int]],
        pooled: tuple[list[float], int],
        max_arity: int | None = None,
    ) -> None:
        self.models = {int(k): (list(w), int(n)) for k, (w, n) in models.items()}
        self.pooled = (list(pooled[0]), int(pooled[1]))
        #: deepest join arity seen in training — the correction's support.
        #: Beyond it the corrector returns the base estimate UNCHANGED:
        #: a linear model extrapolated to feature values (arity, edge
        #: counts) far outside its training range can be wrong by many
        #: orders of magnitude, which is strictly worse than the bias it
        #: was meant to fix. (None = legacy artifact without the bound;
        #: treated as unbounded.)
        self.max_arity = max_arity

    def correct(
        self,
        arity: int,
        estimate: float,
        prod: float,
        min_base: float,
        max_base: float,
        n_edges: int,
    ) -> float:
        """Corrected cardinality, clamped to ``[1, prod]`` (no true join
        result exceeds the cross product of its filtered inputs)."""
        if estimate <= 0:
            return estimate  # a true zero (empty filtered input) stays zero
        if self.max_arity is not None and arity > self.max_arity:
            return estimate  # outside the training support: trust the base
        w, _n = self.models.get(arity, self.pooled)
        x = _features(estimate, prod, min_base, max_base, n_edges)
        pred = 10.0 ** sum(wi * xi for wi, xi in zip(w, x))
        return min(max(1.0, pred), max(prod, 1.0))

    def to_json(self) -> str:
        return json.dumps(
            {
                "features": ["1", "log10_est", "log10_prod", "n_edges",
                             "log10_min_base", "log10_max_base"],
                "models": {str(k): {"w": w, "n": n} for k, (w, n) in self.models.items()},
                "pooled": {"w": self.pooled[0], "n": self.pooled[1]},
                "max_arity": self.max_arity,
            }
        )

    @classmethod
    def from_json(cls, text: str) -> "CardCorrector":
        raw = json.loads(text)
        return cls(
            {int(k): (v["w"], v["n"]) for k, v in raw["models"].items()},
            (raw["pooled"]["w"], raw["pooled"]["n"]),
            raw.get("max_arity"),
        )

    def __repr__(self) -> str:
        arities = ", ".join(
            f"{k}(n={n})" for k, (_w, n) in sorted(self.models.items())
        )
        return (
            f"CardCorrector(arities=[{arities}], "
            f"pooled n={self.pooled[1]})"
        )


def fit_card_corrector(
    samples: Iterable[CardSample],
    *,
    l2: float = 0.5,
    min_arity_samples: int = 12,
) -> CardCorrector:
    """Fit the per-arity corrector from :data:`CardSample` rows. Rows
    with non-positive estimate or actual are dropped (log space; a zero
    actual carries no correctable signal — the base estimator's zero
    propagates unchanged at inference). Arities with fewer than
    ``min_arity_samples`` usable rows fall back to the pooled model."""
    by_arity: dict[int, list[tuple[list[float], float]]] = {}
    pooled_rows: list[tuple[list[float], float]] = []
    for arity, est, prod, min_base, max_base, n_edges, actual in samples:
        if est <= 0 or actual <= 0 or not math.isfinite(est * actual):
            continue
        row = (_features(est, prod, min_base, max_base, n_edges),
               math.log10(actual))
        by_arity.setdefault(int(arity), []).append(row)
        pooled_rows.append(row)
    if not pooled_rows:
        raise ValueError("no usable (features, actual) training rows")
    pooled = (_ridge_fit(pooled_rows, l2), len(pooled_rows))
    models = {
        arity: (_ridge_fit(rows, l2), len(rows))
        for arity, rows in by_arity.items()
        if len(rows) >= min_arity_samples
    }
    return CardCorrector(models, pooled, max_arity=max(by_arity))


class LearnedCardinalityEstimator(CardinalityEstimator):
    """A trained corrector deployed as the stage the reference defines
    for it (ref ``opt/_stages.py:592``): base-estimator components in,
    bias-corrected estimate out. Composes with every consumer of the
    stage — the DP enumerators cost plans on it, and its outputs inject
    through the zero-write plan-time injector like any other
    cardinality source."""

    def __init__(self, corrector: CardCorrector, base=None) -> None:
        if base is None:
            from postbound_spark.optimizer.cardinalities import (
                StatsCardinalityEstimator,
            )

            base = StatsCardinalityEstimator()
        self.corrector = corrector
        self.base = base

    def estimate_cardinality(
        self,
        spec: QuerySpec,
        intermediate: frozenset[str],
        tables: dict[str, DataFrame],
    ) -> float:
        c = self.base.estimate_components(spec, intermediate, tables)
        if len(intermediate) < 2:
            # base-table counts come straight from statistics — exact,
            # nothing to correct
            return c["est"]
        return self.corrector.correct(
            len(intermediate), c["est"], c["prod"], c["min_base"],
            c["max_base"], c["n_edges"],
        )


def training_samples_from_intermediates(
    spark: SparkSession,
    corpus: Mapping[str, str],
    base_tables: Mapping[str, DataFrame],
    cards_frame,
    base_estimator,
) -> list[CardSample]:
    """:data:`CardSample` training rows: an ``intermediate_cardinalities``
    dump (e.g. the committed
    ``experiments/results/joblight_intermediate_cards.parquet``) supplies
    the actuals, the base estimator recomputes its components for each
    recorded intermediate on the same fixture tables (filter-pushed per
    query, the estimator's input convention). One row per
    (query, intermediate) of the dump."""
    from postbound_spark.experiments import _prepared_tables
    from postbound_spark.plans.parser import parse_query, to_query_spec

    out: list[CardSample] = []
    for label, sql in corpus.items():
        sub = cards_frame[cards_frame.label == label]
        if not len(sub):
            continue
        parsed = parse_query(sql.strip().rstrip(";"))
        spec = to_query_spec(parsed)
        tables = _prepared_tables(parsed, base_tables)
        for row in sub.itertuples():
            intermediate = frozenset(row.tables.split())
            c = base_estimator.estimate_components(spec, intermediate, tables)
            out.append(
                (len(intermediate), c["est"], c["prod"], c["min_base"],
                 c["max_base"], c["n_edges"], float(row.cardinality))
            )
    return out
