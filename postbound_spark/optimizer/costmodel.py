"""Calibrated per-operator cost constants — measured, not asserted.

The reference's native cost model (ref ``opt/native.py:57``
``NativeCostModel``) prices plans with the backend's own calibrated
constants (Postgres's ``seq_page_cost``/``cpu_tuple_cost`` family).
Spark exposes no such constants, and the repo's DP stages priced join
families with hand-asserted relative factors
(:class:`~postbound_spark.optimizer.pgdp.PostgresStyleDynProg`'s
``SHUFFLE_FACTOR = 1.0`` / ``SORT_FACTOR = 1.2`` / ``BROADCAST_FACTOR
= 0.1``) or pure C_out
(:class:`~postbound_spark.optimizer.stages.CoutCostModel`). This module
replaces assertion with measurement:

- :class:`CostConstants` — per-row costs for the five operator
  families (scan, broadcast build, shuffle exchange, sort, output
  materialization) plus a fixed per-job overhead; JSON round-trip for
  committed artifacts; ``pgdp_factors()`` renders them as the relative
  factors the pathlist DP consumes.
- :func:`fit_cost_constants` — ridge least squares of measured probe
  runtimes on per-family row counts. The probes
  (``experiments/run_cost_calibration.py``) execute the SAME two-table
  join under each forced physical operator at several input sizes, so
  the family constants are identified by runtime DIFFERENCES at equal
  inputs — the cleanest signal a black-box engine offers.
- :class:`CalibratedCostModel` — drop-in
  :class:`~postbound_spark.optimizer.stages.CostModel` for the textbook
  pipeline: per join it charges the output rows plus the CHEAPEST
  feasible family's input-row cost (mirroring the operator choice the
  enumerator will make), so join orders are ranked by what they will
  actually cost to execute rather than by cardinality alone.

Determinism: the fit is closed-form; at inference everything is O(1)
arithmetic per join. Committed artifact:
``experiments/results/cost_constants.json``.
"""

from __future__ import annotations

import json
import math
from dataclasses import asdict, dataclass
from typing import TYPE_CHECKING

from postbound_spark.optimizer.stages import CostModel

if TYPE_CHECKING:
    from postbound_spark.optimizer.jointree import JoinTree
    from postbound_spark.optimizer.stages import (
        CardinalityEstimator,
        PlanParameterization,
        QuerySpec,
    )

__all__ = ["CostConstants", "CalibratedCostModel", "fit_cost_constants"]


@dataclass(frozen=True)
class CostConstants:
    """Per-row operator costs in seconds (absolute values only matter
    relative to each other — the DP ranks, never predicts wall time)."""

    fixed: float  # per-probe overhead (job launch, codegen) — not a rank input
    scan_row: float
    broadcast_build_row: float
    shuffle_row: float
    sort_row: float
    out_row: float

    def pgdp_factors(self) -> dict[str, float]:
        """The pathlist DP's relative factors (its cost unit is "output
        rows", i.e. out_row ≡ 1)."""
        unit = max(self.out_row, 1e-12)
        return {
            "SHUFFLE_FACTOR": self.shuffle_row / unit,
            "SORT_FACTOR": self.sort_row / unit,
            "BROADCAST_FACTOR": self.broadcast_build_row / unit,
        }

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "CostConstants":
        return cls(**json.loads(text))

    @classmethod
    def load(cls, path: str) -> "CostConstants":
        with open(path) as fh:
            return cls.from_json(fh.read())


def fit_cost_constants(
    probes: list[dict], *, l2: float = 1e-9, floor: float = 1e-10
) -> CostConstants:
    """Ridge least squares of ``runtime_sec`` on the probe features
    ``scan_rows`` / ``broadcast_rows`` / ``shuffle_rows`` / ``sort_rows``
    / ``out_rows`` (+ intercept). Negative solutions (possible when a
    family is never exercised or probes are collinear) clamp to
    ``floor`` — a cost constant can never be a discount."""
    import numpy as np

    feats = ["scan_rows", "broadcast_rows", "shuffle_rows", "sort_rows", "out_rows"]
    x = np.array(
        [[1.0] + [float(p.get(f, 0.0)) for f in feats] for p in probes]
    )
    y = np.array([float(p["runtime_sec"]) for p in probes])
    # scale-normalize columns so one l2 fits both the intercept (O(1))
    # and the row counts (O(1e6))
    scale = np.maximum(np.abs(x).max(axis=0), 1e-12)
    xs = x / scale
    a = xs.T @ xs + l2 * np.eye(xs.shape[1])
    w = np.linalg.solve(a, xs.T @ y) / scale
    fixed, c_scan, c_bc, c_sh, c_sort, c_out = (float(v) for v in w)
    return CostConstants(
        fixed=max(fixed, 0.0),
        scan_row=max(c_scan, floor),
        broadcast_build_row=max(c_bc, floor),
        shuffle_row=max(c_sh, floor),
        sort_row=max(c_sort, floor),
        out_row=max(c_out, floor),
    )


class CalibratedCostModel(CostModel):
    """Calibrated-constant plan costing for the textbook pipeline.

    Per join node: ``out_row·|out|`` plus the cheapest feasible
    family's input cost — ``broadcast_build_row·build`` while the build
    side fits the broadcast budget, else
    ``min(shuffle_row, sort_row)·(l + r)``; leaves charge
    ``scan_row·rows``. This prices exactly the operator choice
    :class:`~postbound_spark.optimizer.dynprog.SelingerPlanEnumerator`
    will enforce, so order ranking and operator choice can no longer
    disagree the way pure C_out allowed (a cheap-cardinality order can
    still be expensive when none of its build sides broadcast)."""

    def __init__(
        self,
        spec: "QuerySpec",
        tables: dict,
        estimator: "CardinalityEstimator",
        constants: CostConstants,
        broadcast_threshold_rows: float = 1_000_000,
    ):
        self.spec = spec
        self.tables = tables
        self.estimator = estimator
        self.constants = constants
        self.broadcast_threshold_rows = broadcast_threshold_rows

    def _rows(self, subset: frozenset, params: "PlanParameterization") -> float:
        card = params.cardinality_of(subset)
        if math.isnan(card):
            card = self.estimator.estimate_cardinality(
                self.spec, subset, self.tables
            )
        return card

    def cost(self, tree: "JoinTree", params: "PlanParameterization") -> float:
        c = self.constants
        total = 0.0

        def walk(node: "JoinTree") -> float:
            nonlocal total
            subset = frozenset(node.tables())
            rows = self._rows(subset, params)
            if math.isnan(rows):
                return math.nan
            if node.is_leaf:
                total += c.scan_row * rows
                return rows
            l_rows = walk(node.outer)
            r_rows = walk(node.inner)
            if math.isnan(l_rows) or math.isnan(r_rows):
                return math.nan
            build = min(l_rows, r_rows)
            if build <= self.broadcast_threshold_rows:
                family = c.broadcast_build_row * build
            else:
                family = min(c.shuffle_row, c.sort_row) * (l_rows + r_rows)
            total += family + c.out_row * rows
            return rows

        if math.isnan(walk(tree)):
            return math.nan
        return total
