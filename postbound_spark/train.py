"""Training-data management for learned optimizer components.

Mirrors the reference's ``train/`` package (rbergm/PostBOUND
``postbound/train/_train.py:46`` ``TrainingSpec``, ``:217``
``TrainingData``, ``:461`` ``TrainingDataRepository``): a *spec* is the
shared vocabulary binding datasets to the pipelines that consume them
(``query``, ``runtime_ms``, ``query_plan``, ``estimated_cost``,
``cardinality`` plus free-form custom features), a *dataset* is tabular
samples tagged with the spec it provides, and the *repository* retrieves
registered datasets by requirement.

The Spark-first part is the sample **generators** at the bottom:
:func:`collect_query_samples` executes a workload and emits one
(query, runtime_ms, cardinality, estimated_cost, query_plan) row per
query, and :func:`collect_cardinality_samples` emits one row per JOIN
intermediate with Catalyst's estimate next to the executed actual — the
(features, label) shape learned cardinality estimators (MSCN-style) train
on. Both reuse the optimizer-research loop's plan introspection, so the
labels come from the same executed plans the experiments measure: the
generators add no second execution path to maintain.

Storage is parquet via :meth:`TrainingData.to_parquet` /
:meth:`TrainingData.from_parquet` with features encoded as column names —
self-describing files that round-trip without a sidecar.
"""

from __future__ import annotations

import time
import warnings
from collections.abc import Iterable, Mapping, Sequence

import pandas as pd

__all__ = [
    "TrainingSpec",
    "SpecViolations",
    "TrainingData",
    "TrainingDataRepository",
    "collect_query_samples",
    "collect_cardinality_samples",
]

#: features with out-of-the-box vocabulary status (ref _train.py:25);
#: anything else is a custom feature and flows through unchanged
WELL_KNOWN_FEATURES = (
    "query",
    "runtime_ms",
    "query_plan",
    "estimated_cost",
    "cardinality",
)


class SpecViolations:
    """Features a dataset was required to provide but does not.

    Truthy when everything required is present, so ``if violations:`` reads
    as "the spec is satisfied" (ref _train.py:173 keeps the same polarity:
    ``contains_violations`` is the negation).
    """

    def __init__(self, missing: Iterable[str]) -> None:
        self.missing_features: tuple[str, ...] = tuple(missing)

    def contains_violations(self) -> bool:
        return bool(self.missing_features)

    def __bool__(self) -> bool:
        return not self.missing_features

    def __repr__(self) -> str:
        return f"SpecViolations(missing={list(self.missing_features)})"


class TrainingSpec:
    """An ordered set of feature names — the contract between a dataset
    (which *provides* features) and a training pipeline (which *requires*
    them). Order matters for column alignment, not for compatibility
    (ref _train.py:46)."""

    def __init__(self, *features: str | Iterable[str]) -> None:
        flat: list[str] = []
        for f in features:
            if isinstance(f, str):
                flat.append(f)
            else:
                flat.extend(f)
        seen: dict[str, None] = {}
        for f in flat:
            seen.setdefault(f, None)
        self._features: tuple[str, ...] = tuple(seen)

    @property
    def features(self) -> tuple[str, ...]:
        return self._features

    def provides(self, feature: str | Iterable[str]) -> bool:
        wanted = [feature] if isinstance(feature, str) else list(feature)
        return all(f in self._features for f in wanted)

    # a requirements-spec "requires" exactly the features it lists
    requires = provides

    def satisfies(self, required: "TrainingSpec") -> SpecViolations:
        """Which of ``required``'s features this (provider) spec lacks."""
        return SpecViolations(
            f for f in required._features if f not in self._features
        )

    def __iter__(self):
        return iter(self._features)

    def __len__(self) -> int:
        return len(self._features)

    def __hash__(self) -> int:
        return hash(frozenset(self._features))

    def __eq__(self, other: object) -> bool:
        return isinstance(other, TrainingSpec) and frozenset(
            self._features
        ) == frozenset(other._features)

    def __repr__(self) -> str:
        return f"TrainingSpec({', '.join(self._features)})"


class TrainingData:
    """Tabular training samples plus the spec they provide
    (ref _train.py:217).

    ``feature_map`` maps feature names to the column in ``samples`` that
    carries them, which absorbs renamed raw columns (a frame with a
    ``sql_text`` column provides the ``query`` feature via
    ``{"query": "sql_text"}``).
    """

    def __init__(
        self,
        samples: pd.DataFrame,
        *,
        feature_map: Mapping[str, str],
        source: str | None = None,
    ) -> None:
        missing_cols = [c for c in feature_map.values() if c not in samples.columns]
        if missing_cols:
            raise ValueError(
                f"feature_map points at absent columns: {missing_cols}"
            )
        self._samples = samples
        self._feature_map = dict(feature_map)
        self._source = source
        self._spec = TrainingSpec(self._feature_map)

    # -- construction -----------------------------------------------------

    @staticmethod
    def from_df(df: pd.DataFrame, *, source: str | None = None) -> "TrainingData":
        """Infer the spec from the column names — every column is a
        feature named after itself (ref _train.py:321)."""
        return TrainingData(
            df, feature_map={c: c for c in df.columns}, source=source
        )

    @staticmethod
    def from_parquet(path: str) -> "TrainingData":
        return TrainingData.from_df(pd.read_parquet(path), source=str(path))

    @staticmethod
    def merge(
        datasets: Iterable["TrainingData"], *, according_to: TrainingSpec
    ) -> "TrainingData":
        """Concatenate datasets that all satisfy ``according_to``,
        conformed to exactly that spec."""
        conformed = [ds.conform_to(according_to) for ds in datasets]
        if not conformed:
            raise ValueError("cannot merge zero datasets")
        frames = [ds.as_df() for ds in conformed]
        return TrainingData.from_df(pd.concat(frames, ignore_index=True))

    # -- introspection ----------------------------------------------------

    @property
    def samples(self) -> pd.DataFrame:
        return self._samples

    @property
    def feature_map(self) -> Mapping[str, str]:
        return dict(self._feature_map)

    @property
    def source(self) -> str | None:
        return self._source

    @property
    def spec(self) -> TrainingSpec:
        return self._spec

    def provides(self, feature: str) -> bool:
        return self._spec.provides(feature)

    def satisfies(self, spec: TrainingSpec) -> SpecViolations:
        return self._spec.satisfies(spec)

    # -- shaping ----------------------------------------------------------

    def conform_to(
        self, features: TrainingSpec | Iterable[str]
    ) -> "TrainingData":
        """Project to exactly the given features, in their order; raises
        when a required feature is absent."""
        spec = features if isinstance(features, TrainingSpec) else TrainingSpec(features)
        violations = self._spec.satisfies(spec)
        if violations.contains_violations():
            raise ValueError(
                f"dataset lacks required features: {violations.missing_features}"
            )
        return TrainingData(
            self._samples,
            feature_map={f: self._feature_map[f] for f in spec},
            source=self._source,
        )

    def as_df(self, spec: TrainingSpec | None = None) -> pd.DataFrame:
        """Samples with columns RENAMED to feature names (and projected /
        reordered to ``spec`` when given)."""
        shaped = self if spec is None else self.conform_to(spec)
        cols = [shaped._feature_map[f] for f in shaped._spec]
        return shaped._samples[cols].set_axis(list(shaped._spec), axis="columns")

    def merge_with(self, other: "TrainingData") -> "TrainingData":
        """Append ``other``'s samples; it must satisfy this dataset's
        spec, which the result keeps."""
        return TrainingData.merge([self, other], according_to=self._spec)

    def to_parquet(self, path: str) -> None:
        """Persist with features as column names (self-describing:
        ``from_parquet`` re-infers the identical spec)."""
        self.as_df().to_parquet(path, index=False)

    # -- container protocol -----------------------------------------------

    def __len__(self) -> int:
        return len(self._samples)

    def __getitem__(self, idx: int) -> list:
        row = self._samples.iloc[idx]
        return [row[self._feature_map[f]] for f in self._spec]

    def __iter__(self):
        return (self[i] for i in range(len(self)))

    def __repr__(self) -> str:
        src = self._source or "intermediate"
        return f"TrainingData({src!r}, features=[{', '.join(self._spec)}])"


class TrainingDataRepository:
    """Registry of datasets retrievable by requirement spec
    (ref _train.py:461)."""

    def __init__(self) -> None:
        self._datasets: list[TrainingData] = []

    def register(self, data: TrainingData) -> "TrainingDataRepository":
        self._datasets.append(data)
        return self

    def retrieve_all(self, spec: TrainingSpec) -> Sequence[TrainingData]:
        return [ds for ds in self._datasets if ds.satisfies(spec)]

    def retrieve_first(self, spec: TrainingSpec) -> TrainingData | None:
        for ds in self._datasets:
            if ds.satisfies(spec):
                return ds.conform_to(spec)
        return None

    def retrieve_merged(self, spec: TrainingSpec) -> TrainingData | None:
        matching = self.retrieve_all(spec)
        if not matching:
            return None
        return TrainingData.merge(matching, according_to=spec)


# ---------------------------------------------------------------------------
# Spark-side sample generators
# ---------------------------------------------------------------------------


def collect_query_samples(
    spark,
    queries: Mapping[str, str],
    base_tables: Mapping[str, object],
) -> TrainingData:
    """Execute every workload query once and emit the reference's
    out-of-the-box feature set per query: the text, wall-clock runtime,
    result cardinality, Catalyst's optimized-plan cost surrogate
    (``sizeInBytes`` — Spark's only native cost scalar), and the canonical
    executed plan (join/scan skeleton, stable across ids).

    This is the dataset a runtime-prediction model trains on; it reuses
    the experiment loop's compile path so features describe exactly the
    plans the engine really runs.
    """
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.optimizer.qep import executed_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query

    rows = []
    for label, sql in queries.items():
        parsed = parse_query(sql)
        df = compile_plan(parse_relalg(parsed), spark, catalog=dict(base_tables))
        t0 = time.perf_counter()
        n_rows = len(df.collect())
        runtime_ms = (time.perf_counter() - t0) * 1000.0
        est_cost = float(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        rows.append(
            {
                "label": label,
                "query": sql,
                "runtime_ms": runtime_ms,
                "cardinality": n_rows,
                "estimated_cost": est_cost,
                "query_plan": executed_plan(df).canonical(),
            }
        )
    return TrainingData.from_df(pd.DataFrame(rows))


def collect_cardinality_samples(
    spark,
    queries: Mapping[str, str],
    base_tables: Mapping[str, object],
) -> TrainingData:
    """One sample per JOIN intermediate of every executed query: the
    query text, the join's position in post-order, Catalyst's logical
    estimate, and the executed actual — estimate-vs-label pairs for a
    learned cardinality estimator, plus the resulting q-error for
    filtering/weighting (the reference collects the same pairs from
    EXPLAIN ANALYZE, ``_qep.py:1575``)."""
    from postbound_spark.experiments import join_qerrors
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query

    rows = []
    for label, sql in queries.items():
        parsed = parse_query(sql)
        df = compile_plan(parse_relalg(parsed), spark, catalog=dict(base_tables))
        df.collect()
        try:
            pairs = join_qerrors(df)
        except ValueError as exc:  # AQE rewrote the plan → pairing unsafe
            warnings.warn(f"{label}: skipping q-error samples — {exc}")
            continue
        for pair in pairs:
            rows.append(
                {
                    "label": label,
                    "query": sql,
                    "join_position": pair["join"],
                    "estimated_cardinality": pair["estimate"],
                    "cardinality": pair["actual"],
                    "qerror": pair["qerror"],
                }
            )
    return TrainingData.from_df(pd.DataFrame(rows))
