"""CEB template-driven workload generation (base query + predicate templates).

The Cardinality Estimation Benchmark (Negi et al., "Flow-Loss: Learning
Cardinality Estimates That Matter", PVLDB 2021) generates controlled
VARIANTS of seed queries: a base SQL text with ``<<placeholder>>``
markers plus per-predicate generators that sample substitution values
from the live database. The reference implements this as
``postbound/experiments/ceb.py`` (TOML template files →
``PredicateGenerator``/``QueryTemplate`` → ``generate_workload``); this
module is the Spark-native counterpart with the same template schema:

- ``[base_sql]`` holds the templated query and its alias map;
- each ``[[predicates]]`` entry names its placeholder keys, predicate
  type (``eq`` / ``in`` / ``range``), sampling method (``uniform`` /
  ``weighted``), and either an explicit ``options`` list or a candidate
  ``sql`` query that is run against the LIVE SparkSession (the
  reference runs it against its Postgres connection) — so sampled
  literals always exist in the data and the generated predicates are
  never vacuously empty;
- a predicate may declare ``dependencies``: its candidate SQL can embed
  the ``<<keys>>`` already chosen by the generators it depends on (the
  reference resolves the same ordering through a dependency graph).

Candidate queries are plan-time metadata lookups (DISTINCT over one
column, LIMIT-bounded) — collecting them to the driver is the intended
scale, exactly like the reference's ``_collect_candidate_values_from_sql``.

The difference from :mod:`postbound_spark.querygen` (schema-walk
generator): querygen explores the GRAMMAR by random construction, CEB
explores the SELECTIVITY SPACE of a fixed query shape — both feed the
same parse → compile → DuckDB-oracle property sweep in CI
(``tests/test_cebgen.py``, 200 variants per run).
"""

from __future__ import annotations

import os
import random
import re
from collections.abc import Iterable, Mapping
from datetime import date, datetime
from graphlib import TopologicalSorter

from pyspark.sql import SparkSession

_PLACEHOLDER = re.compile(r"<<([A-Za-z0-9_]+)>>")


class SamplingError(RuntimeError):
    """No candidate value satisfied the template's constraints."""


def _render(value) -> str:
    """SQL literal for a sampled value, portable across Spark and DuckDB."""
    if isinstance(value, str):
        escaped = value.replace("'", "''")
        return f"'{escaped}'"
    if isinstance(value, datetime):
        return f"CAST('{value:%Y-%m-%d %H:%M:%S}' AS TIMESTAMP)"
    if isinstance(value, date):
        return f"CAST('{value:%Y-%m-%d}' AS TIMESTAMP)"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, float):
        return repr(round(value, 6))
    return str(value)


class PredicateGenerator:
    """Samples substitution values for one predicate's placeholders
    (ref ``experiments/ceb.py:81`` — same knobs: predicate type, sampling
    method, explicit options vs candidate SQL, IN-list size bounds,
    dependencies)."""

    def __init__(
        self,
        name: str,
        *,
        keys: list[str],
        pred_type: str,
        sampling_method: str = "uniform",
        sql: str | None = None,
        options: list | None = None,
        min_samples: int = 1,
        max_samples: int | None = None,
        dependencies: Iterable[str] = (),
    ):
        if pred_type not in ("eq", "in", "range"):
            raise ValueError(f"unknown pred_type {pred_type!r} (eq/in/range)")
        if sampling_method not in ("uniform", "weighted"):
            raise ValueError(
                f"unknown sampling_method {sampling_method!r} (uniform/weighted)"
            )
        if pred_type == "range" and len(keys) != 2:
            raise ValueError("range predicates need exactly two keys (lo, hi)")
        if pred_type in ("eq", "in") and len(keys) != 1:
            raise ValueError(f"{pred_type} predicates need exactly one key")
        if (sql is None) == (options is None):
            raise ValueError("provide exactly one of sql= or options=")
        self.name = name
        self.keys = list(keys)
        self.pred_type = pred_type
        self.sampling_method = sampling_method
        self.sql = sql
        self.options = list(options) if options is not None else None
        self.min_samples = min_samples
        self.max_samples = max_samples
        self.dependencies = tuple(dependencies)
        self._cache: dict[str, list[tuple]] = {}

    def _candidates(
        self, spark: SparkSession, chosen: Mapping[str, str]
    ) -> list[tuple]:
        if self.options is not None:
            return [v if isinstance(v, tuple) else (v,) for v in self.options]
        sql = _PLACEHOLDER.sub(lambda m: chosen[m.group(1)], self.sql)
        if sql not in self._cache:  # candidate lists are tiny; memoize per
            rows = spark.sql(sql).collect()  # substituted text so a 200-query
            # sorted: collect() order is engine/partitioning-dependent, and
            # rng.choice indexes into this list — "deterministic in seed"
            # must hold across machines, not just within one session
            self._cache[sql] = sorted(
                (tuple(r) for r in rows),
                key=lambda t: tuple((v is None, str(v)) for v in t),
            )  # sweep stays cheap
        candidates = self._cache[sql]
        if not candidates:
            raise SamplingError(
                f"predicate {self.name!r}: candidate query returned no rows"
            )
        return candidates

    def _draw(self, rng: random.Random, candidates: list[tuple]):
        if self.sampling_method == "weighted":
            # last column is the weight (ref _remove_weight_col)
            weights = [max(float(c[-1]), 0.0) for c in candidates]
            values = [c[:-1] if len(c) > 1 else c for c in candidates]
            if sum(weights) <= 0:
                raise SamplingError(f"predicate {self.name!r}: all weights zero")
            return rng.choices(values, weights=weights, k=1)[0]
        return rng.choice(candidates)

    def choose(
        self, rng: random.Random, spark: SparkSession, chosen: Mapping[str, str]
    ) -> dict[str, str]:
        """Sample this predicate's placeholder substitutions; ``chosen``
        carries the values of every dependency, available as
        ``<<key>>`` inside the candidate SQL."""
        candidates = self._candidates(spark, chosen)
        if self.pred_type == "eq":
            return {self.keys[0]: _render(self._draw(rng, candidates)[0])}
        if self.pred_type == "in":
            hi = min(self.max_samples or len(candidates), len(candidates))
            lo = min(self.min_samples, hi)
            k = rng.randint(lo, hi)
            seen: dict = {}
            for _ in range(20 * k):
                v = self._draw(rng, candidates)[0]
                seen.setdefault(v, None)
                if len(seen) == k:
                    break
            rendered = ", ".join(_render(v) for v in seen)
            return {self.keys[0]: rendered}
        # range: draw two values from the same candidate column, sorted
        a = self._draw(rng, candidates)[0]
        b = self._draw(rng, candidates)[0]
        lo_v, hi_v = (a, b) if a <= b else (b, a)
        return {self.keys[0]: _render(lo_v), self.keys[1]: _render(hi_v)}


class QueryTemplate:
    """A base query plus its predicate generators (ref
    ``experiments/ceb.py:486``)."""

    max_tries = 10

    def __init__(self, base_sql: str, *, label: str):
        self.base_sql = base_sql
        self.label = label
        self._generators: dict[str, PredicateGenerator] = {}
        self._key_owner: dict[str, str] = {}

    def register_generator(self, gen: PredicateGenerator) -> None:
        if gen.name in self._generators:
            raise KeyError(f"predicate {gen.name!r} already registered")
        for key in gen.keys:
            if key in self._key_owner:
                raise KeyError(f"placeholder {key!r} already registered")
            self._key_owner[key] = gen.name
        self._generators[gen.name] = gen

    def _ordered(self) -> list[PredicateGenerator]:
        ts = TopologicalSorter(
            {name: set(g.dependencies) for name, g in self._generators.items()}
        )
        return [self._generators[name] for name in ts.static_order()]

    def instantiate(self, rng: random.Random, spark: SparkSession) -> str:
        chosen: dict[str, str] = {}
        for gen in self._ordered():
            chosen.update(gen.choose(rng, spark, chosen))
        missing = set(_PLACEHOLDER.findall(self.base_sql)) - set(chosen)
        if missing:
            raise SamplingError(
                f"template {self.label!r}: no generator for {sorted(missing)}"
            )
        return _PLACEHOLDER.sub(lambda m: chosen[m.group(1)], self.base_sql)


def template_from_toml(path: str) -> QueryTemplate:
    """Parse a CEB template file (same TOML schema as the reference,
    ``experiments/ceb.py:679``: ``title``, ``[base_sql] sql``, and
    ``[[predicates]]`` with name/keys/type/sampling_method/pred_type/
    columns/sql/options/min_samples/max_samples/dependencies)."""
    import tomllib

    with open(path, "rb") as fh:
        contents = tomllib.load(fh)
    template = QueryTemplate(
        contents["base_sql"]["sql"], label=contents["title"]
    )
    for raw in contents.get("predicates", []):
        template.register_generator(
            PredicateGenerator(
                raw["name"],
                keys=[
                    k.removeprefix("<<").removesuffix(">>")
                    for k in raw["keys"]
                ],
                pred_type=raw["pred_type"],
                sampling_method=raw.get("sampling_method", "uniform"),
                sql=raw.get("sql"),
                options=raw.get("options"),
                min_samples=raw.get("min_samples", 1),
                max_samples=raw.get("max_samples"),
                dependencies=raw.get("dependencies", []),
            )
        )
    return template


def generate_workload(
    templates: Iterable[QueryTemplate] | str,
    *,
    spark: SparkSession,
    queries_per_template: int,
    seed: int = 0,
) -> dict[str, str]:
    """N instantiations per template → ``{label-i: sql}`` (ref
    ``generate_raw_workload``, ``experiments/ceb.py:721``). ``templates``
    may be a directory of ``*.toml`` files. Deterministic in ``seed``.
    Retries each draw up to ``max_tries`` on sampling errors; duplicate
    texts are retried too, then kept (small candidate domains cannot
    always fill N distinct variants)."""
    if isinstance(templates, str):
        import glob

        templates = [
            template_from_toml(p)
            for p in sorted(glob.glob(os.path.join(templates, "*.toml")))
        ]
    rng = random.Random(seed)
    out: dict[str, str] = {}
    seen: set[str] = set()
    for template in templates:
        for i in range(1, queries_per_template + 1):
            sql = None
            for _ in range(QueryTemplate.max_tries):
                try:
                    candidate = template.instantiate(rng, spark)
                except SamplingError:
                    continue
                sql = candidate
                if candidate not in seen:
                    break
            if sql is None:
                raise SamplingError(
                    f"template {template.label!r}: no valid instantiation "
                    f"after {QueryTemplate.max_tries} tries"
                )
            seen.add(sql)
            out[f"{template.label}-{i}"] = sql
    return out
