"""Database facade: execute queries, simplify result sets.

Mirrors the reference's ``Database.execute_query`` surface
(rbergm/PostBOUND ``postbound/db/_db.py:432``) including its result-set
simplification rules (``_db.py:257``): a 1×1 result collapses to a scalar,
a single-column result to a flat list, a single-row result to a tuple —
the ergonomics layer every interactive research loop relies on.
"""

from __future__ import annotations

import weakref

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


#: session -> sf_dir whose views are registered (temp views are
#: session-global, so two Database instances with different dirs would
#: silently re-point each other's queries). Weak keys: the entry dies with
#: the session, and — unlike an ``id()`` key — a recycled object id can
#: never inherit a dead session's binding.
_BOUND_DIRS: "weakref.WeakKeyDictionary[SparkSession, str]" = weakref.WeakKeyDictionary()


class Database:
    """Thin execution facade over a SparkSession + fixture catalog.

    Temp views are SESSION-scoped: one SparkSession binds to one
    ``sf_dir``. A second instance with a different dir raises instead of
    silently re-pointing every earlier instance's table names at the new
    data (use separate sessions, or ``rebind=True`` to move the session
    deliberately)."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str = DEFAULT_SF_DIR,
        rebind: bool = False,
        session_cte_cache: bool = False,
    ):
        bound = _BOUND_DIRS.get(spark)
        if bound is not None and bound != sf_dir and not rebind:
            raise ValueError(
                f"this SparkSession's fixture views are bound to {bound!r}; "
                f"binding {sf_dir!r} would silently re-point existing "
                "Database instances — pass rebind=True to move the session"
            )
        self.spark = spark
        self.sf_dir = sf_dir
        #: opt-in SESSION-scoped MATERIALIZED-CTE sharing: identical
        #: Materialize nodes (value-keyed frozen dataclasses) reuse one
        #: cached frame ACROSS statements — the multi-action case where
        #: df.cache() actually pays (within one statement/action, AQE
        #: exchange reuse already covers it; see
        #: experiments/materialized_cte_multistatement.py). Default OFF:
        #: Postgres MATERIALIZED semantics are statement-scoped, and the
        #: default lifecycle unpersists at statement end. release()
        #: drops the session cache.
        self.session_cte_cache = session_cte_cache
        self._cte_memo: dict = {}
        # binding update BEFORE register_views: the mutation-point guard in
        # catalog.register_views checks _BOUND_DIRS, and a rebind=True move
        # must not trip over the stale binding it is deliberately replacing.
        # Restored on failure — a bad fixture dir must not leave the session
        # bound to views that were never registered (which would then refuse
        # re-registering the still-valid previous dir).
        prev = _BOUND_DIRS.get(spark)
        _BOUND_DIRS[spark] = sf_dir
        try:
            register_views(spark, sf_dir)
        except BaseException:
            if prev is None:
                _BOUND_DIRS.pop(spark, None)
            else:
                _BOUND_DIRS[spark] = prev
            raise

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
        # statement-scoped MATERIALIZED-CTE cache lifecycle: the compiler
        # cache()s each Materialize node; the facade owns the statement
        # boundary, so it unpersists them after the collect (mirror of the
        # pipeline's release_stage_caches) — without this a long-lived
        # session issuing many MATERIALIZED-CTE statements accumulates
        # InMemoryRelations until LRU eviction
        cte_caches: list = []
        # session_cte_cache=True instead SHARES the cache table across
        # statements (value-keyed Materialize nodes) and defers release
        # to release() — the opt-in multi-action mode
        memo = self._cte_memo if self.session_cte_cache else None
        out = None if self.session_cte_cache else cte_caches
        if isinstance(query, str) and native:
            from postbound_spark.operators.compiler import compile_plan
            from postbound_spark.plans.algebra import parse_relalg
            from postbound_spark.plans.parser import parse_query

            # live schema binding (ref parse_query's bind_columns against
            # the connected database, parser.py:2272): unqualified columns
            # — including outer references inside EXISTS/IN subqueries —
            # resolve against the catalog, so the facade accepts the same
            # unbound SQL the reference does
            parsed = parse_query(query, schema=self._live_schema())
            explain = getattr(parsed, "explain", None)
            if explain is not None:
                from dataclasses import replace as _dc_replace

                parsed = _dc_replace(parsed, explain=None)
            df = compile_plan(
                parse_relalg(parsed),
                self.spark,
                materialized_out=out,
                materialized_memo=memo,
            )
            if explain is not None:
                # EXPLAIN returns the PLAN, not the rows (ref Explain
                # clause execution; Spark's own EXPLAIN output shape —
                # one row holding the plan text). ANALYZE maps to the
                # cost-annotated mode (transform.as_explain_analyze).
                mode = "cost" if explain.analyze else "simple"
                jmode = self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    mode
                )
                plan = df._jdf.queryExecution().explainString(jmode)
                return [(plan,)] if raw else plan
        elif isinstance(query, str):
            try:
                df = self.spark.sql(query)
            except Exception as spark_exc:
                # dialect gap fallback: SQL the engine models but Spark's
                # parser rejects (e.g. `WITH v AS MATERIALIZED (…)`,
                # FETCH PRIOR) routes through the native pipeline; if the
                # native parser cannot handle it either, the ORIGINAL
                # Spark error surfaces (it names the actual syntax issue)
                from pyspark.errors import ParseException

                if not isinstance(spark_exc, ParseException):
                    raise
                try:
                    from postbound_spark.operators.compiler import compile_plan
                    from postbound_spark.plans.algebra import parse_relalg
                    from postbound_spark.plans.parser import parse_query

                    df = compile_plan(
                        parse_relalg(
                            parse_query(query, schema=self._live_schema())
                        ),
                        self.spark,
                        materialized_out=out,
                        materialized_memo=memo,
                    )
                except Exception:
                    raise spark_exc from None
        else:
            df = query
        try:
            rows = [tuple(r) for r in df.collect()]
        finally:
            for cached in cte_caches:
                cached.unpersist()
        return rows if raw else simplify_result(rows)

    def _live_schema(self) -> dict[str, list[str]]:
        """{table: columns} over the session's registered views, memoized
        per facade (the view set is fixed for the lifetime of a binding;
        a rebind constructs a new Database)."""
        cached = getattr(self, "_schema_cache", None)
        if cached is None:
            s = self.schema()
            cached = {t: s.columns(t) for t in s.tables()}
            self._schema_cache = cached
        return cached

    def release(self) -> None:
        """End this facade's claim on the session (ref ``close``
        semantics, db/_db.py — the reference's Database closes its
        connection): the fixture-dir BINDING is dropped so other code may
        re-register views for a different dir; already-registered views
        stay (temp views are session-scoped and harmless once unclaimed).
        Idempotent. Also unpersists any session-scoped MATERIALIZED-CTE
        caches (``session_cte_cache=True``)."""
        for cached in self._cte_memo.values():
            cached.unpersist()
        self._cte_memo.clear()
        if _BOUND_DIRS.get(self.spark) == self.sf_dir:
            del _BOUND_DIRS[self.spark]

    def optimizer(self):
        """Entry to the instrumentation layer (mirrors the reference's
        ``database.optimizer()`` accessor shape)."""
        from postbound_spark import optimizer

        return optimizer

    def schema(self) -> "DatabaseSchema":
        """ref ``DatabaseSchema`` db/_db.py:788 — table/column introspection
        over the live catalog."""
        return DatabaseSchema(self.spark)

    def statistics(self, approximate: bool = False):
        """ref ``DatabaseStatistics`` db/_db.py:1965 (emulated mode — the
        same DataFrame-aggregate statistics the optimizer stages consume)."""
        from postbound_spark.optimizer.stats import EmulatedStatistics

        return EmulatedStatistics(self.spark, approximate=approximate)


class DatabaseSchema:
    """Catalog introspection (ref ``DatabaseSchema`` db/_db.py:788:
    ``tables()``, ``columns()``, ``datatype()``; the reference resolves
    against information_schema, here ``spark.catalog`` is the live source).
    Primary/foreign keys come from the fixture sidecar — Spark has no
    constraint catalog (SURVEY.md §7 risk note)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def tables(self) -> list[str]:
        return sorted(t.name for t in self.spark.catalog.listTables())

    def columns(self, table: str) -> list[str]:
        return [c.name for c in self.spark.catalog.listColumns(table)]

    def datatype(self, table: str, column: str) -> str:
        """The backend's type string verbatim (ref ``datatype``
        db/_db.py:1338)."""
        for c in self.spark.catalog.listColumns(table):
            if c.name == column:
                return c.dataType
        raise KeyError(f"{table}.{column}")

    def primary_key(self, table: str) -> str | None:
        from postbound_spark.catalog import PRIMARY_KEYS

        return PRIMARY_KEYS.get(table)

    def foreign_keys(self, table: str) -> dict[str, tuple[str, str]]:
        from postbound_spark.catalog import FOREIGN_KEYS

        return {
            col: target
            for (tab, col), target in FOREIGN_KEYS.items()
            if tab == table
        }
