"""Arbitrary-plan cardinality injection (SURVEY.md §7 plan A prototype).

The base injector (:mod:`postbound_spark.optimizer.injection`) doctors
*base-table* statistics, and ``compile_join_tree`` enforces per-intermediate
cardinalities inside engine-built join pipelines. What was missing — the
reference's pg_lab capability of applying researcher-chosen cardinalities
to ANY query (rbergm/PostBOUND ``postbound/postgres.py:2343-2460``) — is
closed here for queries the engine did *not* hand-build:

1. the target intermediate is expressed as a **named CTE** of the query —
   the natural, parseable splice point (pg_lab names intermediates by
   their table set; a CTE names the same thing in SQL text);
2. the CTE body is materialized once as a *managed* catalog table under
   the CTE's own name (the one table flavor whose restore path honors the
   Hive ``numRows``/``totalSize`` properties — ``injection.py``'s
   validated channel);
3. the injected row count lands in those Hive properties;
4. the outer query is re-rendered with that CTE *removed* — its name now
   resolves to the doctored catalog table, so Catalyst plans the whole
   remaining query (join order, broadcast-vs-shuffle, build side) with
   the researcher's number instead of its own estimate.

Because the splice is by name resolution, not text surgery, the outer
query may be arbitrary SQL — nothing anywhere in the plan needs to have
come from ``compile_join_tree``.

Scale note: the materialization is a one-time write per experiment
intermediate (the reference pays the same price when it ANALYZEs its
hinted temp tables); the *planning* effect is pure metadata. Requires a
Hive-catalog session (``get_spark(enable_hive=True)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from postbound_spark.optimizer.injection import CardinalityInjector
from postbound_spark.plans.parser import parse_query


class IntermediateCardinalityInjector:
    """Plan arbitrary CTE-structured queries under injected per-intermediate
    cardinalities (ref pg_lab ``Card(...)`` hints, ``postgres.py:2343``)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._injector = CardinalityInjector(spark)  # validates Hive catalog
        self._created: list[str] = []

    def plan(self, sql: str, cards: dict[str, float]) -> DataFrame:
        """Return ``sql`` as a DataFrame whose plan was optimized with
        ``cards[name]`` rows assumed for each same-named CTE.

        Every key of ``cards`` must name a CTE of ``sql``; CTEs not named
        stay inline and are planned normally.
        """
        parsed = parse_query(sql)
        cte_names = [name for name, _ in parsed.ctes]
        missing = set(cards) - set(cte_names)
        if missing:
            raise KeyError(
                f"cards name CTEs the query does not define: {sorted(missing)} "
                f"(query CTEs: {cte_names})"
            )
        remaining: list = []
        for name, sub in parsed.ctes:
            if name not in cards:
                remaining.append((name, sub))
                continue
            # never clobber a pre-existing table or temp view: dropping a
            # same-named catalog table would destroy real data (and a CTE
            # shadowing the table its own body reads would drop its source);
            # a temp view would silently win name resolution over the
            # doctored table and the injection would be ignored
            if name not in self._created and self.spark.catalog.tableExists(name):
                raise ValueError(
                    f"CTE {name!r} shadows an existing table/view — rename "
                    "the CTE so the materialized intermediate cannot "
                    "clobber or be shadowed by catalog state"
                )
            # earlier, still-inline CTEs must stay visible to this body —
            # both query kinds absorb them via with_clause (SetQuery
            # carries a cte_clause since round 9, ref qal/_qal.py:9423);
            # earlier *materialized* ones already resolve as catalog tables.
            # Drop outer CTEs the body's OWN ctes shadow: prepending both
            # would render duplicate WITH names, which Spark rejects even
            # though the original query's inner definition legitimately won
            own_ctes = getattr(sub, "ctes", ())
            own_names = {cte_name for cte_name, _ in own_ctes}
            inherited = tuple(
                (cte_name, cte_sub)
                for cte_name, cte_sub in remaining
                if cte_name not in own_names
            )
            body = (
                sub.with_clause(ctes=inherited + own_ctes) if inherited else sub
            )
            self.spark.sql(f"DROP TABLE IF EXISTS {name}")
            self.spark.sql(body.to_sql()).write.mode("overwrite").saveAsTable(name)
            self._created.append(name)
            self._injector.inject(name, cards[name])
        outer = parsed.with_clause(ctes=tuple(remaining))
        return self.spark.sql(outer.to_sql())

    def cleanup(self) -> None:
        """Drop every materialized intermediate this instance created."""
        for name in self._created:
            self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        self._created.clear()
