"""The 10-minutes tour, runnable top to bottom (docs/10minutes.md).

Counterpart of the reference's ``docs/source/10minutes.rst``: one
walkthrough from SQL text to an enforced, oracle-checked plan. Every
step here is the same call the docs show; the docs and this script are
kept in lockstep by CI (``tests/test_examples.py`` runs this file, and
``tests/test_docs.py`` asserts the doc quotes these calls).
"""

from __future__ import annotations


SQL = """
SELECT n.n_name AS nation, count(*) AS n_customers
FROM customer c, nation n, region r
WHERE c.c_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'EUROPE' AND c.c_acctbal > 0
GROUP BY n.n_name
ORDER BY n_customers DESC, nation
"""


def main(spark, sf_dir: str) -> None:
    # 1. Load tables (memoized parquet handles; events' TIMESTAMP(NANOS)
    #    quirk is handled inside load_table).
    from postbound_spark.catalog import load_table

    for t in ("customer", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

    # 2. Parse SQL into the qal IR — clauses, predicates, join graph.
    from postbound_spark.plans.parser import parse_query, to_query_spec

    parsed = parse_query(SQL)
    assert [t.identifier for t in parsed.from_tables] == ["c", "n", "r"]
    spec = to_query_spec(parsed)
    assert len(spec.edges) == 2

    # 3. Convert to relational algebra and compile to a DataFrame —
    #    each relalg node maps to exactly one DataFrame transformation.
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg

    tree = parse_relalg(parsed)
    df = compile_plan(tree, spark)
    rows = df.collect()
    assert rows, "EUROPE customers exist at every fixture SF"

    # 4. Force a join order: an optimizer stage emits a JoinTree, and the
    #    algebra converter folds the FROM list in that order — enforcement
    #    by construction, no hints needed for ORDER.
    from postbound_spark.experiments import _prepared_tables
    from postbound_spark.optimizer.ues import UESJoinOrderOptimizer

    tables = _prepared_tables(parsed, {t: spark.table(t) for t in ("customer", "nation", "region")})
    jointree = UESJoinOrderOptimizer(spark).optimize_join_order(spec, tables)
    forced = compile_plan(parse_relalg(parsed, join_order=jointree.tables()), spark)
    assert sorted(map(tuple, forced.collect())) == sorted(map(tuple, rows)), (
        "a forced order changes the plan, never the answer"
    )

    # 5. Steer the PHYSICAL plan: inject a cardinality for an arbitrary
    #    intermediate at plan time — zero writes, pg_lab Card() parity.
    from postbound_spark.optimizer.planstats import PlanTimeCardinalityInjector

    with PlanTimeCardinalityInjector(spark) as injector:
        doctored = injector.plan(SQL, {("customer", "nation"): 3}, adaptive=False)
        assert injector.visible_row_count(doctored, ("customer", "nation")) == 3
        assert sorted(map(tuple, doctored.collect())) == sorted(map(tuple, rows))

    # 6. Oracle-check against DuckDB on the same parquet — the repo's
    #    standing correctness pattern (SURVEY.md §5).
    import duckdb

    con = duckdb.connect()
    for t in ("customer", "nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    want = con.execute(SQL).fetchall()
    con.close()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, want))

    print(f"10-minutes tour complete: {len(rows)} nations, oracle-identical")
    return {"nations": len(rows)}
