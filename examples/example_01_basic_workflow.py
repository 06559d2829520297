"""Example 01 — the basic optimize-then-execute workflow.

Mirrors the reference's example-01-basic-workflow.py: parse a query into
the IR, run it through a named optimization preset (here UES pessimistic
ordering), and execute the resulting plan — the one-screen tour of the
parse → optimize → compile → execute loop.
"""

from __future__ import annotations

SQL = """
SELECT n.n_name, count(*) AS n_orders
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > 0
GROUP BY n.n_name
ORDER BY n_orders DESC, n.n_name
"""


def main(spark=None, sf_dir=None):
    from _shared import bootstrap

    spark, sf_dir, tables = bootstrap(spark, sf_dir)

    from pyspark.sql import functions as F

    from postbound_spark.optimizer.presets import apply_standard_settings
    from postbound_spark.plans.parser import parse_query, to_query_spec

    parsed = parse_query(SQL)
    spec = to_query_spec(parsed)
    print("tables in the join graph:", sorted(spec.tables))

    pipeline = apply_standard_settings(spark, "ues")
    # aliased frames with each table's own filters pushed below the joins
    # — the placement every ordering stage assumes
    preds = parsed.predicates()
    prepared = {}
    for tref in parsed.from_tables:
        df = tables[tref.full_name].alias(tref.identifier)
        table_filters = preds.filters_for(tref.identifier)
        if table_filters:
            df = df.filter(
                F.expr(" AND ".join(p.to_sql() for p in table_filters))
            )
        prepared[tref.identifier] = df
    planned = pipeline.optimize_query(spec, prepared)
    print("UES join order:", " -> ".join(planned.join_order.tables()))

    df = planned.to_dataframe(prepared)
    # the ordering/grouping clauses live in the IR; apply the tail here
    out = (
        df.groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "n_name")
    )
    for row in out.collect()[:5]:
        print(f"  {row['n_name']}: {row['n_orders']}")
    return out


if __name__ == "__main__":
    main()
