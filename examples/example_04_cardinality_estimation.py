"""Example 04 — cardinality estimators and plan-time injection.

Mirrors example-04-cardinality-estimation.py: true per-intermediate
counts (PreciseCardinalities), a deliberately distorted decorator
(CardinalityDistortion), and the zero-write plan-time injector sweeping
a researcher-chosen cardinality across the broadcast/sort-merge boundary
(the pg_lab Card() experiment, optimizer/planstats.py).
"""

from __future__ import annotations

SQL = """
SELECT o_orderpriority, count(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
WHERE c_acctbal > 0
GROUP BY o_orderpriority
"""


def main(spark=None, sf_dir=None):
    from _shared import bootstrap

    spark, sf_dir, tables = bootstrap(spark, sf_dir)

    from postbound_spark.experiments import cardinality_sweep
    from postbound_spark.optimizer.cardinalities import (
        CardinalityDistortion,
        PreciseCardinalities,
    )
    from postbound_spark.plans.parser import parse_query, to_query_spec

    spec = to_query_spec(parse_query(SQL))
    precise = PreciseCardinalities()
    distorted = CardinalityDistortion(precise, 10.0)
    key = frozenset({"customer", "orders"})
    true_card = precise.estimate_cardinality(spec, key, tables)
    print(f"|customer x orders| true={true_card:.0f} "
          f"distorted(x10)={distorted.estimate_cardinality(spec, key, tables):.0f}")

    frame = cardinality_sweep(
        spark, SQL, ("customer",), [1e2, 1e4, 1e6, 1e8, 1e9]
    )
    print(frame[["card", "parent_join_operator", "planning_time"]].to_string(index=False))
    return frame


if __name__ == "__main__":
    main()
