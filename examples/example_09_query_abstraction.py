"""Example 09 — the query abstraction layer (qal IR).

Mirrors example-09-query-abstraction.py: parse SQL into the IR, inspect
clauses and predicates (join vs filter classification, equivalence
classes), apply a semantics-preserving transformation, and round-trip
back to SQL.
"""

from __future__ import annotations

SQL = """
SELECT c_mktsegment, count(*) AS n
FROM customer, orders, nation
WHERE c_custkey = o_custkey AND c_nationkey = n_nationkey
  AND c_acctbal BETWEEN 100 AND 5000 AND n_name = 'NATION_3'
GROUP BY c_mktsegment
"""


def main(spark=None, sf_dir=None):
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.plans.transform import as_count_star_query

    q = parse_query(SQL)
    preds = q.predicates()
    print("join predicates:  ", [p.to_sql() for p in preds.joins()])
    print("filter predicates:", [p.to_sql() for p in preds.filters()])

    counted = as_count_star_query(q)
    print("count-star form:  ", " ".join(counted.to_sql().split())[:100])

    rt = parse_query(q.to_sql())
    print("round-trip fixpoint:", rt == q)
    return q


if __name__ == "__main__":
    main()
