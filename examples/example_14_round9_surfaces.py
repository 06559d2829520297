"""Example 14 — round-9 SQL surface: Postgres array operators, set-query
OFFSET/WITH, window+LIMIT ordering, session-scoped MATERIALIZED caching.

Walks the surfaces added in round 9, all through the engine's NATIVE
pipeline (parse_query → parse_relalg → compile_plan — spark.sql never
sees the text):

1. Postgres array-operator spellings ``@>`` / ``<@`` / ``&&``
   (ref LogicalOperator Contains/ContainedBy/Overlaps,
   qal/_qal.py:55-58) — lowered to Spark's lambda-free
   ``array_except`` / ``arrays_overlap`` built-ins;
2. OFFSET and a WITH clause on a SET query (ref SetQuery limit_clause
   incl. offset :9425/:9449 and cte_clause :9423);
3. window functions + ORDER BY + LIMIT — the Sort sits ABOVE the
   window-bearing projection (the round-9 ordering fix), including
   ordering on a column the projection drops;
4. ``Database(session_cte_cache=True)`` — a MATERIALIZED CTE shared
   ACROSS statements (measured 6.43× for 6 statements at sf0.1,
   BASELINE §Round-9), released by ``db.release()``.
"""

from __future__ import annotations


def main(spark=None, sf_dir=None):
    from _shared import bootstrap

    spark, sf_dir, _tables = bootstrap(spark, sf_dir)

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query

    cat = load_tables(spark, sf_dir, ["region", "nation", "customer"])

    def run(sql: str):
        return compile_plan(parse_relalg(parse_query(sql)), spark, cat)

    print("===== 1. Postgres array operators @> / <@ / && : =====\n")
    df = run(
        "SELECT n_name FROM nation "
        "WHERE ARRAY[n_name] <@ ARRAY['KENYA', 'PERU', 'JAPAN'] "
        "   OR ARRAY[n_name, 'x'] && ARRAY['CANADA'] "
        "ORDER BY n_name"
    )
    print([r.n_name for r in df.collect()])

    print("\n===== 2. WITH + OFFSET on a set query: =====\n")
    df = run(
        "WITH r AS (SELECT r_name AS nm FROM region) "
        "SELECT nm FROM r UNION SELECT n_name FROM nation "
        "ORDER BY nm LIMIT 5 OFFSET 3"
    )
    print([r.nm for r in df.collect()])

    print("\n===== 3. window + ORDER BY + LIMIT (sort above the window): =====\n")
    df = run(
        "SELECT c_name, count(*) OVER (PARTITION BY c_mktsegment) AS seg_n "
        "FROM customer ORDER BY c_custkey LIMIT 3"
    )
    for r in df.collect():
        print(r.c_name, r.seg_n)

    print("\n===== 4. session-scoped MATERIALIZED-CTE cache: =====\n")
    from postbound_spark.database import Database

    db = Database(spark, sf_dir, rebind=True, session_cte_cache=True)
    try:
        cte = (
            "WITH seg AS MATERIALIZED (SELECT c_mktsegment AS s, count(*) "
            "AS n FROM customer GROUP BY c_mktsegment) "
        )
        print("statement 1:", db.execute_query(cte + "SELECT count(*) FROM seg"))
        # statement 2 REUSES the cached InMemoryRelation (same CTE value)
        print(
            "statement 2:",
            db.execute_query(cte + "SELECT CAST(max(n) AS BIGINT) FROM seg"),
        )
    finally:
        db.release()  # unpersists the session cache

    return df


if __name__ == "__main__":
    main()
