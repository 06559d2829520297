"""Example 13 — round-8 SQL surface: CTE forms, scalar subqueries,
directional join forcing.

Walks the surfaces added in round 8, all through the engine's NATIVE
pipeline (parse_query → parse_relalg → compile_plan — spark.sql never
sees the text):

1. CTE target-column lists — ``WITH v(a, b) AS (SELECT …)``
   (ref WithQuery target columns, qal/_qal.py:5304);
2. VALUES-backed CTEs as banding dimensions
   (ref ValuesWithQuery, qal/_qal.py:5469);
3. ``AS MATERIALIZED`` — compiled to ONE shared ``df.cache()`` across
   every reference (ref CommonTableExpression flag, qal/_qal.py:5605);
4. scalar subqueries: uncorrelated ones lift to 1-row broadcast cross
   products, correlated aggregates decorrelate into GROUP BY
   correlation keys + LEFT join (Catalyst's DecorrelateInnerQuery
   rewrite, expressed in the IR);
5. directional join forcing — ``DirectionalJoinAssignment`` pins which
   side Spark BUILDS (hash table / broadcast) per join
   (ref DirectionalJoinOperatorAssignment, _hints.py:1119).
"""

from __future__ import annotations


def main(spark=None, sf_dir=None):
    from _shared import bootstrap

    spark, sf_dir, _tables = bootstrap(spark, sf_dir)

    from postbound_spark.catalog import load_tables
    from postbound_spark.operators.compiler import compile_plan
    from postbound_spark.plans.algebra import parse_relalg
    from postbound_spark.plans.parser import parse_query

    cat = load_tables(
        spark, sf_dir, ["region", "nation", "customer", "orders"]
    )

    def run(sql: str):
        return compile_plan(parse_relalg(parse_query(sql)), spark, cat)

    print("===== 1. CTE target-column list: =====\n")
    df = run(
        "WITH regions(rk, rname) AS (SELECT r_regionkey, r_name FROM region) "
        "SELECT rname FROM regions WHERE rk < 2 ORDER BY rname"
    )
    print([r.rname for r in df.collect()])

    print("\n===== 2. VALUES-backed CTE as a banding dimension: =====\n")
    df = run(
        "WITH band(name, lo, hi) AS (VALUES ('low', 0, 500), ('high', 500, 100000000)) "
        "SELECT band.name AS band_name, count(*) AS n FROM orders "
        "JOIN band ON o_totalprice >= band.lo AND o_totalprice < band.hi "
        "GROUP BY band.name ORDER BY band.name"
    )
    for r in df.collect():
        print(r.band_name, r.n)

    print("\n===== 3. MATERIALIZED CTE — one cache, two references: =====\n")
    df = run(
        "WITH sizes AS MATERIALIZED (SELECT c_nationkey, count(*) AS members "
        "FROM customer GROUP BY c_nationkey) "
        "SELECT count(*) AS same_size_pairs FROM sizes a, sizes b "
        "WHERE a.members = b.members AND a.c_nationkey < b.c_nationkey"
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    print("pairs:", df.collect()[0][0])
    print("InMemoryRelation in plan:", "InMemoryRelation" in plan)
    spark.catalog.clearCache()

    print("\n===== 4. scalar subqueries (uncorrelated + correlated): =====\n")
    df = run(
        "SELECT c_custkey, "
        "(SELECT count(*) FROM orders WHERE o_custkey = customer.c_custkey) AS n_orders "
        "FROM customer "
        "WHERE c_custkey <= (SELECT min(c_custkey) FROM customer) + 3 "
        "ORDER BY c_custkey"
    )
    for r in df.collect():
        print("customer", r.c_custkey, "orders:", r.n_orders)

    print("\n===== 5. directional join forcing: =====\n")
    from postbound_spark.optimizer import (
        DirectionalJoinAssignment,
        JoinOperator,
        JoinTree,
        PhysicalOperatorAssignment,
        compile_join_tree,
        pk_fk_edges_for,
    )

    tables = ["customer", "orders"]
    edges = pk_fk_edges_for(tables)
    tree = JoinTree.left_deep(tables)
    for build in ("customer", "orders"):
        assignment = PhysicalOperatorAssignment()
        probe = "orders" if build == "customer" else "customer"
        assignment.set_directional_join(
            DirectionalJoinAssignment(
                JoinOperator.SHUFFLE_HASH,
                build=frozenset({build}),
                probe=frozenset({probe}),
            )
        )
        joined = compile_join_tree(
            {t: cat[t] for t in tables}, tree, edges, assignment
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        side = "BuildLeft" if "BuildLeft" in plan else "BuildRight"
        print(f"build on {build}: {side}, rows={joined.count()}")

    return True


if __name__ == "__main__":
    main()
