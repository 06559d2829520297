"""Example 08 — database interaction: schema + statistics + execution.

Mirrors example-08-database-interaction.py (the reference walkthrough
this set previously skipped): connect to a database, introspect its
schema (tables and their columns), read simple column statistics
(min/max per column), and execute queries through the facade with
result simplification — the Database / DatabaseSchema /
DatabaseStatistics triad (ref db/_db.py:788 schema, :1965 statistics,
:257 result simplification).

Spark-first notes: "connect" is binding a SparkSession to a fixture
catalog (temp views over parquet); statistics are live DataFrame
aggregates (EmulatedStatistics) rather than pg_stats reads, which is
exactly what the optimizer stages consume; the native execution flag
routes text through the engine's own parse → algebra → compile
pipeline instead of spark.sql.
"""

from __future__ import annotations


def main(spark=None, sf_dir=None):
    from _shared import bootstrap

    spark, sf_dir, _tables = bootstrap(spark, sf_dir)

    from postbound_spark.database import Database

    db = Database(spark, sf_dir)

    print("===== Schema introspection: =====\n")
    schema = db.schema()
    print("Tables:")
    for table in schema.tables():
        columns = ", ".join(schema.columns(table))
        print(f"- {table} [{columns}]")
    print()

    print("===== Statistics: =====\n")
    stats = db.statistics()
    some_table = "nation"
    df = spark.table(some_table)
    for column in schema.columns(some_table):
        lo, hi = stats.min_max(df, column)
        print(f"- {some_table}.{column}: [{lo}, {hi}]")
    print(f"- row count: {stats.row_count(df)}")
    print(f"- distinct n_regionkey: {stats.distinct_count(df, 'n_regionkey')}")
    print()

    print("===== Keys (fixture sidecar — Spark has no constraint catalog): =====\n")
    print("primary key of orders:", schema.primary_key("orders"))
    print("foreign keys of orders:", schema.foreign_keys("orders"))
    print()

    print("===== Execution + result simplification: =====\n")
    # [(v,)] -> v (ref db/_db.py:257)
    n = db.execute_query("SELECT count(*) FROM customer")
    print("scalar simplification:", n)
    # [(a,), (b,)] -> [a, b]
    names = db.execute_query(
        "SELECT n_name FROM nation ORDER BY n_name LIMIT 3"
    )
    print("column simplification:", names)
    # native=True routes through parse_query -> parse_relalg -> compile_plan
    native = db.execute_query(
        "SELECT count(*) AS n FROM customer, nation "
        "WHERE customer.c_nationkey = nation.n_nationkey",
        native=True,
    )
    print("native-pipeline result:", native)
    # end the facade's session claim so later code (tests share one
    # session) can register views for other fixture dirs
    db.release()
    return db


if __name__ == "__main__":
    main()
