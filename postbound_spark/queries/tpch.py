"""Analytic core queries over the TPC-H-ish fixtures (SURVEY.md §7 M0).

The flagship query and its neighbors exercise scan, filter, multi-way equi
join, grouping, having, sorting, and limiting — the backbone the reference's
workloads (JOB/SSB/Stats) are made of. Several are built through the relalg
layer (:mod:`postbound_spark.plans.relalg`) to demonstrate the logical plan →
DataFrame path; the rest use the DataFrame API directly (both end in the same
Catalyst plan).

Scale notes: region/nation are tiny dimensions → Catalyst broadcast-joins them
automatically (verified via ``explain``); the orders⋈lineitem join is the only
genuine shuffle and is an equi-join on the natural key, which AQE can re-plan
or skew-split at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postbound_spark.catalog import load_tables
from postbound_spark.operators import compile_plan
from postbound_spark.plans import relalg as ra
from postbound_spark.queries import query

FLAGSHIP_ORACLE = """
SELECT n.n_name,
       count(*) AS num_orders,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM region r
JOIN nation n ON r.r_regionkey = n.n_regionkey
JOIN customer c ON n.n_nationkey = c.c_nationkey
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name
LIMIT 10
"""


def flagship_plan() -> ra.RelNode:
    """The M0 flagship as a relalg tree (left-deep join order, filters pushed
    onto the scans — what a join-order stage would emit)."""
    region = ra.Selection(ra.Relation(table="region", alias="r"), "r_name = 'ASIA'")
    nation = ra.Relation(table="nation", alias="n")
    customer = ra.Relation(table="customer", alias="c")
    orders = ra.Selection(
        ra.Relation(table="orders", alias="o"),
        "o_orderdate >= TIMESTAMP '1996-01-01'",
    )
    lineitem = ra.Relation(table="lineitem", alias="l")
    joined = ra.ThetaJoin(
        ra.ThetaJoin(
            ra.ThetaJoin(
                ra.ThetaJoin(region, nation, "r_regionkey = n_regionkey"),
                customer,
                "n_nationkey = c_nationkey",
            ),
            orders,
            "c_custkey = o_custkey",
        ),
        lineitem,
        "o_orderkey = l_orderkey",
    )
    grouped = ra.Grouping(
        joined,
        keys=("n_name",),
        aggregates=(
            ("num_orders", "count(*)"),
            ("revenue", "round(sum(l_extendedprice * (1 - l_discount)), 4)"),
        ),
    )
    sorted_ = ra.Sort(
        grouped,
        keys=(ra.SortKey("revenue", ascending=False), ra.SortKey("n_name")),
    )
    return ra.Limit(sorted_, limit=10)


@query("flagship_regional_revenue", oracle=FLAGSHIP_ORACLE)
def flagship_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog = load_tables(spark, sf_dir, ["region", "nation", "customer", "orders", "lineitem"])
    return compile_plan(flagship_plan(), spark, catalog)


@query(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single scan + hash aggregate. All arithmetic stays in
    whole-stage codegen; the aggregate is partial (map-side) before the
    2-group shuffle — the cheapest possible plan at any scale."""
    lineitem = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       o.o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 20
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(
            t["orders"].filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(20)
    )


@query(
    "q6_revenue_forecast",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + filter + global agg. The filters reach the
    parquet reader as PushedFilters (verified via explain) — at 100 TB this is
    an embarrassingly parallel scan with no shuffle at all."""
    lineitem = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q10_returned_items",
    oracle="""
SELECT c.c_custkey,
       c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem", "nation"])
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(
            t["lineitem"].filter(F.col("l_returnflag") == "R"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "top_suppliers_having",
    oracle="""
SELECT s.s_suppkey,
       s.s_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS total_revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
GROUP BY s.s_suppkey, s.s_name
HAVING sum(l.l_extendedprice * (1 - l.l_discount)) > 100000
ORDER BY total_revenue DESC, s.s_suppkey
""",
)
def top_suppliers_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (ref clause: qal/_qal.py:7283) — HAVING compiles to a
    post-aggregation filter."""
    t = load_tables(spark, sf_dir, ["supplier", "lineitem"])
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        t["supplier"]
        .join(t["lineitem"], F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.round(revenue, 4).alias("total_revenue"), revenue.alias("_raw"))
        .filter(F.col("_raw") > 100000)
        .drop("_raw")
        .orderBy(F.col("total_revenue").desc(), "s_suppkey")
    )


@query(
    "latest_order_per_customer",
    oracle="""
SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice
FROM (
    SELECT c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           row_number() OVER (PARTITION BY c.c_custkey
                              ORDER BY o.o_orderdate DESC, o.o_orderkey) AS rn
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
) ranked
WHERE rn = 1
ORDER BY c_custkey
LIMIT 100
""",
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postgres DISTINCT ON (c_custkey) … ORDER BY o_orderdate DESC analog
    (ref: Select clause DISTINCT ON, qal/_qal.py:5867) — rewritten as the
    row_number()==1 window filter, the standard Spark formulation."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir, ["customer", "orders"])
    w = Window.partitionBy("c_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey"))
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("c_custkey")
        .limit(100)
    )
