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


# --- wider TPC-H-shaped coverage (adapted to the fixture schema: no
# partsupp table, lineitem carries only l_shipdate — TESTDATA.md) ----------

_Q4_ORACLE = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT * FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@query("q4_order_priority", oracle=_Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (correlated EXISTS → left-semi join; late-shipping
    stands in for the reference's commit<receipt since the fixture lineitem
    has only l_shipdate). The correlated comparison rides ON the semi join
    — no pre-aggregation, one shuffle on l_orderkey. At scale the semi
    join's build side is the filtered 3-month orders slice, far smaller
    than lineitem."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).alias("o")
    l = t["lineitem"].alias("l")
    matched = o.join(
        l,
        on=(F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        & (F.col("l.l_shipdate") > F.col("o.o_orderdate") + F.expr("INTERVAL 60 DAY")),
        how="left_semi",
    )
    return (
        matched.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q5_ORACLE = """
SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM region r, nation n, customer c, orders o, lineitem l, supplier s
WHERE r.r_regionkey = n.n_regionkey AND n.n_nationkey = c.c_nationkey
  AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
  AND l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
  AND r.r_name = 'EUROPE'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name
"""


@query("q5_local_supplier_volume", oracle=_Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join with the cycle-closing local-supplier condition
    (s_nationkey = c_nationkey). Join order: dims broadcast onto customer →
    orders, ONE fact-fact shuffle (orders ⋈ lineitem), then supplier
    broadcast with the cycle predicate folded into the join condition —
    at 100 TB the single o⋈l shuffle dominates and everything else stays
    broadcast-local."""
    t = load_tables(
        spark, sf_dir, ["region", "nation", "customer", "orders", "lineitem", "supplier"]
    )
    dims = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    joined = (
        orders.join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         extract(year FROM l.l_shipdate) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s, lineitem l, orders o, customer c, nation n1, nation n2
  WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
    AND c.c_custkey = o.o_custkey AND s.s_nationkey = n1.n_nationkey
    AND c.c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", oracle=_Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: the same dimension table in two roles (supplier's nation
    vs customer's nation) with a disjunctive cross-role filter. Both nation
    copies broadcast; the disjunction is applied after both bindings are
    present — Catalyst cannot push it to either scan alone, the textbook
    case for post-join residual predicates."""
    t = load_tables(
        spark, sf_dir, ["supplier", "lineitem", "orders", "customer", "nation"]
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q14_ORACLE = """
SELECT round(100.00 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                               THEN l.l_extendedprice * (1 - l.l_discount)
                               ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
FROM lineitem l, part p
WHERE l.l_partkey = p.p_partkey
  AND l.l_shipdate >= TIMESTAMP '1996-09-01'
  AND l.l_shipdate < TIMESTAMP '1996-10-01'
"""


@query("q14_promo_revenue", oracle=_Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional aggregation ratio over a fact⋈dim join.
    part is broadcast (dim-sized at every scale factor relative to
    lineitem); the CASE rides inside the global aggregate so the whole
    query is scan → broadcast join → single partial+final agg, no
    key shuffle at all."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(F.lit(0))
    return (
        l.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(disc), 4).alias("promo_revenue")
        )
    )


_Q17_ORACLE = """
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l, part p
WHERE p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
  AND p.p_size <= 5
  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
"""


@query("q17_small_quantity_revenue", oracle=_Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar subquery (per-part average quantity),
    decorrelated Spark-first into a groupBy + broadcast join — the rewrite
    Catalyst itself applies to correlated scalar subqueries, made explicit.
    The per-part aggregate shrinks lineitem to one row per part before the
    join, so the broadcast stays dim-sized at any SF."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    part = t["part"].filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 5)
    )
    per_part_avg = (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg((0.5 * F.avg("l_quantity")).alias("qty_threshold"))
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(per_part_avg), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


_Q18_ORACLE = """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       round(sum(l.l_quantity), 2) AS total_qty
FROM customer c, orders o, lineitem l
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey HAVING sum(l_quantity) > 180)
  AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
LIMIT 20
"""


@query("q18_large_volume_customer", oracle=_Q18_ORACLE)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: IN over an aggregated subquery → aggregate once, semi-join
    lineitem's own aggregate back to orders. The HAVING aggregate and the
    outer sum reuse the same shuffle key (l_orderkey), so AQE can pipeline
    the two aggregations over one exchange."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    big_orders = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 180)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        t["orders"]
        .join(big_orders, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(20)
    )


_Q19_ORACLE = """
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l, part p
WHERE p.p_partkey = l.l_partkey
  AND ((p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
        AND l.l_quantity BETWEEN 1 AND 11)
    OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
        AND l.l_quantity BETWEEN 10 AND 20)
    OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
        AND l.l_quantity BETWEEN 20 AND 30))
"""


@query("q19_discounted_revenue", oracle=_Q19_ORACLE)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of conjunctive brand/size/quantity branches
    spanning both join sides. Catalyst pushes the per-side implied filters
    (brand ∈ {...}, quantity ranges) below the join and keeps the full
    disjunction as the join residual — assert-worthy pushdown behavior at
    scale (the scan must not read every part row)."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    l, p = t["lineitem"], t["part"]
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
