"""One oracle-checked query per relational-algebra operator (SURVEY.md §2.1).

Every query here is built through the relalg layer + compiler so the driver's
correctness gate exercises the logical-plan path, not just raw DataFrames.
Queries avoid ORDER BY unless semantics require it (the oracle compare is
order-insensitive); LIMIT queries order fully deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from postbound_spark.catalog import load_tables
from postbound_spark.operators import compile_plan
from postbound_spark.plans import relalg as ra
from postbound_spark.queries import query


def _run(spark: SparkSession, sf_dir: str, plan: ra.RelNode) -> DataFrame:
    return compile_plan(plan, spark, load_tables(spark, sf_dir, sorted(plan.tables())))


@query(
    "op_relation_projection",
    oracle="SELECT p_partkey, p_name, p_retailprice FROM part",
)
def op_relation_projection(spark, sf_dir):
    """Relation + Projection (ref: relalg.py:1004, :1268)."""
    plan = ra.Projection(
        ra.Relation(table="part"), ("p_partkey", "p_name", "p_retailprice")
    )
    return _run(spark, sf_dir, plan)


@query(
    "op_selection",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
WHERE o_totalprice > 100000 AND o_orderpriority IN ('1-URGENT', '2-HIGH')
""",
)
def op_selection(spark, sf_dir):
    """Selection with compound + IN predicates (ref: relalg.py:449)."""
    plan = ra.Projection(
        ra.Selection(
            ra.Relation(table="orders"),
            "o_totalprice > 100000 AND o_orderpriority IN ('1-URGENT', '2-HIGH')",
        ),
        ("o_orderkey", "o_totalprice", "o_orderpriority"),
    )
    return _run(spark, sf_dir, plan)


@query(
    "op_map_expressions",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       round(l_extendedprice * (1 - l_discount), 4) AS net_price,
       round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged,
       CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END AS qty_class
FROM lineitem
""",
)
def op_map_expressions(spark, sf_dir):
    """Map/χ — derived expressions incl. CASE (ref: relalg.py:1781)."""
    plan = ra.Projection(
        ra.Map(
            ra.Relation(table="lineitem"),
            (
                ("net_price", "round(l_extendedprice * (1 - l_discount), 4)"),
                ("charged", "round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)"),
                ("qty_class", "CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END"),
            ),
        ),
        ("l_orderkey", "l_linenumber", "net_price", "charged", "qty_class"),
    )
    return _run(spark, sf_dir, plan)


@query(
    "op_rename",
    oracle="SELECT s_suppkey AS supplier_id, s_name AS supplier_name, s_acctbal AS balance FROM supplier",
)
def op_rename(spark, sf_dir):
    """Rename/ρ (ref: relalg.py:1535)."""
    plan = ra.Rename(
        ra.Projection(ra.Relation(table="supplier"), ("s_suppkey", "s_name", "s_acctbal")),
        (("s_suppkey", "supplier_id"), ("s_name", "supplier_name"), ("s_acctbal", "balance")),
    )
    return _run(spark, sf_dir, plan)


@query(
    "op_theta_join_nonequi",
    oracle="""
SELECT n.n_name, r.r_name
FROM nation n JOIN region r ON n.n_regionkey < r.r_regionkey
""",
)
def op_theta_join_nonequi(spark, sf_dir):
    """ThetaJoin with a genuine non-equi predicate → Catalyst picks
    broadcast-nested-loop (ref: relalg.py:1139; Spark BNLJ)."""
    plan = ra.Projection(
        ra.ThetaJoin(
            ra.Relation(table="nation", alias="n"),
            ra.Relation(table="region", alias="r"),
            "n_regionkey < r_regionkey",
        ),
        ("n_name", "r_name"),
    )
    return _run(spark, sf_dir, plan)


@query(
    "op_cross_product",
    oracle="""
SELECT r.r_name, seg.c_mktsegment
FROM region r CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) seg
""",
)
def op_cross_product(spark, sf_dir):
    """CrossProduct/× (ref: relalg.py:559)."""
    plan = ra.Projection(
        ra.CrossProduct(
            ra.Relation(table="region", alias="r"),
            ra.SubqueryScan(
                ra.DuplicateElimination(
                    ra.Projection(ra.Relation(table="customer"), ("c_mktsegment",))
                ),
                alias="seg",
            ),
        ),
        ("r_name", "c_mktsegment"),
    )
    return _run(spark, sf_dir, plan)


@query(
    "op_semi_join",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
""",
)
def op_semi_join(spark, sf_dir):
    """SemiJoin/⋉ — EXISTS with a pushed filter (ref: relalg.py:2001)."""
    plan = ra.Projection(
        ra.SemiJoin(
            ra.Relation(table="customer"),
            ra.Selection(ra.Relation(table="orders"), "o_totalprice > 200000"),
            "c_custkey = o_custkey",
        ),
        ("c_custkey", "c_name"),
    )
    return _run(spark, sf_dir, plan)


@query(
    "op_anti_join",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def op_anti_join(spark, sf_dir):
    """AntiJoin/▷ — NOT EXISTS (ref: relalg.py:2158)."""
    plan = ra.Projection(
        ra.AntiJoin(
            ra.Relation(table="customer"),
            ra.Relation(table="orders"),
            "c_custkey = o_custkey",
        ),
        ("c_custkey", "c_name", "c_acctbal"),
    )
    return _run(spark, sf_dir, plan)


@query(
    "op_grouping",
    oracle="""
SELECT l_returnflag,
       count(*) AS n_items,
       count(DISTINCT l_suppkey) AS n_suppliers,
       round(sum(l_quantity), 2) AS total_qty,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def op_grouping(spark, sf_dir):
    """Grouping/γ with multiple aggregates incl. COUNT(DISTINCT)
    (ref: relalg.py:1376)."""
    plan = ra.Grouping(
        ra.Relation(table="lineitem"),
        keys=("l_returnflag",),
        aggregates=(
            ("n_items", "count(*)"),
            ("n_suppliers", "count(DISTINCT l_suppkey)"),
            ("total_qty", "round(sum(l_quantity), 2)"),
            ("min_price", "round(min(l_extendedprice), 2)"),
            ("max_price", "round(max(l_extendedprice), 2)"),
        ),
    )
    return _run(spark, sf_dir, plan)


@query(
    "op_grouping_global",
    oracle="""
SELECT count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total,
       round(avg(o_totalprice), 4) AS avg_price
FROM orders
""",
)
def op_grouping_global(spark, sf_dir):
    """Global aggregate — empty grouping keys (ref: relalg.py:1376)."""
    plan = ra.Grouping(
        ra.Relation(table="orders"),
        aggregates=(
            ("n_orders", "count(*)"),
            ("total", "round(sum(o_totalprice), 2)"),
            ("avg_price", "round(avg(o_totalprice), 4)"),
        ),
    )
    return _run(spark, sf_dir, plan)


@query(
    "op_duplicate_elimination",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def op_duplicate_elimination(spark, sf_dir):
    """DuplicateElimination/δ (ref: relalg.py:1926)."""
    plan = ra.DuplicateElimination(
        ra.Projection(ra.Relation(table="lineitem"), ("l_returnflag", "l_linestatus"))
    )
    return _run(spark, sf_dir, plan)


@query(
    "op_sort_limit_offset",
    oracle="""
SELECT p_partkey, p_name, p_retailprice
FROM part
ORDER BY p_retailprice DESC, p_partkey
LIMIT 15 OFFSET 5
""",
)
def op_sort_limit_offset(spark, sf_dir):
    """Sort/τ + LIMIT/OFFSET (ref: relalg.py:1654; Limit is clause-level in
    the reference, SURVEY §2.1)."""
    plan = ra.Limit(
        ra.Sort(
            ra.Projection(ra.Relation(table="part"), ("p_partkey", "p_name", "p_retailprice")),
            keys=(ra.SortKey("p_retailprice", ascending=False), ra.SortKey("p_partkey")),
        ),
        limit=15,
        offset=5,
    )
    return _run(spark, sf_dir, plan)


@query(
    "op_union",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def op_union(spark, sf_dir):
    """Union/∪ set semantics (ref: relalg.py:669)."""
    plan = ra.Union(
        ra.Projection(ra.Relation(table="customer"), ("c_nationkey AS nationkey",)),
        ra.Projection(ra.Relation(table="supplier"), ("s_nationkey AS nationkey",)),
        distinct=True,
    )
    return _run(spark, sf_dir, plan)


@query(
    "op_union_all",
    oracle="""
SELECT c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
UNION ALL
SELECT s_nationkey AS nationkey, s_acctbal AS acctbal FROM supplier
""",
)
def op_union_all(spark, sf_dir):
    """UNION ALL — bag semantics (qal SetOperator, SURVEY §2.4)."""
    plan = ra.Union(
        ra.Projection(
            ra.Relation(table="customer"), ("c_nationkey AS nationkey", "c_acctbal AS acctbal")
        ),
        ra.Projection(
            ra.Relation(table="supplier"), ("s_nationkey AS nationkey", "s_acctbal AS acctbal")
        ),
        distinct=False,
    )
    return _run(spark, sf_dir, plan)


@query(
    "op_intersection",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def op_intersection(spark, sf_dir):
    """Intersection/∩ (ref: relalg.py:780)."""
    plan = ra.Intersection(
        ra.Projection(ra.Relation(table="customer"), ("c_nationkey AS nationkey",)),
        ra.Projection(ra.Relation(table="supplier"), ("s_nationkey AS nationkey",)),
    )
    return _run(spark, sf_dir, plan)


@query(
    "op_difference",
    oracle="""
SELECT n_nationkey AS nationkey FROM nation
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def op_difference(spark, sf_dir):
    """Difference/− set semantics (ref: relalg.py:892)."""
    plan = ra.Difference(
        ra.Projection(ra.Relation(table="nation"), ("n_nationkey AS nationkey",)),
        ra.Projection(ra.Relation(table="supplier"), ("s_nationkey AS nationkey",)),
    )
    return _run(spark, sf_dir, plan)


@query(
    "op_subquery_scan",
    oracle="""
SELECT big.o_custkey, count(*) AS n_big_orders
FROM (SELECT o_custkey FROM orders WHERE o_totalprice > 150000) big
GROUP BY big.o_custkey
""",
)
def op_subquery_scan(spark, sf_dir):
    """SubqueryScan — FROM-subquery boundary (ref: relalg.py:2316)."""
    plan = ra.Grouping(
        ra.SubqueryScan(
            ra.Projection(
                ra.Selection(ra.Relation(table="orders"), "o_totalprice > 150000"),
                ("o_custkey",),
            ),
            alias="big",
        ),
        keys=("o_custkey",),
        aggregates=(("n_big_orders", "count(*)"),),
    )
    return _run(spark, sf_dir, plan)
