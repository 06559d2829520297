"""IR-built registry queries: the qal layer (plans/qal.py) constructs the
query, renders ANSI SQL, Spark executes the rendering, and the *same text*
is the DuckDB oracle — round-tripping the IR through two engines (the
reference's parse→str→parse round-trip property, tests/test_qal.py:437,
strengthened to execution equivalence)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from postbound_spark.catalog import register_views
from postbound_spark.plans import qal as Q
from postbound_spark.plans import transform as X
from postbound_spark.queries import query


def _market_share_ir() -> Q.SqlQuery:
    c = Q.TableReference("customer", "c")
    n = Q.TableReference("nation", "n")
    return Q.SqlQuery(
        select=(
            Q.BaseProjection(Q.col("n_name", n), "nation_name"),
            Q.BaseProjection(Q.SqlExpression("count(*)"), "n_customers"),
            Q.BaseProjection(
                Q.SqlExpression("round(avg(c.c_acctbal), 4)"), "avg_balance"
            ),
        ),
        from_tables=(c, n),
        where=Q.and_(
            Q.eq(Q.col("c_nationkey", c), Q.col("n_nationkey", n)),
            Q.BetweenPredicate(Q.col("c_acctbal", c), Q.lit(0), Q.lit(5000)),
        ),
        group_by=(Q.col("n_name", n),),
        order_by=(Q.OrderByExpression(Q.SqlExpression("n_customers"), ascending=False),
                  Q.OrderByExpression(Q.col("n_name", n)),),
        limit=15,
    )


_IR_QUERY = _market_share_ir()


@query("ir_market_share", oracle=_IR_QUERY.to_sql())
def ir_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """qal-IR-constructed join+agg query; Spark runs the IR's own ANSI
    rendering (predicate index classifies the equi-join vs the BETWEEN
    filter; Catalyst plans it — broadcast of nation, pushed filters)."""
    register_views(spark, sf_dir, ["customer", "nation"])
    return spark.sql(_IR_QUERY.to_sql())


# strip presentation clauses before wrapping: the demo counts the BASE
# join; leaving LIMIT in place would (correctly, post-round-5) count the
# limited subquery instead
_COUNT_QUERY = X.as_count_star_query(
    X.drop_clause(
        X.drop_clause(_market_share_ir(), "group_by"), "having"
    ).with_clause(select=(Q.star(),), order_by=(), limit=None)
)


@query("ir_count_star_transform", oracle=_COUNT_QUERY.to_sql())
def ir_count_star_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §2.6 count-star wrapper (transform.py:696 analog) applied to the
    IR query — the exact rewrite PreciseCardinalities executes for
    ground-truth cardinalities, under the oracle gate."""
    register_views(spark, sf_dir, ["customer", "nation"])
    return spark.sql(_COUNT_QUERY.to_sql())
