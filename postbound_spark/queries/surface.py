"""Expression / predicate / clause surface queries (SURVEY.md §2.3-§2.6).

Most entries run through ``spark.sql`` over registered views — exercising the
engine's SQL surface the way the reference's qal layer feeds its backends.
Where Spark's dialect lacks a construct the reference models
(ANY/ALL quantifiers, FETCH FIRST), the builder applies the documented
rewrite (SURVEY §2.3: min/max-agg for quantifiers; LIMIT for FETCH) while the
oracle uses the genuine syntax — proving semantic, not syntactic, parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postbound_spark.catalog import load_tables, register_views
from postbound_spark.queries import query


def _sql(spark: SparkSession, sf_dir: str, sql: str, tables: list[str]) -> DataFrame:
    register_views(spark, sf_dir, tables)
    return spark.sql(sql)


# --- clauses (§2.4) --------------------------------------------------------

_CTE_SQL = """
WITH nation_counts AS (
    SELECT c_nationkey, count(*) AS n_customers
    FROM customer GROUP BY c_nationkey
), busy AS (
    SELECT c_nationkey, n_customers FROM nation_counts WHERE n_customers > 50
)
SELECT n.n_name, b.n_customers
FROM busy b JOIN nation n ON b.c_nationkey = n.n_nationkey
"""


@query("sql_cte_with", oracle=_CTE_SQL)
def sql_cte_with(spark, sf_dir):
    """Dependency-ordered multi-CTE WITH (ref: CommonTableExpression,
    qal/_qal.py:5605). Same text runs on both engines."""
    return _sql(spark, sf_dir, _CTE_SQL, ["customer", "nation"])


_VALUES_SQL = """
SELECT r.r_name, m.label
FROM region r
JOIN (VALUES (0, 'africa-label'), (1, 'america-label'), (2, 'asia-label')) AS m(rkey, label)
  ON r.r_regionkey = m.rkey
"""


@query("sql_values_list", oracle=_VALUES_SQL)
def sql_values_list(spark, sf_dir):
    """VALUES list as a table source (ref: ValuesTableSource,
    qal/_qal.py:6436)."""
    return _sql(spark, sf_dir, _VALUES_SQL, ["region"])


@query(
    "sql_table_function_range",
    oracle="""
SELECT g AS n, g * g AS n_squared
FROM generate_series(1, 10) t(g)
""",
)
def sql_table_function_range(spark, sf_dir):
    """Table function in FROM — generate_series analog (ref:
    FunctionTableSource, qal/_qal.py:6584; Spark's ``range`` TVF)."""
    return spark.sql("SELECT id AS n, id * id AS n_squared FROM range(1, 11)")


@query(
    "sql_fetch_first",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey
OFFSET 3 ROWS FETCH NEXT 7 ROWS ONLY
""",
)
def sql_fetch_first(spark, sf_dir):
    """FETCH {FIRST|NEXT} n ROWS (ref: Limit/FetchDirection,
    qal/_qal.py:7548-7552) — Spark's dialect spells it LIMIT/OFFSET; the
    oracle uses genuine FETCH syntax."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 7 OFFSET 3
        """,
        ["orders"],
    )


_ROLLUP_SQL = """
SELECT n.n_name, c.c_mktsegment, count(*) AS n_customers,
       round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_balance
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
"""


_GROUPING_MARKER_SQL = """
SELECT n.n_name, c.c_mktsegment,
       CAST(GROUPING(n.n_name) AS INT) AS g_nation,
       CAST(GROUPING(c.c_mktsegment) AS INT) AS g_segment,
       count(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
"""


@query("sql_grouping_marker", oracle=_GROUPING_MARKER_SQL)
def sql_grouping_marker(spark, sf_dir):
    """GROUPING() markers over ROLLUP — the companion that makes
    super-aggregate rows distinguishable from genuine NULL group keys
    (without it, a rollup over a nullable column is ambiguous). Both
    engines run the identical spelling; the CAST pins the flag dtype
    (Spark grouping() is byte, DuckDB's is wider)."""
    return _sql(spark, sf_dir, _GROUPING_MARKER_SQL, ["customer", "nation"])


@query("sql_rollup", oracle=_ROLLUP_SQL)
def sql_rollup(spark, sf_dir):
    """ROLLUP — engine extension beyond the reference (it rejects
    GROUPING SETS/CUBE/ROLLUP, qal/_qal.py:8438-8439; Spark has them
    natively, SURVEY §2.4 notes the extension)."""
    return _sql(spark, sf_dir, _ROLLUP_SQL, ["customer", "nation"])


# --- expressions (§2.3) ----------------------------------------------------

_CASE_SQL = """
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 200000 THEN 'jumbo'
            WHEN o_totalprice >= 100000 THEN 'large'
            WHEN o_totalprice >= 50000 THEN 'medium'
            ELSE 'small' END AS size_class,
       CASE o_orderstatus WHEN 'F' THEN 'finished'
                          WHEN 'O' THEN 'open'
                          ELSE 'other' END AS status_word
FROM orders
"""


@query("expr_case", oracle=_CASE_SQL)
def expr_case(spark, sf_dir):
    """Searched + simple CASE (ref: CaseExpression, qal/_qal.py:1453)."""
    return _sql(spark, sf_dir, _CASE_SQL, ["orders"])


_CAST_SQL = """
SELECT o_orderkey,
       CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
       CAST(round(o_totalprice, 0) AS DECIMAL(18, 2)) AS price_dec
FROM orders
"""


@query("expr_cast", oracle=_CAST_SQL)
def expr_cast(spark, sf_dir):
    """CAST surface incl. NUMERIC(p,s) → DecimalType (ref: CastExpression,
    qal/_qal.py:359). floor/round first so double→int truncation-vs-round
    differences between engines cannot appear."""
    spark_sql = _CAST_SQL.replace("VARCHAR", "STRING")
    df = _sql(spark, sf_dir, spark_sql, ["orders"])
    # Decimal → double for a bit-stable cross-engine comparison surface
    return df.withColumn("price_dec", F.col("price_dec").cast("double"))


_EXTRACT_SQL_SPARK = """
SELECT event_id,
       year(ts) AS y, month(ts) AS mo, day(ts) AS d, hour(ts) AS h, minute(ts) AS mi
FROM events
"""

_EXTRACT_SQL_DUCK = """
SELECT event_id,
       CAST(EXTRACT(year FROM ts) AS INT) AS y,
       CAST(EXTRACT(month FROM ts) AS INT) AS mo,
       CAST(EXTRACT(day FROM ts) AS INT) AS d,
       CAST(EXTRACT(hour FROM ts) AS INT) AS h,
       CAST(EXTRACT(minute FROM ts) AS INT) AS mi
FROM events
"""


@query("expr_extract_datetime", oracle=_EXTRACT_SQL_DUCK)
def expr_extract_datetime(spark, sf_dir):
    """EXTRACT(field FROM ts) family (ref: pglast delivers EXTRACT as a
    function, SURVEY §2.3 — maps to year/month/day/...)."""
    return _sql(spark, sf_dir, _EXTRACT_SQL_SPARK, ["events"])


_STRING_SQL = """
SELECT c_custkey,
       upper(c_name) AS name_upper,
       lower(c_mktsegment) AS seg_lower,
       substring(c_name, 1, 8) AS name_prefix,
       length(c_name) AS name_len,
       replace(c_name, 'Customer', 'Cust') AS name_short,
       c_name || '/' || c_mktsegment AS name_seg,
       trim('  pad  ') AS trimmed,
       lpad(CAST(c_custkey AS STRING), 8, '0') AS key_padded
FROM customer
"""


@query("expr_string_functions", oracle=_STRING_SQL.replace(" AS STRING", " AS VARCHAR"))
def expr_string_functions(spark, sf_dir):
    """String scalar functions + || concat (ref: MathOperator ``||``,
    qal/_qal.py:23-31; function passthrough :796)."""
    return _sql(spark, sf_dir, _STRING_SQL, ["customer"])


_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - 50000) AS abs_diff,
       CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil_q,
       CAST(floor(l_quantity / 7) AS BIGINT) AS floor_q,
       CAST(l_partkey % 97 AS BIGINT) AS key_mod,
       round(sqrt(l_quantity), 6) AS sqrt_q,
       round(power(l_discount, 2), 6) AS disc_sq,
       round(ln(l_extendedprice), 6) AS log_price
FROM lineitem
"""


@query("expr_math_functions", oracle=_MATH_SQL)
def expr_math_functions(spark, sf_dir):
    """Math scalar surface (ref: MathExpression + passthrough functions,
    qal/_qal.py:507)."""
    return _sql(spark, sf_dir, _MATH_SQL, ["lineitem"])


_WINDOW_RANK_SQL = """
SELECT c_custkey, c_nationkey, c_acctbal,
       rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_rank,
       dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_dense,
       ntile(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quartile
FROM customer
"""


@query("expr_window_rank", oracle=_WINDOW_RANK_SQL)
def expr_window_rank(spark, sf_dir):
    """Ranking window functions (ref: WindowExpression, qal/_qal.py:1308 —
    PARTITION BY + ORDER BY, no frame spec)."""
    return _sql(spark, sf_dir, _WINDOW_RANK_SQL, ["customer"])


_WINDOW_FRAME_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       round(avg(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg
FROM orders
"""


@query("expr_window_frame", oracle=_WINDOW_FRAME_SQL)
def expr_window_frame(spark, sf_dir):
    """Explicit ROWS frame — extension beyond the reference's window model
    (no frame spec there, qal/_qal.py:1323-1330; SURVEY §2.3)."""
    return _sql(spark, sf_dir, _WINDOW_FRAME_SQL, ["orders"])


_WINDOW_LAG_SQL = """
SELECT o_custkey, o_orderkey,
       lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
       lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price,
       first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_order
FROM orders
"""


@query("expr_window_lag", oracle=_WINDOW_LAG_SQL)
def expr_window_lag(spark, sf_dir):
    """lag/lead/first_value with NULL boundaries."""
    return _sql(spark, sf_dir, _WINDOW_LAG_SQL, ["orders"])


_SCALAR_SUBQ_SQL = """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) + 2000 FROM customer)
"""


@query("expr_scalar_subquery", oracle=_SCALAR_SUBQ_SQL)
def expr_scalar_subquery(spark, sf_dir):
    """Scalar subquery in predicate position (ref: SubqueryExpression,
    qal/_qal.py:1244)."""
    return _sql(spark, sf_dir, _SCALAR_SUBQ_SQL, ["customer"])


@query(
    "expr_quantifier_all",
    oracle="""
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice > ALL (SELECT p_retailprice FROM part WHERE p_brand = 'Brand#11')
""",
)
def expr_quantifier_all(spark, sf_dir):
    """x > ALL (subquery) (ref: QuantifierExpression, qal/_qal.py:1589).
    Spark has no ALL quantifier — documented rewrite to the max-aggregate
    (SURVEY §2.3); the oracle runs the genuine ALL."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_retailprice > (SELECT max(p_retailprice) FROM part WHERE p_brand = 'Brand#11')
        """,
        ["part"],
    )


@query(
    "expr_quantifier_any",
    oracle="""
SELECT p_partkey, p_name, p_size
FROM part
WHERE p_size = ANY (SELECT p_size FROM part WHERE p_brand = 'Brand#13' AND p_size > 40)
""",
)
def expr_quantifier_any(spark, sf_dir):
    """x = ANY (subquery) — Spark rewrite: IN subquery (semi join)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT p_partkey, p_name, p_size
        FROM part
        WHERE p_size IN (SELECT p_size FROM part WHERE p_brand = 'Brand#13' AND p_size > 40)
        """,
        ["part"],
    )


_AGG_FILTER_SQL = """
SELECT l_returnflag,
       count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
       count(*) FILTER (WHERE l_quantity <= 25) AS n_small,
       round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2) AS discounted_base
FROM lineitem
GROUP BY l_returnflag
"""


@query("expr_agg_filter", oracle=_AGG_FILTER_SQL)
def expr_agg_filter(spark, sf_dir):
    """Aggregate FILTER (WHERE …) clause (ref: FunctionExpression.filter_where,
    qal/_qal.py:814-817)."""
    return _sql(spark, sf_dir, _AGG_FILTER_SQL, ["lineitem"])


_BOOL_AGG_SQL_SPARK = """
SELECT o_orderstatus,
       every(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_totalprice > 400000) AS any_jumbo,
       count(DISTINCT o_orderpriority) AS n_priorities
FROM orders
GROUP BY o_orderstatus
"""

_BOOL_AGG_SQL_DUCK = """
SELECT o_orderstatus,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_totalprice > 400000) AS any_jumbo,
       count(DISTINCT o_orderpriority) AS n_priorities
FROM orders
GROUP BY o_orderstatus
"""


@query("expr_bool_aggregates", oracle=_BOOL_AGG_SQL_DUCK)
def expr_bool_aggregates(spark, sf_dir):
    """EVERY/BOOL_AND/BOOL_OR + COUNT(DISTINCT) (ref: AggregateFunctions,
    qal/_qal.py:770-792)."""
    return _sql(spark, sf_dir, _BOOL_AGG_SQL_SPARK, ["orders"])


@query(
    "expr_string_agg",
    oracle="""
SELECT c_nationkey,
       string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer) d
GROUP BY c_nationkey
""",
)
def expr_string_agg(spark, sf_dir):
    """STRING_AGG (ref: AggregateFunctions STRING_AGG) — Spark spelling:
    sorted collect_list + array_join (collect_list alone is
    partition-order-nondeterministic; the explicit sort restores the
    ORDER BY semantics)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_nationkey,
               array_join(array_sort(collect_list(c_mktsegment)), ',') AS segments
        FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer) d
        GROUP BY c_nationkey
        """,
        ["customer"],
    )


@query(
    "expr_array_ops",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       round(embedding[1]::DOUBLE, 6) AS first_val,
       array_to_string(list_transform(embedding[1:3], x -> (round(x::DOUBLE, 6)::DECIMAL(18,6))::VARCHAR), ',') AS head3,
       round(list_sum(list_transform(embedding, x -> x::DOUBLE)), 4) AS vec_sum
FROM embeddings
""",
)
def expr_array_ops(spark, sf_dir):
    """Array literal/subscript/slice surface (ref: ArrayExpression
    qal/_qal.py:1032, ArrayAccessExpression :1099) over the embeddings
    fixture (array<float>)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT vec_id,
               size(embedding) AS dim,
               round(CAST(element_at(embedding, 1) AS DOUBLE), 6) AS first_val,
               array_join(transform(slice(embedding, 1, 3), x -> CAST(CAST(round(CAST(x AS DOUBLE), 6) AS DECIMAL(18, 6)) AS STRING)), ',') AS head3,
               round(aggregate(embedding, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE)), 4) AS vec_sum
        FROM embeddings
        """,
        ["embeddings"],
    )


# --- predicates (§2.5) -----------------------------------------------------

_LIKE_SQL = """
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_name LIKE '%o%' AND p_name NOT LIKE '%green%' AND p_type ILIKE 'eco%'
"""


@query("pred_like_family", oracle=_LIKE_SQL)
def pred_like_family(spark, sf_dir):
    """LIKE / NOT LIKE / ILIKE (ref: LogicalOperator, qal/_qal.py:34-58)."""
    return _sql(spark, sf_dir, _LIKE_SQL, ["part"])


_BETWEEN_IN_SQL = """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
WHERE o_totalprice BETWEEN 50000 AND 60000
  AND o_orderpriority IN ('1-URGENT', '5-LOW')
  AND o_orderstatus NOT IN ('P')
"""


@query("pred_between_in", oracle=_BETWEEN_IN_SQL)
def pred_between_in(spark, sf_dir):
    """BETWEEN + IN/NOT IN value lists (ref: BetweenPredicate
    qal/_qal.py:2632, InPredicate :2795)."""
    return _sql(spark, sf_dir, _BETWEEN_IN_SQL, ["orders"])


_NOT_IN_NULL_SQL = """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT nullif(o_custkey, 7) FROM orders)
"""


@query("pred_not_in_null_aware", oracle=_NOT_IN_NULL_SQL)
def pred_not_in_null_aware(spark, sf_dir):
    """Null-aware NOT IN subquery (ref: InPredicate + SURVEY §2.1 AntiJoin
    note): the inner NULL makes the result empty — a plain anti join would
    wrongly return rows; Spark's SQL path plans a null-aware anti join."""
    return _sql(spark, sf_dir, _NOT_IN_NULL_SQL, ["customer", "orders"])


_NOT_IN_SUBQ_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
"""


@query("pred_not_in_subquery", oracle=_NOT_IN_SUBQ_SQL)
def pred_not_in_subquery(spark, sf_dir):
    """NOT IN subquery without inner NULLs — the row-returning flavor."""
    return _sql(spark, sf_dir, _NOT_IN_SUBQ_SQL, ["customer", "orders"])


_DISTINCT_FROM_SQL = """
SELECT e1.event_id,
       nullif(e1.value, 0) IS DISTINCT FROM nullif(e1.value * 0, 0) AS value_differs,
       nullif(e1.event_type, 'error') IS NOT DISTINCT FROM NULL AS is_error_or_null
FROM events e1
"""


@query("pred_is_distinct_from", oracle=_DISTINCT_FROM_SQL)
def pred_is_distinct_from(spark, sf_dir):
    """IS [NOT] DISTINCT FROM — null-safe comparison (ref: LogicalOperator
    qal/_qal.py:34-58; Spark: same SQL syntax / ``eqNullSafe``)."""
    return _sql(spark, sf_dir, _DISTINCT_FROM_SQL, ["events"])


_EXISTS_CORR_SQL = """
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
  AND s.s_acctbal > 0
"""


@query("pred_exists_correlated", oracle=_EXISTS_CORR_SQL)
def pred_exists_correlated(spark, sf_dir):
    """Correlated EXISTS with an extra filter (ref: UnaryPredicate EXISTS,
    qal/_qal.py:2971)."""
    return _sql(spark, sf_dir, _EXISTS_CORR_SQL, ["supplier", "lineitem"])


_COMPOUND_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 50000)
  AND (o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH' OR o_totalprice > 300000)
"""


@query("pred_compound", oracle=_COMPOUND_SQL)
def pred_compound(spark, sf_dir):
    """AND/OR/NOT trees (ref: CompoundPredicate, qal/_qal.py:3098)."""
    return _sql(spark, sf_dir, _COMPOUND_SQL, ["orders"])


_NULL_PRED_SQL = """
SELECT event_id, props
FROM events
WHERE nullif(props, '{}') IS NOT NULL AND get_json_object(props, '$.missing') IS NULL
"""


@query(
    "pred_null_tests",
    oracle="""
SELECT event_id, props
FROM events
WHERE nullif(props, '{}') IS NOT NULL AND json_extract_string(props, '$.missing') IS NULL
""",
)
def pred_null_tests(spark, sf_dir):
    """IS [NOT] NULL + JSON path access (ref: UnaryPredicate Is/IsNot,
    qal/_qal.py:2971; props is a JSON string column)."""
    return _sql(spark, sf_dir, _NULL_PRED_SQL, ["events"])


_JSON_SQL_SPARK = """
SELECT event_type,
       sum(CAST(get_json_object(props, '$.k') AS BIGINT)) AS k_total,
       count(*) AS n
FROM events
GROUP BY event_type
"""

_JSON_SQL_DUCK = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
       count(*) AS n
FROM events
GROUP BY event_type
"""


@query("expr_json_extract", oracle=_JSON_SQL_DUCK)
def expr_json_extract(spark, sf_dir):
    """JSON field extraction + aggregation over the events.props column."""
    return _sql(spark, sf_dir, _JSON_SQL_SPARK, ["events"])


# --- round-1 additions: remaining §2 surface constructs --------------------


@query(
    "sql_distinct_on",
    oracle="""
SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey, c_acctbal
FROM customer
ORDER BY c_nationkey, c_acctbal DESC, c_custkey
""",
)
def sql_distinct_on(spark, sf_dir):
    """Postgres DISTINCT ON (ref: Select ctor distinct/DISTINCT ON flags,
    qal/_qal.py:5867) — Spark's dialect lacks it; the documented rewrite is
    the row_number()==1 window filter (SURVEY §2.4), the oracle runs the
    genuine syntax."""
    register_views(spark, sf_dir, ["customer"])
    return spark.sql(
        """
        SELECT c_nationkey, c_custkey, c_acctbal FROM (
          SELECT c_nationkey, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer
        ) WHERE rn = 1
        """
    )


@query(
    "pred_array_operators",
    oracle=r"""
WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents)
SELECT doc_id,
       list_has_all(toks, ['data', 'query']) AS has_all,
       list_has_any(toks, ['vector', 'stream']) AS has_any
FROM t
WHERE list_has_all(toks, ['data', 'query']) OR list_has_any(toks, ['vector', 'stream'])
ORDER BY doc_id
""",
)
def pred_array_operators(spark, sf_dir):
    """Postgres array containment/overlap operators @> <@ && (ref:
    LogicalOperator qal/_qal.py:55-58) — Spark spells them
    forall+array_contains and arrays_overlap (SURVEY §2.5), the oracle uses
    DuckDB's list_has_all/list_has_any."""
    register_views(spark, sf_dir, ["documents"])
    return spark.sql(
        r"""
        WITH t AS (SELECT doc_id, split(text, '\\s+') AS toks FROM documents)
        SELECT doc_id,
               forall(array('data', 'query'), x -> array_contains(toks, x)) AS has_all,
               arrays_overlap(toks, array('vector', 'stream')) AS has_any
        FROM t
        WHERE forall(array('data', 'query'), x -> array_contains(toks, x))
           OR arrays_overlap(toks, array('vector', 'stream'))
        ORDER BY doc_id
        """
    )


@query(
    "expr_all_quantifier",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > ALL (
  SELECT o_totalprice FROM orders WHERE o_custkey = 1
)
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def expr_all_quantifier(spark, sf_dir):
    """ALL quantifier (ref: QuantifierExpression qal/_qal.py:1589) — Spark
    SQL has no ALL; the documented rewrite compares against the subquery
    max (SURVEY §2.3). NULL caveat: > ALL over an empty subquery is TRUE,
    over NULLs is NULL — the max() rewrite matches both here because the
    probed subquery is non-empty and non-null."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (
          SELECT max(o_totalprice) FROM orders WHERE o_custkey = 1
        )
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
        """
    )


_LATERAL_SQL = """
SELECT r.r_name, t.n_name, t.n_customers
FROM region r,
LATERAL (
  SELECT n.n_name, count(*) AS n_customers
  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name
  ORDER BY n_customers DESC, n.n_name
  LIMIT 1
) t
ORDER BY r.r_name
"""


@query("sql_lateral_subquery", oracle=_LATERAL_SQL)
def sql_lateral_subquery(spark, sf_dir):
    """LATERAL correlated subquery in FROM (ref: SubqueryTableSource with
    lateral flag, qal/_qal.py:6270). Same text on both engines — Spark ≥3.2
    supports LATERAL natively (SURVEY §2.2)."""
    return _sql(spark, sf_dir, _LATERAL_SQL, ["region", "nation", "customer"])


@query(
    "sql_fetch_prior",
    oracle="""
SELECT o_orderkey, o_totalprice FROM (
  SELECT o_orderkey, o_totalprice FROM orders
  ORDER BY o_totalprice ASC, o_orderkey DESC
  LIMIT 5
) t
ORDER BY o_totalprice DESC, o_orderkey
""",
)
def sql_fetch_prior(spark, sf_dir):
    """FETCH PRIOR — the reference models fetch direction first/next/
    prior/last (FetchDirection qal/_qal.py:7548); neither Spark nor DuckDB
    executes PRIOR natively, so both sides use the documented
    sort-inversion rewrite (SURVEY §2.4): PRIOR n == invert sort, LIMIT n,
    restore presentation order."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM (
          SELECT o_orderkey, o_totalprice FROM orders
          ORDER BY o_totalprice ASC, o_orderkey DESC
          LIMIT 5
        ) t
        ORDER BY o_totalprice DESC, o_orderkey
        """
    )


_STAT_AGG_SQL = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(stddev(l_quantity), 6) AS qty_stddev,
       round(stddev_pop(l_quantity), 6) AS qty_stddev_pop
FROM lineitem
GROUP BY l_returnflag
"""


@query("expr_stat_aggregates", oracle=_STAT_AGG_SQL)
def expr_stat_aggregates(spark, sf_dir):
    """CORR/STDDEV statistical aggregates (ref: AggregateFunctions,
    qal/_qal.py:770-792). Both engines agree bit-for-bit at 6 decimals on
    this data (verified empirically); the rounding guards the last-ulp
    summation-order differences that remain in principle."""
    return _sql(spark, sf_dir, _STAT_AGG_SQL, ["lineitem"])


_BIT_AGG_SQL_SPARK = """
SELECT o_orderstatus,
       bit_and(o_custkey) AS key_band,
       bit_or(o_custkey)  AS key_bor,
       bit_xor(o_custkey) AS key_bxor,
       any_value(o_orderstatus) AS status_again,
       to_json(array_sort(collect_list(o_orderpriority))) AS priorities_json
FROM (SELECT * FROM orders WHERE o_orderkey < 100)
GROUP BY o_orderstatus
"""

_BIT_AGG_SQL_DUCK = """
SELECT o_orderstatus,
       bit_and(o_custkey) AS key_band,
       bit_or(o_custkey)  AS key_bor,
       bit_xor(o_custkey) AS key_bxor,
       any_value(o_orderstatus) AS status_again,
       to_json(list_sort(list(o_orderpriority))) AS priorities_json
FROM (SELECT * FROM orders WHERE o_orderkey < 100)
GROUP BY o_orderstatus
"""


@query("expr_bit_aggregates", oracle=_BIT_AGG_SQL_DUCK)
def expr_bit_aggregates(spark, sf_dir):
    """BIT_AND/BIT_OR/BIT_XOR + ANY_VALUE + ARRAY_AGG/JSON_AGG (ref:
    AggregateFunctions, qal/_qal.py:770-792). Bit folds are exact and
    order-free; ANY_VALUE is made deterministic by aggregating the group
    key itself; the array aggregate is sorted before JSON rendering so
    collection order cannot leak into the hash (the engine's JSON_AGG
    recipe is exactly to_json(array_sort(collect_list(x))))."""
    return _sql(spark, sf_dir, _BIT_AGG_SQL_SPARK, ["orders"])


# --- explicit-FROM join types (§2.4: ExplicitFromClause, JoinType
# qal/_qal.py:6672 — INNER/LEFT/RIGHT/FULL OUTER/CROSS/NATURAL) ------------

_LEFT_OUTER_SQL = """
SELECT n.n_name,
       count(c.c_custkey)                            AS n_customers,
       count(o.o_orderkey)                           AS n_urgent_orders,
       CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
FROM nation n
LEFT OUTER JOIN customer c ON n.n_nationkey = c.c_nationkey
LEFT OUTER JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
  ON c.c_custkey = o.o_custkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


@query("sql_left_outer_join", oracle=_LEFT_OUTER_SQL)
def sql_left_outer_join(spark, sf_dir):
    """LEFT OUTER JOIN chain with null-extended rows surviving into the
    aggregate (ref JoinType.LeftOuter, qal/_qal.py:6672; explicit FROM
    ``ExplicitFromClause`` :7074). The null-extension is observable via
    count(col) vs the CASE-counted unmatched rows. Scale note: nation is
    tiny → Catalyst broadcasts it; the filtered orders subquery pushes
    o_orderpriority down to the parquet scan before the join."""
    return _sql(spark, sf_dir, _LEFT_OUTER_SQL, ["nation", "customer", "orders"])


_FULL_OUTER_SQL = """
WITH big_spenders AS (
    SELECT o_custkey AS custkey,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS spent
    FROM orders GROUP BY o_custkey
    HAVING sum(CAST(o_totalprice AS DECIMAL(18,2))) > 1000000
), rich AS (
    SELECT c_custkey AS custkey, c_acctbal
    FROM customer WHERE c_acctbal > 9900
)
SELECT coalesce(b.custkey, r.custkey) AS custkey,
       b.spent, r.c_acctbal,
       (b.custkey IS NULL)  AS only_rich,
       (r.custkey IS NULL)  AS only_spender
FROM big_spenders b
FULL OUTER JOIN rich r ON b.custkey = r.custkey
ORDER BY custkey
"""


@query("sql_full_outer_join", oracle=_FULL_OUTER_SQL)
def sql_full_outer_join(spark, sf_dir):
    """FULL OUTER JOIN of two partially-overlapping aggregates (ref
    JoinType.FullOuter qal/_qal.py:6672); both null-extension directions are
    asserted via the only_* flags. Full outer cannot broadcast — it is a
    genuine shuffle join on custkey, the correct plan at any scale."""
    return _sql(spark, sf_dir, _FULL_OUTER_SQL, ["orders", "customer"])


_RIGHT_OUTER_SQL = """
SELECT c.c_mktsegment,
       count(o.o_orderkey) AS n_orders,
       count(*)            AS n_rows
FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
RIGHT OUTER JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@query("sql_right_outer_join", oracle=_RIGHT_OUTER_SQL)
def sql_right_outer_join(spark, sf_dir):
    """RIGHT OUTER JOIN (ref JoinType.RightOuter qal/_qal.py:6672) —
    preserved side is the right (customer); unmatched customers appear with
    NULL order columns, visible as n_rows > n_orders."""
    return _sql(spark, sf_dir, _RIGHT_OUTER_SQL, ["orders", "customer"])


_NATURAL_JOIN_SQL = """
SELECT n_name, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_bal
FROM (SELECT n_nationkey AS nationkey, n_name FROM nation) n
NATURAL JOIN (SELECT s_nationkey AS nationkey, s_suppkey, s_acctbal FROM supplier) s
GROUP BY n_name
ORDER BY n_name
"""


@query("sql_natural_join", oracle=_NATURAL_JOIN_SQL)
def sql_natural_join(spark, sf_dir):
    """NATURAL JOIN (ref JoinType.Natural* qal/_qal.py:6672; relalg's Rename
    node exists for exactly this resolution, relalg.py:1550): common-column
    resolution happens in the engine's analyzer — both sides project a
    shared ``nationkey`` name and the join key is inferred, not written."""
    return _sql(spark, sf_dir, _NATURAL_JOIN_SQL, ["nation", "supplier"])


_CUBE_SQL = """
SELECT n.n_regionkey, c.c_mktsegment, count(*) AS n_customers,
       round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_balance
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY CUBE (n.n_regionkey, c.c_mktsegment)
"""


@query("sql_cube", oracle=_CUBE_SQL)
def sql_cube(spark, sf_dir):
    """CUBE — engine extension like ROLLUP (the reference rejects
    GROUPING SETS/CUBE/ROLLUP, qal/_qal.py:8438-8439). All 2^k grouping
    combinations in ONE pass: Spark expands the grouping sets before the
    exchange, so the fact side is still read and shuffled once — the
    at-scale alternative to unioning 4 separate GROUP BYs."""
    return _sql(spark, sf_dir, _CUBE_SQL, ["customer", "nation"])


_GROUPING_SETS_SQL = """
SELECT n.n_name, c.c_mktsegment, count(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY GROUPING SETS ((n.n_name), (c.c_mktsegment), ())
"""


@query("sql_grouping_sets", oracle=_GROUPING_SETS_SQL)
def sql_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (engine extension; see sql_cube). The empty
    set () yields the grand total with NULL group keys — same null-fill
    semantics on both engines."""
    return _sql(spark, sf_dir, _GROUPING_SETS_SQL, ["customer", "nation"])


@query(
    "expr_array_agg",
    oracle="""
SELECT c_nationkey,
       array_to_string(array_agg(DISTINCT c_mktsegment ORDER BY c_mktsegment), '|') AS segments,
       count(*) AS n_customers
FROM customer
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def expr_array_agg(spark, sf_dir):
    """ARRAY_AGG (ref aggregate name-set, qal/_qal.py:770-792 — maps to
    collect_list/collect_set). Cross-engine determinism: collect_set's
    order is partition-dependent, so both sides sort — Spark
    array_sort(collect_set(x)), DuckDB array_agg(DISTINCT x ORDER BY x).
    The array is rendered as a '|'-joined string because the driver's
    pandas canonicalizer cannot sort raw list cells (the expr_array_ops
    r2 lesson); the aggregate itself is still array-valued pre-render."""
    from postbound_spark.catalog import load_table

    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|").alias("segments"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("c_nationkey")
    )
