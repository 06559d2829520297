"""Oracle-checked queries exercising the UDF / UDAF / UDTF surface
(SURVEY.md §2.9).

Each query resolves a ``pb_*`` function purely by name through SQL text —
the same pass-through contract the reference's FunctionExpression gives
arbitrary function names — and each has an exact DuckDB oracle (md5 / xor /
regex are bit-identical across engines; no float paths).
"""

from __future__ import annotations

from postbound_spark.catalog import load_table
from postbound_spark.functions.udf import register_all
from postbound_spark.queries import query


def _docs_view(spark, sf_dir, name: str):
    register_all(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(name)


@query(
    "udf_doc_hash",
    oracle="""
SELECT doc_id,
       CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS doc_hash
FROM documents
""",
)
def udf_doc_hash(spark, sf_dir):
    """Scalar pandas UDF by name: one Arrow batch per task crossing into
    Python, md5 prefix as bigint. Stays a narrow map — no shuffle."""
    _docs_view(spark, sf_dir, "udf_docs")
    return spark.sql("SELECT doc_id, pb_doc_hash(text) AS doc_hash FROM udf_docs")


@query(
    "udf_xor_checksum",
    oracle="""
SELECT lang,
       bit_xor(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)) AS checksum
FROM documents
GROUP BY lang
""",
)
def udf_xor_checksum(spark, sf_dir):
    """GROUPED_AGG pandas UDF: shuffle on the group key, then each group's
    hashed column arrives as one pandas Series for the xor fold. Exact and
    order-independent ⇒ partitioning cannot change the result. (Spark
    disallows mixing grouped-agg pandas UDFs with built-in aggregates in
    one aggregation — INVALID_PANDAS_UDF_PLACEMENT — so the checksum is
    the aggregation's only output.)"""
    _docs_view(spark, sf_dir, "udf_docs_xor")
    return spark.sql(
        """
        SELECT lang,
               pb_xor_agg(pb_doc_hash(text)) AS checksum
        FROM udf_docs_xor
        GROUP BY lang
        """
    )


@query(
    "udf_tokenize_topk",
    oracle="""
SELECT token, count(*) AS n
FROM (
  SELECT unnest(string_split_regex(text, '\\s+')) AS token FROM documents
)
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
""",
)
def udf_tokenize_topk(spark, sf_dir):
    """Python UDTF invoked laterally: each document row fans out to one
    row per token, then a plain groupBy ranks tokens. The UDTF runs
    data-parallel per input partition; only the (token, 1) pairs shuffle."""
    _docs_view(spark, sf_dir, "udf_docs_tok")
    return spark.sql(
        """
        SELECT t.token, count(*) AS n
        FROM udf_docs_tok d, LATERAL pb_tokenize(d.text) t
        GROUP BY t.token
        ORDER BY n DESC, t.token
        LIMIT 20
        """
    )


@query(
    "expr_xml_agg",
    oracle="""
SELECT c_nationkey,
       string_agg('<seg>' || c_mktsegment || '</seg>', ''
                  ORDER BY '<seg>' || c_mktsegment || '</seg>') AS segments_xml
FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer) d
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def expr_xml_agg(spark, sf_dir):
    """XML_AGG (ref AggregateFunctions XML_AGG — previously SURVEY §2.3's
    one documented gap): fragments built with `||` (PostgreSQL's
    xmlelement for simple element content) aggregated by the registered
    ``xml_agg`` GROUPED_AGG UDAF, which sorts the fragment TEXT so the
    result is deterministic under any partitioning. The oracle must
    ORDER BY the same fragment expression (NOT the bare value — markup
    changes the sort when one value prefixes another; see the UDAF
    docstring)."""
    from postbound_spark.functions.udf import register_all

    register_all(spark)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("xml_customer")
    return spark.sql(
        """
        SELECT c_nationkey,
               xml_agg('<seg>' || c_mktsegment || '</seg>') AS segments_xml
        FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM xml_customer) d
        GROUP BY c_nationkey
        ORDER BY c_nationkey
        """
    )
