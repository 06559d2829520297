"""User-defined function surface: scalar / aggregate / table UDFs with
name-based dispatch.

The reference passes **any** function name through its IR uninterpreted and
lets the backend resolve it (FunctionExpression, reference
``postbound/qal/_qal.py:797-803``; aggregate-name gate ``:895-898``; table
functions ``FunctionTableSource`` ``:6584``). The Spark-native analog of
"the backend resolves names" is the session's function registry:
``spark.udf.register`` / ``spark.udtf.register`` make a Python function
callable from SQL text and therefore from every ``F.expr(...)`` the relalg
compiler emits (``operators/compiler.py``) — no custom dispatch layer
needed, exactly the pass-through contract the reference documents.

Performance contract (the brief's "UDFs are the slow path"):
- scalar UDFs are **vectorized pandas_udfs** — Arrow ships a whole column
  batch per crossing, ~10-100× over row-at-a-time Python UDFs;
- aggregate UDFs are GROUPED_AGG pandas_udfs — Spark shuffles by the group
  key, then each group's column arrives as one pandas Series;
- table UDFs are Python UDTFs (Spark 3.5+), invoked laterally per row in
  SQL FROM clauses;
- everything here is deterministic and engine-portable (md5 / xor / regex
  — no RNG, no float accumulation), so the DuckDB oracle can replay it.

All registrations are idempotent; call :func:`register_all` freely.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import SparkSession


def pb_doc_hash(text: pd.Series) -> pd.Series:
    """Scalar vectorized UDF: first 15 hex digits of md5 as a bigint.

    60 bits — always positive, no signed-overflow edge case, and equal to
    DuckDB's ``CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)``.
    """
    return text.map(
        lambda t: int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        if t is not None
        else None
    ).astype("Int64")


def pb_xor_agg(values: pd.Series) -> int | None:
    """Aggregate (GROUPED_AGG) UDF: xor-fold of a bigint column.

    Order-independent and exact, so it hash-matches DuckDB's ``bit_xor``
    regardless of partitioning — the property to demand of any custom
    aggregate that must survive distributed re-ordering. SQL aggregate
    convention: an all-NULL (or empty) group yields NULL, not 0 — matching
    ``bit_xor`` on every engine."""
    non_null = values.dropna()
    if non_null.empty:
        return None
    acc = 0
    for v in non_null:
        acc ^= int(v)
    return acc


def xml_agg(fragments: pd.Series) -> str | None:
    """Aggregate (GROUPED_AGG) UDF: ``xml_agg`` — concatenate XML
    fragments per group (ref AggregateFunctions XML_AGG,
    qal/_qal.py:770-792 — the one reference aggregate with no built-in
    Spark spelling; SURVEY §2.3 previously carried it as the single
    documented gap).

    PostgreSQL's xml_agg without ORDER BY is input-order-nondeterministic;
    a distributed engine cannot reproduce an unspecified order, so this
    implementation ALWAYS sorts the FRAGMENT TEXT lexicographically —
    deterministic under any partitioning and therefore oracle-checkable.
    NB: fragment order is the order of the composed strings, tag markup
    included, which can differ from ordering by the inner value when one
    value is a proper prefix of another (``<n>NATION_11</n>`` sorts
    before ``<n>NATION_1</n>`` because ``'1' < '<'``) — an oracle must
    spell ``ORDER BY <fragment expression>``, never ``ORDER BY <value>``.
    Compose fragments with concat (``'<tag>' || v || '</tag>'``) in the
    query — PostgreSQL's ``xmlelement`` for simple element content."""
    non_null = fragments.dropna()
    if non_null.empty:
        return None
    return "".join(sorted(non_null.astype(str)))


_TOKEN_SPLIT = re.compile(r"\s+")


class pb_tokenize:
    """Table UDF: whitespace tokenizer, one (position, token) row per
    token. Invoked laterally — ``FROM docs d, LATERAL pb_tokenize(d.text)``
    — the Spark shape of the reference's set-returning FROM-clause
    functions."""

    def eval(self, text: str):
        if text is None:
            return
        pos = 0
        for tok in _TOKEN_SPLIT.split(text):
            if tok:
                yield pos, tok
                pos += 1


def register_all(spark: SparkSession) -> None:
    """Register every UDF under its ``pb_*`` SQL name (idempotent —
    re-registration replaces the same definition).

    The pandas_udf / udtf wrappers are built here, not at import time:
    the decorators resolve their return types against the active session,
    so module import must stay session-free.
    """
    from pyspark.sql.functions import pandas_udf, udtf

    spark.udf.register("pb_doc_hash", pandas_udf(pb_doc_hash, "long"))
    spark.udf.register("pb_xor_agg", pandas_udf(pb_xor_agg, "long"))
    spark.udf.register("xml_agg", pandas_udf(xml_agg, "string"))
    spark.udtf.register("pb_tokenize", udtf(pb_tokenize, returnType="pos int, token string"))
