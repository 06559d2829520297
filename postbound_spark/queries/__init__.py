"""Named query registry — the correctness surface of the engine.

Each entry pairs a Spark builder ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL oracle string (run by DuckDB on the same parquet, the
reference's "DB as oracle" test pattern — SURVEY.md §5). The driver hashes
both result sets, so builders follow two rules:

1. every computed column is aliased identically on both sides;
2. floating-point aggregates are ``round``-ed (identically on both sides) so
   bit-level summation-order differences between engines cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None):
    """Register a query builder under ``name`` with an optional oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(name, fn, oracle)
        return fn

    return deco


# The driver's CORRECTNESS harness verifies the first N (=50) registry entries
# in iteration order.  This list pins that window to the capability frontier —
# every LLM-pipeline operator, the UDF suite, the SQL-surface constructs that
# only a composite query can prove, and the parser-path entries — instead of
# letting import order burn the slots on micro-operators that the composite
# queries already exercise transitively (e.g. every TPC-H query proves
# scan+filter+join+agg+sort).  Names not present in the registry are skipped
# silently so the list can reference queries added later in a round.
PRIORITY_WINDOW: tuple[str, ...] = (
    # --- LLM-data-pipeline operators (text/dedup/ANN/temporal/multimodal) ---
    "text_token_stats",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_winnow_segments",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_components",
    "ann_cosine_topk",
    "ann_lsh_bucket_histogram",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "events_window_agg",
    "events_sessionize",
    "events_json_props",
    "events_asof_join",
    "events_range_join_binned",
    "mm_binary_features",
    "mm_frame_sample",
    # --- vectorized UDF/UDAF/UDTF surface ---
    "udf_doc_hash",
    "udf_xor_checksum",
    "udf_tokenize_topk",
    # --- SQL surface constructs not provable via the composites ---
    "sql_left_outer_join",
    "sql_full_outer_join",
    "sql_right_outer_join",
    "sql_natural_join",
    "sql_distinct_on",
    "sql_lateral_subquery",
    # (sql_rollup and sql_cube stay registered but yield their window slots
    # to dedup_components / text_winnow_segments — GROUPING SETS is the
    # general form of the family)
    "sql_grouping_sets",
    "expr_window_frame",
    "expr_scalar_subquery",
    "expr_quantifier_all",
    "expr_agg_filter",
    "expr_array_ops",
    "expr_string_agg",
    # --- predicate frontier (null-aware / array / correlated) ---
    "pred_not_in_null_aware",
    "pred_is_distinct_from",
    "pred_array_operators",
    "pred_exists_correlated",
    # --- parser-path (IR → compiler) entries ---
    "parsed_left_outer_join",
    "parsed_distinct_on",
    "parsed_lateral",
    "parsed_values_table_function",
    "parsed_hinted_merge_join",
    # --- representative composites + optimizer pipeline ---
    "flagship_regional_revenue",
    "q12_shipping_priority_split",
    "opt_ues_regional_revenue",
)


def load_all() -> dict[str, QueryDef]:
    """Import all query modules (side effect: registration) and return the
    registry, re-ordered so :data:`PRIORITY_WINDOW` entries come first."""
    from postbound_spark.queries import (  # noqa: F401
        ir_demo,
        operators,
        optimizer_demo,
        parsed,
        pipeline,
        surface,
        tpch,
        udf_demo,
    )

    ordered: dict[str, QueryDef] = {}
    for name in PRIORITY_WINDOW:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, qdef in REGISTRY.items():
        if name not in ordered:
            ordered[name] = qdef
    return ordered
