"""Temporal join operators: as-of join and binned range join.

The reference has no time-series operators (SURVEY.md §2.8 — batch SELECT
world); these are engine extensions in the brief's "operators Spark lacks"
category, each implemented as a *composition of existing DataFrame ops*
(option (a) of the custom-operator ladder — no UDF, no mapPartitions), so
whole-stage codegen and Catalyst planning stay fully in effect.

**As-of join** (``asof_join``): for every left row, the single most recent
right row with right_ts ≤ left_ts per key. The naive formulation is an
inequality join (O(n·m) BroadcastNestedLoop in Spark — unusable at scale).
This implementation is the union–window composition:

    union(tagged left, tagged right)
      → window per key ordered by (ts, tag):
            last(right payload, ignorenulls) over rows unbounded-preceding
      → keep left rows

One shuffle on the key, O(n log n) per partition for the sort — the same
cost profile as a sort-merge join, independent of time-gap distribution.

**Binned range join** (``range_join_binned``): join points to intervals
(lo ≤ point ≤ hi) per key. Naive = BNLJ again. The scale path bins the
time axis: intervals explode to the bins they cover (``sequence``), points
map to exactly one bin, and the join becomes an equi-join on
(key, bin) + residual between-filter. Each (point, interval) pair meets in
exactly one bin — the point's own — so no dedup is needed. Shuffle volume
is |points| + |intervals| × avg_bins_per_interval; pick ``bin_width`` ≈
typical interval length so the explosion factor stays ~1-2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_binned"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: left rows gain ``{prefix}{col}`` columns from
    the latest right row with ``right_ts <= left_ts`` on the same keys
    (NULLs when no prior right row exists).

    NULL semantics follow SQL ASOF joins (the DuckDB/kdb contract): right
    rows with a NULL timestamp or NULL key can never match (``<=`` over
    NULL is never true) and are excluded up front — otherwise NULLs would
    sort first in the window and masquerade as "earliest" matches. Left
    rows always survive; a NULL left timestamp simply matches nothing."""
    if right_cols is None:  # an explicit [] means "timestamp only"
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    not_null = F.col(right_ts).isNotNull()
    for k in keys:
        not_null = not_null & F.col(k).isNotNull()
    right = right.filter(not_null)
    payload = F.struct(
        F.col(right_ts).alias("__asof_ts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        payload.alias("__payload"),
        *[F.lit(None).cast(t.dataType).alias(f"__l_{t.name}") for t in left.schema],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(t.name).alias(f"__l_{t.name}") for t in left.schema],
    )
    # right rows sort before left rows at equal timestamps (tag 0 < 1), so
    # an exactly-simultaneous right row IS visible to the left row (>=);
    # the payload struct joins the sort key so ties among right rows at
    # the same (key, ts) resolve deterministically, not by partition order
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__tag", "__payload")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        l.unionByName(r)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    out_cols: list[Column] = [
        F.col(f"__l_{t.name}").alias(t.name) for t in left.schema
    ]
    out_cols += [
        F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_cols
    ]
    out_cols.append(F.col("__match.__asof_ts").alias(f"{prefix}{right_ts}"))
    return matched.select(*out_cols)


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
) -> DataFrame:
    """Point-in-interval range join via time-axis binning. ``point_col``,
    ``lo_col``, ``hi_col`` must be numeric (cast timestamps to epoch
    first); ``bin_width`` in the same unit.

    Bin numbers use exact BIGINT integer division — float division here
    would mis-bin epochs above 2^53 (nanosecond timestamps) and silently
    drop boundary matches when point and interval disagree on the bin."""

    def bin_of(col: str) -> Column:
        return F.expr(f"CAST({col} AS BIGINT) div {int(bin_width)}")

    p = points.withColumn("__bin", bin_of(point_col))
    # lo <= hi guard BEFORE the sequence: Spark's sequence(start, stop)
    # steps -1 when start > stop, so one corrupt inverted interval would
    # explode into a descending bin array spanning the whole time axis
    # (potentially millions of rows) — rows the residual BETWEEN filter
    # would discard anyway. Filtering them out first matches "an empty
    # interval matches nothing" at zero cost.
    i = (
        intervals.filter(F.col(lo_col) <= F.col(hi_col))
        .withColumn("__bins", F.sequence(bin_of(lo_col), bin_of(hi_col)))
        .withColumn("__bin", F.explode("__bins"))
        .drop("__bins")
    )
    cond = [p["__bin"] == i["__bin"]] + [p[k] == i[k] for k in keys]
    joined = p.join(i, cond, "inner").filter(
        (p[point_col] >= i[lo_col]) & (p[point_col] <= i[hi_col])
    )
    drop = [i[k] for k in keys] + [p["__bin"], i["__bin"]]
    return joined.drop(*drop)
