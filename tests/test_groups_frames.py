"""GROUPS window frames (SQL:2011 peer-group frame mode) — the
dense_rank/RANGE rewrite in ``plans/parser.py`` (`_rewrite_groups_frame`
+ `_desugar_groups`).

DuckDB in this environment rejects GROUPS mode outright ("not
implemented yet"), so the semantic oracle here is a PURE-PYTHON
reference implementation of peer-group framing (`_groups_ref`), applied
to the same collected base rows the engine reads. A second axis pins the
degenerate equivalence: when every ordering key is unique, each peer
group is a single row, so GROUPS must equal ROWS with identical bounds
(which Spark runs natively, no rewrite).

Beyond the reference: its window model carries no frame specification at
all (ref /root/reference/postbound/qal/_qal.py:1308 WindowExpression).
"""

from __future__ import annotations

import math

import pytest

from postbound_spark.catalog import load_tables
from postbound_spark.operators.compiler import compile_plan
from postbound_spark.plans.algebra import parse_relalg
from postbound_spark.plans.parser import UnsupportedSqlError, parse_query


# ---------------------------------------------------------------------------
# pure-Python peer-group frame reference
# ---------------------------------------------------------------------------


def _groups_ref(rows, key, val, lo, hi, agg="sum"):
    """Per-row aggregate over a GROUPS frame.

    ``rows`` is the partition's row list; ``key(row)`` yields the
    ordering key (None sorts LAST, matching the engine's explicit NULLS
    LAST default); ``lo``/``hi`` are group offsets relative to the
    current row's peer group (None = unbounded in that direction).
    Returns ``{id(row): aggregate}`` in the sorted order as a list."""
    ordered = sorted(
        rows, key=lambda r: (key(r) is None, key(r) if key(r) is not None else 0)
    )
    # consecutive peer-group index per row (dense rank by key equality)
    gidx: list[int] = []
    g = -1
    prev = object()
    for r in ordered:
        k = key(r)
        if k != prev or not gidx:
            g += 1
            prev = k
        gidx.append(g)
    out = []
    for i, r in enumerate(ordered):
        glo = -math.inf if lo is None else gidx[i] + lo
        ghi = math.inf if hi is None else gidx[i] + hi
        vals = [
            val(s)
            for j, s in enumerate(ordered)
            if glo <= gidx[j] <= ghi and val(s) is not None
        ]
        if agg == "sum":
            out.append((r, sum(vals) if vals else None))
        elif agg == "count":
            out.append((r, len(vals)))
        elif agg == "min":
            out.append((r, min(vals) if vals else None))
        else:  # pragma: no cover
            raise AssertionError(agg)
    return out


def _run(spark, cat, schema, sql):
    return compile_plan(
        parse_relalg(parse_query(sql, schema=schema)), spark, cat
    ).collect()


@pytest.fixture(scope="module")
def nation_cat(spark, sf_small):
    cat = load_tables(spark, sf_small, ["nation", "region"])
    schema = {t: cat[t].columns for t in cat}
    base = [tuple(r) for r in cat["nation"].select(
        "n_nationkey", "n_regionkey", "n_name").collect()]
    return cat, schema, base


BOUND_CASES = [
    ("GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW", -1, 0),
    ("GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING", -1, 1),
    ("GROUPS BETWEEN CURRENT ROW AND CURRENT ROW", 0, 0),
    ("GROUPS UNBOUNDED PRECEDING", None, 0),
    ("GROUPS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING", 0, None),
    ("GROUPS BETWEEN 1 FOLLOWING AND 2 FOLLOWING", 1, 2),
    ("GROUPS 2 PRECEDING", -2, 0),
]


@pytest.mark.parametrize("frame,lo,hi", BOUND_CASES)
def test_groups_sum_matches_python_reference(
    spark, nation_cat, frame, lo, hi
):
    cat, schema, base = nation_cat
    got = _run(
        spark,
        cat,
        schema,
        f"SELECT n_nationkey, CAST(sum(n_nationkey) OVER (ORDER BY "
        f"n_regionkey {frame}) AS BIGINT) AS s FROM nation",
    )
    ref = _groups_ref(base, key=lambda r: r[1], val=lambda r: r[0], lo=lo, hi=hi)
    want = {r[0]: s for r, s in ref}
    assert {row.n_nationkey: row.s for row in got} == want


def test_groups_count_desc_order(spark, nation_cat):
    cat, schema, base = nation_cat
    got = _run(
        spark,
        cat,
        schema,
        "SELECT n_nationkey, count(*) OVER (ORDER BY n_regionkey DESC "
        "GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS c FROM nation",
    )
    # DESC ordering = negated key in the reference (keys are non-NULL)
    ref = _groups_ref(
        base, key=lambda r: -r[1], val=lambda r: r[0], lo=-1, hi=0, agg="count"
    )
    want = {r[0]: c for r, c in ref}
    assert {row.n_nationkey: row.c for row in got} == want


def test_groups_min_navigation_shape(spark, nation_cat):
    cat, schema, base = nation_cat
    got = _run(
        spark,
        cat,
        schema,
        "SELECT n_nationkey, min(n_name) OVER (ORDER BY n_regionkey "
        "GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS mn FROM nation",
    )
    ref = _groups_ref(
        base, key=lambda r: r[1], val=lambda r: r[2], lo=-1, hi=0, agg="min"
    )
    want = {r[0]: m for r, m in ref}
    assert {row.n_nationkey: row.mn for row in got} == want


def test_groups_equals_rows_on_unique_keys(spark, nation_cat):
    """With a UNIQUE ordering key every peer group is one row, so GROUPS
    must coincide with the natively-executed ROWS frame — an
    engine-level equivalence needing no external oracle."""
    cat, schema, _ = nation_cat
    groups = _run(
        spark,
        cat,
        schema,
        "SELECT n_nationkey, CAST(sum(n_regionkey) OVER (ORDER BY "
        "n_nationkey GROUPS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS "
        "BIGINT) AS s FROM nation",
    )
    rows = _run(
        spark,
        cat,
        schema,
        "SELECT n_nationkey, CAST(sum(n_regionkey) OVER (ORDER BY "
        "n_nationkey ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS "
        "BIGINT) AS s FROM nation",
    )
    assert sorted(map(tuple, groups)) == sorted(map(tuple, rows))


def test_groups_shared_spec_reuses_one_peer_index(spark, nation_cat):
    cat, schema, _ = nation_cat
    q = parse_query(
        "SELECT n_nationkey, count(*) OVER (ORDER BY n_regionkey GROUPS "
        "BETWEEN 1 PRECEDING AND CURRENT ROW) AS a, CAST(sum(n_nationkey) "
        "OVER (ORDER BY n_regionkey GROUPS BETWEEN 1 PRECEDING AND "
        "CURRENT ROW) AS BIGINT) AS b FROM nation",
        schema=schema,
    )
    rendered = q.to_sql()
    assert rendered.count("dense_rank()") == 1


def test_groups_null_keys_form_one_peer_group(spark, nation_cat):
    cat, schema, base = nation_cat
    got = _run(
        spark,
        cat,
        schema,
        "SELECT n_nationkey, count(*) OVER (ORDER BY CASE WHEN "
        "n_regionkey = 2 THEN NULL ELSE n_regionkey END GROUPS BETWEEN "
        "CURRENT ROW AND CURRENT ROW) AS c FROM nation",
    )
    ref = _groups_ref(
        base,
        key=lambda r: None if r[1] == 2 else r[1],
        val=lambda r: r[0],
        lo=0,
        hi=0,
        agg="count",
    )
    want = {r[0]: c for r, c in ref}
    assert {row.n_nationkey: row.c for row in got} == want


def test_groups_rejections(spark, nation_cat):
    cat, schema, _ = nation_cat
    for sql, frag in [
        (
            # no ORDER BY — peer groups undefined
            "SELECT count(*) OVER (PARTITION BY n_regionkey GROUPS "
            "BETWEEN 1 PRECEDING AND CURRENT ROW) AS c FROM nation",
            "require ORDER BY",
        ),
        (
            # aggregated query below the GROUPS window
            "SELECT n_regionkey, count(*) OVER (ORDER BY n_regionkey "
            "GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS c "
            "FROM nation GROUP BY n_regionkey",
            "aggregated/DISTINCT",
        ),
        (
            # multi-table FROM — qualified refs can't survive the wrap
            "SELECT n_nationkey, count(*) OVER (ORDER BY n_regionkey "
            "GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS c "
            "FROM nation, region WHERE n_regionkey = r_regionkey",
            "single FROM source",
        ),
        (
            # expression bound — not a group count
            "SELECT count(*) OVER (ORDER BY n_regionkey GROUPS BETWEEN "
            "n_nationkey PRECEDING AND CURRENT ROW) AS c FROM nation",
            "integer literals",
        ),
    ]:
        with pytest.raises(UnsupportedSqlError, match=frag):
            parse_query(sql, schema=schema)
