"""salted_join == plain join (row multiset), on genuinely skewed data —
every events row shares one of three hot type keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postbound_spark.catalog import load_table
from postbound_spark.operators.skew import salted_join


def _skewed_sides(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # collapse event_type onto 3 hot keys -> heavy shuffle skew by design
    left = ev.select(
        (F.crc32(F.col("event_type")) % 3).alias("k"), "event_id", "value"
    )
    right = (
        ev.groupBy((F.crc32(F.col("event_type")) % 3).alias("k"))
        .agg(F.count("*").alias("n_type"))
    )
    return left, right


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())

def test_salted_inner_matches_plain(spark, sf_small):
    left, right = _skewed_sides(spark, sf_small)
    plain = left.join(right, on=["k"], how="inner")
    salted = salted_join(left, right, on=["k"], how="inner", salt=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _multiset(salted.select(*plain.columns)) == _multiset(plain)


def test_salted_left_outer_keeps_unmatched(spark, sf_small):
    left, right = _skewed_sides(spark, sf_small)
    right_partial = right.filter(F.col("k") != 0)  # key 0 loses its match
    plain = left.join(right_partial, on=["k"], how="left")
    salted = salted_join(left, right_partial, on=["k"], how="left", salt=4)
    assert _multiset(salted.select(*plain.columns)) == _multiset(plain)
    # unmatched rows really are present with nulls
    assert salted.filter(F.col("n_type").isNull()).count() > 0


def test_salted_join_rejects_full_outer(spark, sf_small):
    left, right = _skewed_sides(spark, sf_small)
    with pytest.raises(ValueError):
        salted_join(left, right, on=["k"], how="full")


def test_salt_on_rejects_join_keys_only(spark, sf_small):
    """Salting by the join keys alone maps every row of a hot key to ONE
    salt bucket — nothing spreads; the API refuses the foot-gun."""
    left, right = _skewed_sides(spark, sf_small)
    with pytest.raises(ValueError, match="beyond the join keys"):
        salted_join(left, right, on=["k"], salt_on=["k"])


def test_salt_on_explicit_stable_columns(spark, sf_small):
    """salt_on pins the salt derivation to caller-chosen stable columns, so
    a volatile column elsewhere in the row cannot re-salt retried tasks
    differently; results still match the plain join."""
    left, right = _skewed_sides(spark, sf_small)
    # a derived float column that salting must NOT touch
    left_noisy = left.withColumn("noise", F.rand(seed=1))
    plain = left_noisy.join(right, on=["k"], how="inner")
    salted = salted_join(
        left_noisy, right, on=["k"], how="inner", salt=8,
        salt_on=["k", "event_id"],
    )
    assert _multiset(salted.select("k", "event_id", "n_type")) == _multiset(
        plain.select("k", "event_id", "n_type")
    )


def test_salt_actually_spreads_hot_key(spark, sf_small):
    left, right = _skewed_sides(spark, sf_small)
    salted = salted_join(left, right, on=["k"], salt=8)
    # the physical plan joins on (k, __pb_salt): the hot key's rows hash to
    # up to 8 distinct shuffle keys instead of 1
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__pb_salt" in plan


def test_salt_one_means_off_even_for_keys_only_frames(spark, sf_small):
    """salt < 2 is the documented 'salting off' switch: it must degrade to
    a plain join without tripping the salt_on validation, even when the
    left frame carries nothing beyond the join keys."""
    left = load_table(spark, sf_small, "orders").select("o_custkey")
    right = load_table(spark, sf_small, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_acctbal"
    )
    plain = left.join(right, on=["o_custkey"]).count()
    assert salted_join(left, right, on=["o_custkey"], salt=1).count() == plain
