"""Skew-mitigation join operators.

Shuffle joins hash-partition both sides on the join key, so one hot key
(the null-ish default customer, the viral document, the empty-string lang)
lands an entire reducer's worth of rows on a single task — at 100 TB that
one straggler IS the job's wall clock. Two remedies, in preference order:

1. **AQE skew-join** (``spark.sql.adaptive.skewJoin.enabled``, on in our
   session presets): the runtime re-splits oversized shuffle partitions
   using the actual map-output sizes. Zero code, but it only triggers past
   size thresholds and only for sort-merge joins.
2. **Explicit salting** (this module): split every left row across
   ``salt`` sub-keys and replicate the right side ``salt`` times, so the
   hot key's rows spread over ``salt`` tasks *by construction*. Costs a
   deliberate ``salt``× blow-up of the right side — use when the right
   side is modest (but above the broadcast threshold, else just
   broadcast) and the skew is known ahead of time or AQE can't see it.

The reference delegates physical join choice to its backend DBMS (SURVEY.md
§2.7 — operator vocabulary, not implementations); salting is the
Spark-native entry in that vocabulary for the skew case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__pb_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the left side's hot keys spread across ``salt``
    sub-partitions.

    Left rows get a content-derived salt — xxhash64 over ``salt_on``
    (the join keys plus a stable row-identity column such as an id) —
    deterministic, so retried tasks re-salt identically. ``salt_on``
    must include at least one column beyond the join keys, otherwise
    every row of a hot key hashes to the SAME salt bucket and nothing
    spreads; it must also be stable across recomputation (ids, keys —
    never floats derived per-attempt). The right side is replicated once
    per salt value via ``explode`` (a narrow, map-side operation — the
    replication happens *before* the shuffle, so each reducer still
    receives exactly one copy of each right row per sub-key). Result
    rows are identical to ``left.join(right, on, how)``.

    Only ``inner`` and ``left`` joins are supported: for right/full outer
    joins the replicated right rows that find no match would surface as
    ``salt`` duplicate null-extended rows, which no post-filter can
    de-duplicate safely.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    if salt < 2:
        # salting disabled (callers tune salt down to 1 to mean "off") —
        # no salt column is ever derived, so skip the salt_on validation
        return left.join(right, on=on, how=how)
    if salt_on is None:
        salt_on = list(left.columns)
    if not set(salt_on) - set(on):
        raise ValueError(
            "salt_on must include a column beyond the join keys — salting "
            "by the join keys alone maps each hot key to one salt bucket"
        )
    salted_left = left.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in salt_on]), F.lit(salt))
    )
    salted_right = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_left.join(salted_right, on=on + [_SALT], how=how).drop(_SALT)


def decide_salt(
    hot_share: float,
    shuffle_partitions: int,
    *,
    target_imbalance: float = 4.0,
    max_salt: int = 32,
) -> int:
    """Salt factor for a measured hot-key share — the policy that turns
    ``profile_key_skew``'s report into a decision.

    A shuffle join hashes each key to one of ``shuffle_partitions``
    reducers, so the hottest reducer runs at roughly
    ``hot_share x shuffle_partitions`` times the average ("imbalance").
    Below ``target_imbalance`` the skew is noise (and AQE's skew-join
    split handles residual sort-merge cases at runtime); above it, the
    hot key IS the wall clock and we salt just enough to push the
    imbalance back under target — rounded up to a power of two, capped
    at ``max_salt`` because the right side is replicated ``salt``x.
    Returns 1 ("don't salt") for uniform keys."""
    if shuffle_partitions < 1 or not 0.0 <= hot_share <= 1.0:
        raise ValueError("need shuffle_partitions >= 1 and hot_share in [0, 1]")
    imbalance = hot_share * shuffle_partitions
    if imbalance <= target_imbalance:
        return 1
    salt = 2
    while salt < max_salt and imbalance / salt > target_imbalance:
        salt = min(salt * 2, max_salt)  # honor non-power-of-two caps too
    return salt


def plan_skew_mitigation(
    left: DataFrame,
    on: list[str],
    *,
    sample_fraction: float | None = None,
    target_imbalance: float = 4.0,
    max_salt: int = 32,
) -> dict:
    """Measure the left side's join-key skew and recommend a salt factor.

    The measurement is the hot-key share — the same statistic the
    ``profile_key_skew`` registry query reports (top keys with corpus
    share); this helper closes the loop by CONSUMING it: one
    partial-aggregated count per key (map-side combine, narrow result)
    and a single-row max. At warehouse scale pass ``sample_fraction``
    (hot-key shares are exactly what uniform sampling estimates well —
    a key holding 10%% of 100 TB still holds ~10%% of a 1%% sample).

    Returns ``{"hot_share", "hot_key", "salt", "shuffle_partitions"}``.
    """
    probe = left.sample(fraction=sample_fraction) if sample_fraction else left
    counts = probe.groupBy(*on).agg(F.count(F.lit(1)).alias("__pb_cnt"))
    top = (
        counts.orderBy(F.desc("__pb_cnt")).limit(1).collect()
    )  # TakeOrdered: no full sort, one driver row
    total = probe.count()
    if not top or total == 0:
        return {"hot_share": 0.0, "hot_key": None, "salt": 1,
                "shuffle_partitions": 1}
    spark = left.sparkSession
    shuffle_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    hot_share = top[0]["__pb_cnt"] / total
    return {
        "hot_share": hot_share,
        "hot_key": tuple(top[0][k] for k in on),
        "salt": decide_salt(
            hot_share,
            shuffle_partitions,
            target_imbalance=target_imbalance,
            max_salt=max_salt,
        ),
        "shuffle_partitions": shuffle_partitions,
    }


def skew_aware_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    *,
    salt_on: list[str] | None = None,
    sample_fraction: float | None = None,
    target_imbalance: float = 4.0,
    max_salt: int = 32,
) -> DataFrame:
    """Join that profiles the left side's key distribution and salts
    automatically when one hot key would dominate a reducer — the
    end-to-end composition of ``profile_key_skew`` (measure) →
    ``decide_salt`` (policy) → ``salted_join`` (mechanism). Uniform keys
    take the plain join path with zero overhead beyond the profile scan;
    results are identical either way."""
    decision = plan_skew_mitigation(
        left,
        on,
        sample_fraction=sample_fraction,
        target_imbalance=target_imbalance,
        max_salt=max_salt,
    )
    return salted_join(
        left, right, on, how=how, salt=decision["salt"], salt_on=salt_on
    )
