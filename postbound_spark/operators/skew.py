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
