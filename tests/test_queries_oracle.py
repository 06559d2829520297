"""End-to-end correctness: every registered query vs its DuckDB oracle at
sf0.001 (fast); the driver repeats this at sf0.01. Mirrors the reference's
regression-suite result-set equivalence pattern (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from postbound_spark.queries import load_all
from postbound_spark.testing import compare_query


def _names():
    return sorted(load_all())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_small, name):
    ok, msg = compare_query(spark, name, sf_small)
    assert ok, msg


def test_oracle_lint_boundary_does_not_mistake_broadcast_for_cast():
    """Function names ENDING in 'cast' (broadcast, anycast) must not read
    as a CAST wrapper and waive the HUGEINT sum lint."""
    import pytest as _pytest

    from postbound_spark.queries import lint_oracle

    with _pytest.raises(ValueError, match="un-cast"):
        lint_oracle("x", "SELECT broadcast(sum(n_nationkey)) FROM nation")
    lint_oracle("x", "SELECT CAST(sum(n_nationkey) AS BIGINT) FROM nation")
    lint_oracle("x", "SELECT cast (sum(n_nationkey) AS BIGINT) FROM nation")


def test_priority_window_is_the_registry_prefix():
    """The driver verifies the first 50 registry entries; load_all() must
    order the registry so PRIORITY_WINDOW is EXACTLY its prefix — then
    the rotation overflow is always PRIORITY_WINDOW[50:], computed, and
    no prose enumeration of it can silently go stale (round-5 review:
    a hand-listed overflow missed op_duplicate_elimination)."""
    from postbound_spark.queries import PRIORITY_WINDOW

    ordered = list(load_all())
    assert ordered[: len(PRIORITY_WINDOW)] == list(PRIORITY_WINDOW)
    overflow = list(PRIORITY_WINDOW)[50:]
    assert ordered[50 : len(PRIORITY_WINDOW)] == overflow
