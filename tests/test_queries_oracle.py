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
