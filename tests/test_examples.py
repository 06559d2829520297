"""Every examples/ script runs end-to-end on the fixture session.

The reference keeps runnable numbered examples (examples/example-01 …);
these are the Spark work-alikes (examples/README.md maps them). Each
exposes main(spark, sf_dir) so the suite executes all of them against
one shared session — an example that drifts from the API fails CI here.
"""

from __future__ import annotations

import importlib
import os
import sys

import pytest

EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)
MODULES = sorted(
    m[:-3]
    for m in os.listdir(EXAMPLES_DIR)
    if m.startswith("example_") and m.endswith(".py")
)


@pytest.mark.parametrize("module_name", MODULES)
def test_example_runs(module_name, spark, sf_small):
    sys.path.insert(0, EXAMPLES_DIR)
    try:
        module = importlib.import_module(module_name)
        result = module.main(spark, sf_small)
        assert result is not None
    finally:
        sys.path.remove(EXAMPLES_DIR)


def test_every_example_is_listed_in_readme():
    with open(os.path.join(EXAMPLES_DIR, "README.md")) as fh:
        readme = fh.read()
    for module_name in MODULES:
        assert f"{module_name}.py" in readme, module_name


def test_example_08_releases_session_binding(spark, sf_small):
    """Regression (round 7): example_08's Database facade must not leave
    the shared session BOUND to its fixture dir — later modules
    legitimately register views for other dirs and would trip the
    mutation-point guard."""
    import importlib
    import sys

    from postbound_spark.catalog import register_views

    sys.path.insert(0, EXAMPLES_DIR)
    try:
        importlib.import_module("example_08_database_interaction").main(
            spark, sf_small
        )
    finally:
        sys.path.remove(EXAMPLES_DIR)
    # would raise ValueError if the binding leaked
    register_views(spark, "/root/testdata/sf0.01", ["region"])
    register_views(spark, sf_small, ["region"])  # restore
