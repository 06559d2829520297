"""Example 05 — training data for learned cardinality estimation.

Mirrors example-05-machine-learning.py: collect (estimate, actual)
pairs per join from executed queries, wrap them as TrainingData with a
feature spec, and fit a minimal corrective model (log-linear regression
estimate -> actual) — the input side of a learned estimator.
"""

from __future__ import annotations

QUERIES = {
    "q1": """SELECT count(*) AS n FROM customer, orders
             WHERE c_custkey = o_custkey AND c_acctbal > 0""",
    "q2": """SELECT count(*) AS n FROM lineitem, orders
             WHERE l_orderkey = o_orderkey""",
    "q3": """SELECT count(*) AS n FROM customer, nation
             WHERE c_nationkey = n_nationkey""",
}


def main(spark=None, sf_dir=None):
    import math

    import numpy as np

    from _shared import bootstrap

    spark, sf_dir, tables = bootstrap(spark, sf_dir)

    from postbound_spark.train import TrainingSpec, collect_cardinality_samples

    data = collect_cardinality_samples(spark, QUERIES, tables)
    required = TrainingSpec("estimated_cardinality", "cardinality")
    # SpecViolations is truthy when the provider satisfies the requirement
    check = data.spec.satisfies(required)
    print("spec satisfied:", bool(check), "| samples:", len(data.samples))

    frame = data.samples.dropna(subset=["estimated_cardinality", "cardinality"])
    frame = frame[(frame.estimated_cardinality > 0) & (frame.cardinality > 0)]
    x = np.log10(frame.estimated_cardinality.to_numpy())
    y = np.log10(frame.cardinality.to_numpy())
    slope, intercept = np.polyfit(x, y, 1)
    corrected = 10 ** (slope * x + intercept)
    qerr = np.maximum(corrected / frame.cardinality, frame.cardinality / corrected)
    print(f"fitted log-linear corrector: slope={slope:.3f} "
          f"intercept={intercept:.3f} mean-qerror={qerr.mean():.2f}")
    return data


if __name__ == "__main__":
    main()
