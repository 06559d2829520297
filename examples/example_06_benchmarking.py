"""Example 06 — the benchmark execution loop.

Mirrors example-06-benchmarking.py: run a labeled workload with
repetitions and shuffling through execute_workload and read the
reference-schema result frame (exec_time per repetition, errors
captured, progressive output optional).
"""

from __future__ import annotations


def main(spark=None, sf_dir=None):
    from _shared import bootstrap

    spark, sf_dir, tables = bootstrap(spark, sf_dir)

    from postbound_spark.workloads import Workload, execute_workload

    workload = Workload(
        {
            "pricing": "SELECT l_returnflag, count(*) AS n FROM lineitem "
                       "GROUP BY l_returnflag",
            "top_nations": "SELECT n_name, count(*) AS n FROM customer, nation "
                           "WHERE c_nationkey = n_nationkey GROUP BY n_name",
        }
    )
    results = execute_workload(
        spark,
        workload,
        sf_dir,
        per_query_repetitions=2,
        shuffled=True,
    )
    print(
        results[["label", "status", "query_repetition", "exec_time", "n_rows"]]
        .to_string(index=False)
    )
    return results


if __name__ == "__main__":
    main()
