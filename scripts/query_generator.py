#!/usr/bin/env python
"""Generate random SELECT queries over the fixture schema (CLI).

The Spark counterpart of the reference's ``tools/query-generator.py``:
a seeded join-graph-walk generator (postbound_spark.querygen) emitting
plain ANSI SQL files.

Usage:
    python scripts/query_generator.py -n 100 [--out-dir gen_out]
        [--max-tables 4] [--seed 0] [--query-prefix q-]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser(description="Generate random workload queries.")
    ap.add_argument("--n-queries", "-n", type=int, default=100)
    ap.add_argument("--out-dir", "-o", default=".")
    ap.add_argument("--max-tables", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--query-prefix", default="q-")
    ns = ap.parse_args()

    from postbound_spark.querygen import QueryGenerator

    gen = QueryGenerator(seed=ns.seed, max_tables=ns.max_tables)
    os.makedirs(ns.out_dir, exist_ok=True)
    queries = gen.generate(ns.n_queries)
    for i, sql in enumerate(queries.values(), start=1):
        with open(os.path.join(ns.out_dir, f"{ns.query_prefix}{i}.sql"), "w") as fh:
            fh.write(sql.strip() + ";\n")
    print(f"wrote {len(queries)} queries to {ns.out_dir}")


if __name__ == "__main__":
    main()
