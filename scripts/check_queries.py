"""Dev harness: run every registered query against its DuckDB oracle at a
given sf dir (default sf0.01, the driver's correctness scale).

Usage: python scripts/check_queries.py [name ...] [--sf DIR]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from postbound_spark.queries import load_all  # noqa: E402
from postbound_spark.session import get_spark  # noqa: E402
from postbound_spark.testing import compare_query  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    registry = load_all()
    names = args.names or list(registry)
    spark = get_spark("check-queries", cpus=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for name in names:
        start = time.time()
        try:
            ok, msg = compare_query(spark, name, args.sf)
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {type(exc).__name__}: {exc}"
        status = "PASS" if ok else "FAIL"
        if not ok:
            failures += 1
        print(f"{status} {name} ({time.time() - start:.1f}s) {msg}", flush=True)
    print(f"{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
