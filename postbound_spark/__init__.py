"""postbound_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rbergm/PostBOUND.

The reference (PostBOUND, /root/reference) is a query-optimization research
framework: SQL IR (qal), relational algebra (relalg), optimizer stages, and a
benchmarking harness, executing on a backend DBMS. This package re-expresses
those capability boundaries Spark-first (see SURVEY.md §7):

- :mod:`postbound_spark.catalog` — parquet table catalog (ref: db/_db.py schema
  interface).
- :mod:`postbound_spark.plans.relalg` — the 16 logical operators
  (ref: postbound/relalg.py) as an immutable RelNode tree.
- :mod:`postbound_spark.operators.compiler` — RelNode → DataFrame compiler;
  Catalyst performs physical planning.
- :mod:`postbound_spark.functions` — scale-oriented data-pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing).
- :mod:`postbound_spark.optimizer` — join graph / join tree / operator
  assignment instrumentation (ref: postbound/_hints.py, opt/).
- :mod:`postbound_spark.bench` — workload execution harness
  (ref: postbound/bench.py).
"""

from postbound_spark.session import get_spark
from postbound_spark.catalog import TABLES, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views", "TABLES"]
__version__ = "0.1.0"
