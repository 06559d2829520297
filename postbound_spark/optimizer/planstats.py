"""Zero-write plan-time cardinality injection for arbitrary intermediates.

The reference's pg_lab backend applies ``Card(#t1 #t2 ... #NNN)`` hints to
ANY intermediate purely at plan time (rbergm/PostBOUND
``postbound/postgres.py:2343-2460``): the planner's row estimate for the
join of a given *table set* is replaced by a researcher-chosen number, no
data is touched, and a cardinality sweep of hundreds of points costs
hundreds of plan compilations — not hundreds of writes.

This module is the Spark-native equivalent, closing the gap left by
:mod:`postbound_spark.optimizer.intermediates` (which needs the target
expressed as a CTE and pays a ``saveAsTable`` materialization per
intermediate):

1. the query is analyzed + optimized normally (``qe.optimizedPlan()`` —
   physical planning has not happened yet at that point);
2. every optimized-plan node is labeled with the set of base tables
   beneath it (parquet relations resolve through their file path, catalog
   tables through their identifier);
3. for each requested table set, every node covering EXACTLY that set gets
   its ``statsCache`` pre-populated with the injected ``Statistics``
   (``rowCount`` + a schema-derived ``sizeInBytes``) through a small
   compiled JVM helper (`jvm/PlanStatsInjector.java` — py4j flattens
   ``scala.math.BigInt`` to a Python int in both directions, so the
   Statistics object must be built JVM-side);
4. all other caches are cleared first, so stale stats memoized during the
   optimizer phase (CBO join reordering calls ``stats()``) cannot shadow
   the injected children when parents re-derive their estimates;
5. physical planning then runs lazily against the doctored estimates:
   join strategy selection, broadcast thresholds, and build-side choice
   (``JoinSelectionHelper``) all consult ``plan.stats`` through the very
   cache that was just seeded.

Scope: the injection steers everything AFTER logical optimization —
physical strategy, build sides, AQE's initial plan. Logical join
*reordering* happened before the splice point; forcing a join order is
the job of the join-tree/hint machinery (``optimizer/hints.py``,
``compile_join_tree``), exactly the split the reference uses (join order
via pg_hint_plan ``Leading``, cardinalities via pg_lab ``Card``).

Self-joins are out of scope: table sets are keyed by base-table name, so
a query touching the same table twice has ambiguous intermediates (the
optimizer erases aliases); use the CTE-based injector for those.

No Hive catalog, no writes — works on the plain in-memory-catalog session.
"""

from __future__ import annotations

import os
import subprocess
from typing import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession

_JVM_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "jvm")
_JAVA_SRC = os.path.join(_JVM_DIR, "PlanStatsInjector.java")
_CLASSES_DIR = os.path.join(_JVM_DIR, "classes")
_CLASS_FILE = os.path.join(_CLASSES_DIR, "postboundspark", "PlanStatsInjector.class")
_HELPER_CLASS = "postboundspark.PlanStatsInjector"


def _spark_jars_dir() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "jars")


def ensure_helper_compiled() -> str:
    """Compile the JVM helper if missing or stale; return the classes dir.

    One ``javac`` invocation per checkout (the .class is cached next to
    the source and only rebuilt when the source is newer). Raises a clear
    error when no JDK is available — the CTE-based
    :class:`~postbound_spark.optimizer.intermediates.IntermediateCardinalityInjector`
    remains the fallback there.
    """
    if os.path.exists(_CLASS_FILE) and os.path.getmtime(_CLASS_FILE) >= os.path.getmtime(
        _JAVA_SRC
    ):
        return _CLASSES_DIR
    try:
        subprocess.run(
            [
                "javac",
                "-encoding",
                "UTF-8",
                "-cp",
                os.path.join(_spark_jars_dir(), "*"),
                "-d",
                _CLASSES_DIR,
                _JAVA_SRC,
            ],
            check=True,
            capture_output=True,
            text=True,
        )
    except FileNotFoundError as exc:
        raise RuntimeError(
            "plan-time cardinality injection needs a JDK (javac) to build "
            "its JVM helper once; use IntermediateCardinalityInjector on "
            "JRE-only machines"
        ) from exc
    except subprocess.CalledProcessError as exc:
        raise RuntimeError(f"helper compilation failed:\n{exc.stderr}") from exc
    return _CLASSES_DIR


def _load_helper(spark: SparkSession):
    """Load the compiled helper into the live driver JVM via a
    URLClassLoader child of Spark's context classloader (parent-first, so
    every Catalyst type resolves from Spark's own loader)."""
    classes_dir = ensure_helper_compiled()
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    urls = gw.new_array(jvm.java.net.URL, 1)
    urls[0] = jvm.java.io.File(classes_dir).toURI().toURL()
    parent = jvm.Thread.currentThread().getContextClassLoader()
    loader = jvm.java.net.URLClassLoader(urls, parent)
    cls = loader.loadClass(_HELPER_CLASS)
    # getDeclaredConstructor() is varargs — py4j would need an explicit
    # empty Class[]; the no-arg Class.newInstance is simpler over the bridge
    helper = cls.newInstance()
    # the helper doubles as a planning strategy that re-seeds statsCache
    # from tags on the CLONED plan every pass (QueryExecution.sparkPlan
    # clones the optimized plan, which wipes caches but keeps tags)
    helper.register(spark._jsparkSession.experimental())
    return helper


def _jseq(scala_seq) -> list:
    return [scala_seq.apply(i) for i in range(scala_seq.size())]


def _leaf_table(jnode) -> str | None:
    """Base-table name of a leaf node: catalog identifier when present,
    else the parquet location's basename (``.../nation.parquet`` →
    ``nation`` — the fixture/lakehouse layout)."""
    name = jnode.nodeName()
    if name == "HiveTableRelation":
        return jnode.tableMeta().identifier().table().lower()
    if name == "LogicalRelation":
        ct = jnode.catalogTable()
        if ct.isDefined():
            return ct.get().identifier().table().lower()
        try:
            paths = jnode.relation().location().rootPaths()
        except Exception:
            return None
        if paths.size() > 0:
            base = paths.apply(0).getName()
            return (base.rsplit(".", 1)[0] if "." in base else base).lower()
    return None


def _row_width_bytes(jnode) -> int:
    """Catalyst's own per-row width convention (sum of the output
    attributes' ``defaultSize`` + row overhead), so injected sizeInBytes
    is commensurate with the estimates of non-injected subtrees."""
    width = 8
    for attr in _jseq(jnode.output()):
        width += attr.dataType().defaultSize()
    return width


def _normalize_key(key) -> frozenset[str]:
    if isinstance(key, str):
        parts = [p.strip() for p in key.split(",")]
    elif isinstance(key, Iterable):
        parts = list(key)
    else:
        raise TypeError(f"table-set key must be str or iterable, got {type(key)}")
    return frozenset(p.lower() for p in parts)


class PlanTimeCardinalityInjector:
    """Plan arbitrary queries under injected per-intermediate cardinalities
    without materializing anything (pg_lab ``Card()`` parity at plan time;
    ref ``postbound/postgres.py:2343``).

    ``cards`` maps a table set (frozenset/iterable of base-table names, or
    a comma-joined string) to the row count the planner should assume for
    every intermediate covering exactly that set.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._helper = _load_helper(spark)

    def plan(
        self,
        query: str | DataFrame,
        cards: Mapping,
        *,
        size_bytes: Mapping | None = None,
        adaptive: bool | None = None,
    ) -> DataFrame:
        """Return ``query`` as a DataFrame whose physical plan is chosen
        under the injected cardinalities. Zero writes, zero catalog state.

        ``size_bytes`` optionally overrides the injected sizeInBytes per
        table set (default: rows × schema-derived row width).
        ``adaptive=False`` pins the physical plan by materializing it with
        AQE off (deterministic experiments); default leaves the session
        setting untouched.
        """
        df = self.spark.sql(query) if isinstance(query, str) else query
        qe = df._jdf.queryExecution()
        opt = qe.optimizedPlan()

        targets = {_normalize_key(k): float(v) for k, v in cards.items()}
        sizes = {
            _normalize_key(k): int(v) for k, v in (size_bytes or {}).items()
        }

        nodes: list[tuple[object, frozenset[str]]] = []

        def walk(jnode) -> frozenset[str]:
            children = _jseq(jnode.children())
            if not children:
                leaf = _leaf_table(jnode)
                tabs = frozenset([leaf]) if leaf else frozenset()
            else:
                tabs = frozenset().union(*(walk(c) for c in children))
            nodes.append((jnode, tabs))
            return tabs

        walk(opt)

        # duplicate base names ⇒ self-join ⇒ table sets are ambiguous
        leaf_names = [t for jn, tabs in nodes if not _jseq(jn.children()) for t in tabs]
        if len(leaf_names) != len(set(leaf_names)):
            dupes = sorted({t for t in leaf_names if leaf_names.count(t) > 1})
            raise ValueError(
                f"query scans {dupes} more than once — table-set keyed "
                "injection is ambiguous for self-joins; use the CTE-based "
                "IntermediateCardinalityInjector"
            )

        # wipe stale tags/caches BEFORE tagging, so earlier injections on a
        # reused DataFrame and optimizer-phase caches cannot shadow these
        self._helper.clearAll(opt)

        matched: set[frozenset[str]] = set()
        for jnode, tabs in nodes:
            if tabs in targets:
                rows = int(targets[tabs])
                size = sizes.get(tabs, max(1, rows) * _row_width_bytes(jnode))
                self._helper.tag(jnode, str(max(1, size)), str(rows))
                matched.add(tabs)

        missing = set(targets) - matched
        if missing:
            available = sorted(
                {",".join(sorted(tabs)) for _, tabs in nodes if tabs}
            )
            raise KeyError(
                f"no intermediate covers table set(s) "
                f"{[','.join(sorted(m)) for m in sorted(missing, key=sorted)]}; "
                f"plan offers: {available}"
            )

        if adaptive is not None:
            key = "spark.sql.adaptive.enabled"
            prev = self.spark.conf.get(key)
            self.spark.conf.set(key, str(adaptive).lower())
            try:
                qe.executedPlan()  # force the lazy val under this setting
            finally:
                self.spark.conf.set(key, prev)
        return df

    def visible_row_count(self, df: DataFrame, table_set) -> float:
        """The row count the planner sees for the lowest intermediate
        covering exactly ``table_set`` (NaN when no estimate)."""
        import math

        target = _normalize_key(table_set)
        qe = df._jdf.queryExecution()

        def walk(jnode) -> frozenset[str]:
            children = _jseq(jnode.children())
            if not children:
                leaf = _leaf_table(jnode)
                return frozenset([leaf]) if leaf else frozenset()
            tabs = frozenset().union(*(walk(c) for c in children))
            return tabs

        def find(jnode):
            for child in _jseq(jnode.children()):
                hit = find(child)
                if hit is not None:
                    return hit
            return jnode if walk(jnode) == target else None

        node = find(qe.optimizedPlan())
        if node is None:
            return math.nan
        text = self._helper.visibleRowCount(node)
        return float(text) if text else math.nan
