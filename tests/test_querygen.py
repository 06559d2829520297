"""200-query generative sweep: every generated query must parse through the
engine's own parser, compile through the algebra, execute on Spark, and
match DuckDB running the identical SQL text (ref experiments/querygen.py —
the reference's generator doubles as its parser stress test)."""

from __future__ import annotations

import duckdb
import pytest

from postbound_spark.catalog import TABLES, load_tables, table_path
from postbound_spark.operators.compiler import compile_plan
from postbound_spark.plans.algebra import parse_relalg
from postbound_spark.plans.parser import parse_query
from postbound_spark.querygen import CAT_VALUES, EDGES, SCHEMA, QueryGenerator
from postbound_spark.testing import _float_columns, _normalize, _rows_close

N_QUERIES = 200
SEED = 20260814


def test_generator_is_deterministic():
    a = QueryGenerator(seed=SEED).generate(25)
    b = QueryGenerator(seed=SEED).generate(25)
    assert a == b
    c = QueryGenerator(seed=SEED + 1).generate(25)
    assert a != c


def test_schema_tables_exist_in_fixtures(sf_small):
    assert set(SCHEMA) <= set(TABLES)
    con = duckdb.connect()
    real_cols = {
        t: {
            row[0]
            for row in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{table_path(sf_small, t)}')"
            ).fetchall()
        }
        for t in SCHEMA
    }
    for t1, c1, t2, c2 in EDGES:
        assert c1 in real_cols[t1] and c2 in real_cols[t2]
    for t, classes in SCHEMA.items():
        for cols in classes.values():
            assert set(cols) <= real_cols[t], (t, cols)
    for col, values in CAT_VALUES.items():
        assert values, col


def test_generated_queries_match_duckdb(spark, sf_small):
    gen = QueryGenerator(seed=SEED)
    queries = gen.generate(N_QUERIES)
    cat = load_tables(spark, sf_small, sorted(SCHEMA))
    con = duckdb.connect()
    for name in SCHEMA:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_small, name)}')"
        )
    failures = []
    for label, sql in queries.items():
        try:
            parsed = parse_query(sql)
            df = compile_plan(parse_relalg(parsed), spark, cat)
            spark_pdf = df.toPandas()
            duck_pdf = con.execute(sql).df()
            if sorted(spark_pdf.columns) != sorted(
                c.lower() for c in duck_pdf.columns
            ):
                failures.append((label, sql, "schema mismatch"))
                continue
            duck_pdf.columns = [c.lower() for c in duck_pdf.columns]
            if len(spark_pdf) != len(duck_pdf):
                failures.append(
                    (label, sql, f"rows {len(spark_pdf)} vs {len(duck_pdf)}")
                )
                continue
            fc = _float_columns(spark_pdf, duck_pdf)
            left = _normalize(spark_pdf, fc)
            right = _normalize(duck_pdf, fc)
            bad = [
                (l, r) for l, r in zip(left, right) if not _rows_close(l, r)
            ]
            if bad:
                failures.append((label, sql, f"values {bad[:1]}"))
        except Exception as exc:  # collect, don't abort the sweep
            failures.append((label, sql, f"{type(exc).__name__}: {exc}"))
    assert not failures, (
        f"{len(failures)}/{len(queries)} generated queries failed; first 5:\n"
        + "\n".join(f"{l}: {err}\n  {s}" for l, s, err in failures[:5])
    )


def test_generated_corpus_covers_the_grammar():
    """The sweep only fuzzes what it generates — assert the corpus actually
    exercises joins, aggregation, DISTINCT, subqueries, BETWEEN, LIKE."""
    corpus = " ||| ".join(QueryGenerator(seed=SEED).generate(N_QUERIES).values())
    for construct in (
        "GROUP BY",
        "HAVING",
        "DISTINCT",
        "ORDER BY",
        "LIMIT",
        "BETWEEN",
        "LIKE",
        " IN (SELECT",
        "COUNT(*)",
        "AVG(",
        "EXISTS (SELECT",
        "LEFT JOIN",
        " JOIN ",
        " OR ",
        "CASE WHEN",
        "GROUP BY gkey0",
        "WINDOW w AS (",   # named windows (round-6 parser surface)
        "OVER w",
    ):
        assert construct in corpus, f"corpus never generates {construct}"


def test_generated_queries_are_join_order_invariant(spark, sf_small):
    """Fuzzed join-order invariance: generated multi-table queries
    executed under the UES pessimistic forced order must reproduce the
    native order's results (float-tolerant — double SUMs accumulate in
    order-dependent sequence). Subquery-bearing and explicit-JOIN texts
    are skipped: forced orders re-fold the comma-FROM join graph only."""
    from postbound_spark.experiments import _plan_order, _prepared_tables
    from postbound_spark.plans.parser import to_query_spec

    cat = load_tables(spark, sf_small, sorted(SCHEMA))
    for name, df in cat.items():
        df.createOrReplaceTempView(name)

    gen = QueryGenerator(seed=SEED + 7)
    checked, failures = 0, []
    for label, sql in gen.generate(120).items():
        if checked >= 40:
            break
        if "(SELECT" in sql or " JOIN " in sql:
            continue
        parsed = parse_query(sql)
        if len(parsed.from_tables) < 2:
            continue
        spec = to_query_spec(parsed)
        tables = _prepared_tables(parsed, cat)
        order, _, _, _ = _plan_order(spark, "ues", parsed, spec, tables)
        native = compile_plan(parse_relalg(parsed), spark, cat).toPandas()
        forced = compile_plan(
            parse_relalg(parsed, join_order=list(order)), spark, cat
        ).toPandas()
        fc = _float_columns(native, forced)
        diffs = [
            (l, r)
            for l, r in zip(_normalize(native, fc), _normalize(forced, fc))
            if not _rows_close(l, r)
        ]
        if len(native) != len(forced) or diffs:
            failures.append((label, sql, diffs[:2]))
        checked += 1
    assert checked >= 30, f"only {checked} eligible queries generated"
    assert not failures, failures[:3]


def test_xml_agg_parses_and_compiles_natively(spark, sf_small):
    """xml_agg through the FULL native pipeline (parse -> relalg ->
    compile): the registered GROUPED_AGG UDAF resolves by name, closing
    the last SURVEY §2.3 gap. Deterministic: the UDAF sorts fragments."""
    from postbound_spark.functions.udf import register_all

    register_all(spark)
    cat = load_tables(spark, sf_small, ["nation"])
    sql = (
        "SELECT n_regionkey, xml_agg('<n>' || n_name || '</n>') AS nations "
        "FROM nation GROUP BY n_regionkey"
    )
    rows = {
        r.n_regionkey: r.nations
        for r in compile_plan(parse_relalg(parse_query(sql)), spark, cat).collect()
    }
    assert len(rows) == 5
    for xml in rows.values():
        assert xml.startswith("<n>NATION_") and xml.endswith("</n>")
        # sorted fragments (full fragment text, suffix included):
        # deterministic across partitionings
        frags = [f"<n>{f}</n>" for f in xml.replace("</n>", "").split("<n>")[1:]]
        assert frags == sorted(frags)
