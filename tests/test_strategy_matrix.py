"""The full optimizer-strategy matrix over JOB fixture queries.

Round-5 verdict item 1: the textbook DP, PG pathlist DP and TONIC stages
had never planned a corpus — only unit queries. This module runs every
strategy (native / ues / dp / pgdp / tonic) over a table-count-spanning
slice of the committed JOB fixture (5 → 17 tables, self-joins included)
and pins the three properties the experiment exists to demonstrate:

1. every strategy executes and returns THE SAME result (fingerprint
   invariance — a forced order or forced operator must never change
   semantics);
2. TONIC's train→save→load→replay cycle round-trips inside the loop
   (``trie_path`` forces every replay through serialization);
3. the DP strategies produce non-trivial orders (all query tables, no
   duplicates) at corpus table counts, including above the
   linear-search threshold.

The full-82-query sweep lives in ``experiments/run_optimizer_loop.py
--strategies native,ues,dp,pgdp,tonic --workload job`` and persists to
``experiments/results/job_strategy_matrix.parquet``.
"""

from __future__ import annotations

import glob
import os

import pytest

from postbound_spark.experiments import LINEAR_SEARCH_ABOVE, run_optimizer_loop

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "workloads",
    "fixtures",
    "job",
)

#: spans the corpus's table-count range: 5 (1a), 8 (8a), 11 (22a — above
#: the bushy threshold), 14 w/ six self-join pairs (33a), 17 (29a)
MATRIX_SLICE = ("1a", "8a", "22a", "33a", "29a")

STRATEGIES = ("native", "ues", "dp", "pgdp", "tonic")


def _corpus() -> dict[str, str]:
    out = {}
    for label in MATRIX_SLICE:
        with open(os.path.join(FIXTURE_DIR, f"{label}.sql")) as fh:
            out[label] = fh.read().strip().rstrip(";")
    return out


@pytest.fixture(scope="module")
def matrix(imdb_engines, tmp_path_factory):
    spark, _con = imdb_engines
    from postbound_spark.sources.imdb_fixture import IMDB_TABLES

    base = {t: spark.table(t) for t in IMDB_TABLES}
    trie_path = str(tmp_path_factory.mktemp("qeps") / "trie.json")
    frame = run_optimizer_loop(
        spark, _corpus(), base, strategies=STRATEGIES, trie_path=trie_path
    )
    return frame, trie_path


def test_every_query_runs_under_every_strategy(matrix):
    frame, _ = matrix
    assert len(frame) == len(MATRIX_SLICE) * len(STRATEGIES)
    per_query = frame.groupby("label").strategy.nunique()
    assert (per_query == len(STRATEGIES)).all()


def test_results_are_strategy_invariant(matrix):
    """A join order or a physical-operator hint must never change the
    answer — the correctness gate of the whole enforcement design."""
    frame, _ = matrix
    fingerprints = frame.groupby("label").result_fingerprint.nunique()
    assert (fingerprints == 1).all(), fingerprints.to_dict()


def test_forced_orders_cover_all_tables(matrix):
    frame, _ = matrix
    forced = frame[frame.strategy.isin(("ues", "dp", "pgdp", "tonic"))]
    assert (forced.join_order != "").all()
    for _, row in forced.iterrows():
        order = row.join_order.split()
        assert len(order) == len(set(order)), f"{row.label}/{row.strategy}"


def test_dp_handles_above_linear_threshold(matrix):
    """29a (17 tables) and 33a (14) sit above LINEAR_SEARCH_ABOVE — the
    bitmask linear mode must have planned them, not errored or hung."""
    frame, _ = matrix
    big = frame[(frame.label.isin(("29a", "33a"))) & (frame.strategy == "dp")]
    assert len(big) == 2
    assert (big.join_order.str.split().str.len() >= LINEAR_SEARCH_ABOVE).all()


def test_tonic_trie_round_trips(matrix):
    """The replay path serialized the trie (trie_path forces save→load per
    replay); the persisted file must reload to the same recommendations."""
    from postbound_spark.optimizer.tonic import TonicOperatorSelection

    frame, trie_path = matrix
    assert os.path.exists(trie_path)
    trie = TonicOperatorSelection.load(trie_path)
    again = TonicOperatorSelection.load(trie_path)
    assert trie.root.to_dict() == again.root.to_dict()
    assert trie.root.children, "trained trie must not be empty"
    # tonic rows exist and executed (the replay actually ran)
    tonic_rows = frame[frame.strategy == "tonic"]
    assert len(tonic_rows) == len(MATRIX_SLICE)
    assert (tonic_rows.result_rows >= 0).all()


def test_tonic_optimization_is_cheap(matrix):
    """The point of learned operator selection: replay costs microseconds
    to milliseconds, not an enumeration — TONIC's per-query optimization
    time must be well under every DP strategy's."""
    frame, _ = matrix
    by = frame.groupby("strategy").optimization_time.mean()
    assert by["tonic"] < by["dp"]
    assert by["tonic"] < by["pgdp"]


def test_filter_aware_tonic_keys_carry_fingerprints(imdb_engines, tmp_path):
    """run_optimizer_loop(tonic_filter_aware=True): the persisted trie
    keys base tables by (name, filter fingerprint) — JOB 1a filters
    company_type/info_type/title, so bracketed keys must appear — and
    the filter-aware replay still returns native-identical results."""
    spark, _con = imdb_engines
    from postbound_spark.optimizer.tonic import TonicOperatorSelection
    from postbound_spark.sources.imdb_fixture import IMDB_TABLES

    base = {t: spark.table(t) for t in IMDB_TABLES}
    trie_path = str(tmp_path / "fa_trie.json")
    frame = run_optimizer_loop(
        spark,
        {"1a": _corpus()["1a"]},
        base,
        strategies=("native", "ues", "tonic"),
        trie_path=trie_path,
        tonic_filter_aware=True,
    )
    assert frame.groupby("label").result_fingerprint.nunique().eq(1).all()
    trie = TonicOperatorSelection.load(trie_path)
    assert trie.filter_aware

    def keys(node):
        for name, child in node.children.items():
            yield name
            yield from keys(child)

    all_keys = list(keys(trie.root))
    assert any("[" in k for k in all_keys), all_keys


def test_tonic_explore_fills_unknown_cells(imdb_engines):
    """Execution-backed exploration (ref explore_costs opt/tonic.py:1391):
    sampled operator combinations execute with identical results, the
    trie's unknown cells along the explored order are gone afterwards,
    and every node holds measured costs for every candidate operator."""
    from postbound_spark.experiments import tonic_explore
    from postbound_spark.optimizer.tonic import (
        DEFAULT_CANDIDATES,
        TonicOperatorSelection,
    )
    from postbound_spark.optimizer.ues import UESJoinOrderOptimizer
    from postbound_spark.plans.parser import parse_query, to_query_spec
    from postbound_spark.sources.imdb_fixture import IMDB_TABLES

    spark, _con = imdb_engines
    base = {t: spark.table(t) for t in IMDB_TABLES}
    sql = _corpus()["1a"]
    tonic = TonicOperatorSelection()

    frame = tonic_explore(
        spark, {"1a": sql}, base, tonic, max_combinations=6, seed=3
    )
    assert len(frame) == 6
    assert frame.result_fingerprint.nunique() == 1  # answers never change
    assert frame.combination.nunique() == 6  # sampled without replacement

    from postbound_spark.experiments import _prepared_tables

    parsed = parse_query(sql)
    tables = _prepared_tables(parsed, base)
    order = UESJoinOrderOptimizer(spark).optimize_join_order(
        to_query_spec(parsed), tables
    )
    # with 4 joins and 6 sampled combos not every (node, operator) cell is
    # necessarily hit, but the recorded cells must be real and the
    # detection must agree with what was filed
    unknown = tonic.unknown_costs(order, candidates=DEFAULT_CANDIDATES)
    filed = sum(
        len(DEFAULT_CANDIDATES) - len(missing) for missing in unknown.values()
    )
    assert filed > 0 or not unknown
    # a second, exhaustive-enough exploration closes every cell
    tonic_explore(
        spark, {"1a": sql}, base, tonic, max_combinations=40, seed=4
    )
    assert tonic.unknown_costs(order, candidates=DEFAULT_CANDIDATES) == {}


def test_intermediate_cardinalities_experiment(imdb_engines):
    """The intermediate-cardinalities ground-truth dump (ref
    examples/experiment-intermediate-cardinalities.py): join-connected
    subsets only, identical fragments executed once and fanned back to
    every containing query, every cardinality equal to the fragment's
    direct COUNT(*) on DuckDB, and the dump replays through
    PreComputedCardinalities."""
    import warnings as _warnings

    from postbound_spark.experiments import (
        intermediate_cardinalities,
        precomputed_from_frame,
    )
    from postbound_spark.plans.parser import parse_query, to_query_spec

    spark, con = imdb_engines
    sql = _corpus()["1a"]
    frame = intermediate_cardinalities(
        spark, {"1a": sql, "1a_again": sql}
    )
    # fragment dedup across queries: two identical queries, every
    # fragment executed once
    assert frame.attrs["n_unique_fragments"] * 2 == len(frame)
    assert (frame.groupby("label").size().nunique()) == 1
    # ground truth: each fragment's cardinality is its COUNT(*) — checked
    # on the second engine
    for row in frame[frame.label == "1a"].itertuples():
        want = con.execute(row.fragment_sql).fetchone()[0]
        assert row.cardinality == float(want), row.tables
    # replay side: the dump feeds PreComputedCardinalities
    est = precomputed_from_frame(frame, "1a")
    spec = to_query_spec(parse_query(sql))
    top = frozenset(spec.tables)
    full_row = frame[(frame.label == "1a") & (frame.n_tables == len(spec.tables))]
    assert est.estimate_cardinality(spec, top, {}) == float(
        full_row.cardinality.iloc[0]
    )
    # the size cap is loud, never silent
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        capped = intermediate_cardinalities(spark, {"1a": sql}, max_tables=2)
    assert capped.n_tables.max() == 2
    assert any("skipped" in str(w.message) for w in caught)


def test_optimizer_loop_skips_unparseable_and_set_queries(imdb_engines):
    """on_error='skip' covers the PARSE too (review regression: an
    unparseable corpus query used to abort the whole sweep and discard
    every prior result), and a set-operation query (no single join
    graph) skips the same way."""
    import warnings as _warnings

    from postbound_spark.sources.imdb_fixture import IMDB_TABLES

    spark, _con = imdb_engines
    base = {t: spark.table(t) for t in IMDB_TABLES}
    corpus = {
        "good": _corpus()["1a"],
        "bad_syntax": "SELEKT nope FROM nowhere",
        "set_query": "SELECT kind FROM kind_type UNION ALL SELECT kind FROM kind_type",
    }
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        frame = run_optimizer_loop(
            spark, corpus, base, strategies=("native",), on_error="skip"
        )
    assert set(frame.label) == {"good"}
    skipped = [str(w.message) for w in caught if "extraction failed" in str(w.message)]
    assert any("bad_syntax" in m for m in skipped)
    assert any("set_query" in m for m in skipped)
