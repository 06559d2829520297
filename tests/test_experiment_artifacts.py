"""Committed experiment artifacts must track the committed corpora.

Round-6 lesson: the strategy matrix was committed while the JOB fixture
had 82 queries, then the corpus grew to 113 and the parquet silently
went stale. These gates recompute each artifact's expected label set
from the CURRENT fixture directories (and, for the true-card
experiment, from the same parse-level self-join rule the runner
applies), so any future corpus growth fails the suite until the
experiment is re-run.

Pure pandas + parser — no Spark session.
"""

from __future__ import annotations

import glob
import json
import os

import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(ROOT, "experiments", "results")
JOB_DIR = os.path.join(ROOT, "workloads", "fixtures", "job")
STATS_DIR = os.path.join(ROOT, "workloads", "fixtures", "stats")

STRATEGIES = {"native", "ues", "dp", "pgdp", "tonic"}


def _labels(fixture_dir: str) -> set[str]:
    return {
        os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(os.path.join(fixture_dir, "*.sql"))
    }


def _invariant(df: pd.DataFrame) -> None:
    fingerprints = df.groupby("label").result_fingerprint.nunique()
    broken = fingerprints[fingerprints > 1]
    assert broken.empty, f"fingerprint drift: {sorted(broken.index)}"


def test_job_strategy_matrix_covers_full_corpus():
    df = pd.read_parquet(os.path.join(RESULTS, "job_strategy_matrix.parquet"))
    assert set(df.label) == _labels(JOB_DIR)
    per_query = df.groupby("label").strategy.agg(set)
    assert (per_query == STRATEGIES).all(), "missing strategy rows"
    _invariant(df)


def test_stats_strategy_matrix_covers_full_corpus():
    df = pd.read_parquet(
        os.path.join(RESULTS, "stats_strategy_matrix.parquet")
    )
    assert set(df.label) == _labels(STATS_DIR)
    per_query = df.groupby("label").strategy.agg(set)
    assert (per_query == STRATEGIES).all(), "missing strategy rows"
    _invariant(df)


def _self_join_free_job_labels() -> set[str]:
    """The true-card runner's own skip rule (experiments.py:
    true_card_runtime_experiment): a query whose FROM list repeats a
    base table is excluded because occurrence→alias mapping is
    ambiguous; everything else must be covered."""
    from postbound_spark.plans.parser import parse_query

    keep = set()
    for label in _labels(JOB_DIR):
        with open(os.path.join(JOB_DIR, f"{label}.sql")) as fh:
            sql = fh.read().strip().rstrip(";")
        names = [t.full_name for t in parse_query(sql).from_tables]
        if len(set(names)) == len(names):
            keep.add(label)
    return keep


def test_true_card_covers_self_join_free_corpus():
    df = pd.read_parquet(
        os.path.join(RESULTS, "job_true_card_runtimes.parquet")
    )
    assert set(df.label) == _self_join_free_job_labels()
    modes = df.groupby("label")["mode"].agg(set)
    assert (modes == {"native", "truecards", "distorted"}).all()
    _invariant(df)


def test_distortion_sweep_covers_full_corpus():
    df = pd.read_parquet(
        os.path.join(RESULTS, "job_distortion_sweep.parquet")
    )
    assert set(df.label) == _labels(JOB_DIR)
    factors = df.groupby("label").distortion_factor.nunique()
    assert (factors == 5).all()


def test_filter_aware_tonic_artifact_covers_full_corpus():
    df = pd.read_parquet(
        os.path.join(RESULTS, "job_tonic_filter_aware.parquet")
    )
    assert set(df.label) == _labels(JOB_DIR)
    per_query = df.groupby("label").strategy.agg(set)
    assert (per_query == {"ues", "tonic"}).all()
    _invariant(df)


def test_filter_aware_trie_artifact_has_fingerprinted_keys():
    import json

    with open(os.path.join(RESULTS, "job_qeps_trie_filter_aware.json")) as fh:
        trie = json.load(fh)
    assert trie["filter_aware"] is True

    def keys(node):
        for name, child in node["children"].items():
            yield name
            yield from keys(child)

    all_keys = list(keys(trie["root"]))
    bracketed = [k for k in all_keys if "[" in k]
    # JOB filters most base tables; a trie without fingerprints means the
    # run silently fell back to plain mode
    assert len(bracketed) > len(all_keys) // 4, (
        f"{len(bracketed)}/{len(all_keys)} fingerprinted keys"
    )


def test_intermediate_cards_cover_joblight():
    """The intermediate-cardinality ground-truth dump (ref
    examples/experiment-intermediate-cardinalities.py) covers every
    JOB-light query, including each query's full join as the largest
    fragment."""
    from postbound_spark.plans.parser import parse_query
    from postbound_spark.workloads import job_light

    df = pd.read_parquet(
        os.path.join(RESULTS, "joblight_intermediate_cards.parquet")
    )
    corpus = dict(job_light())
    assert set(df.label) == set(corpus)
    top = df.groupby("label").n_tables.max()
    for label, sql in corpus.items():
        n_from = len(parse_query(sql.strip().rstrip(";")).from_tables)
        assert top[label] == n_from, label
    assert (df.cardinality >= 0).all()


def test_runtime_variation_covers_the_bench_headline():
    """The variance-characterization artifact must track bench.py's
    HEADLINE set — a headline change without a re-run leaves spread
    statistics for queries the bench no longer times."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    df = pd.read_parquet(
        os.path.join(RESULTS, "headline_runtime_variation.parquet")
    )
    assert set(df.label) == set(bench.HEADLINE)
    assert {"warm", "cold"} >= set(df.phase.unique())


def test_tonic_explore_artifact_is_invariant_and_runtime_tagged():
    """The committed exploration run: every sampled operator combination
    returned the same answer per query, the trained trie is tagged with
    the runtime cost unit (it must never merge into a cardinality-
    trained trie), and the per-query runtime spread across combinations
    is the signal exploration exists to measure."""
    import json

    df = pd.read_parquet(
        os.path.join(RESULTS, "job_tonic_explore.parquet")
    )
    assert df.label.nunique() == 10 and len(df) == 80
    _invariant(df)
    spread = df.groupby("label").exec_time.agg(["min", "max"])
    assert (spread["max"] > spread["min"]).all()
    with open(os.path.join(RESULTS, "job_qeps_trie_explored.json")) as fh:
        trie = json.load(fh)
    assert trie["cost_unit"] == "runtime"


def test_tonic_explore_replay_artifact_equal_noise_floors():
    """The min-of-reps exploration+replay run (run_tonic_explore.py,
    reps=3): the committed artifact resolves the round-6 characterization
    caveat — at EQUAL noise floors the trained trie's replay lands inside
    the explored spread on every query and within a few percent of the
    per-query explored minimum on average (sometimes below it, which is
    the discrimination limit: warm fixture-scale runtimes differ by
    single-digit milliseconds between operator combinations, so the
    residual gap is host noise, not recommender error). Answers remain
    invariant across all explored combinations AND the replay."""
    df = pd.read_parquet(
        os.path.join(RESULTS, "job_tonic_explore_reps.parquet")
    )
    explore = df[df.phase == "explore"]
    replay = df[df.phase == "replay"]
    assert len(explore) == 80 and len(replay) == 10
    assert (df.groupby("label").result_fingerprint.nunique() == 1).all()
    assert replay.within_spread.all()
    assert replay.gap_to_min.mean() < 1.15
    # replay was produced by a trie recommendation at every join
    assert not replay.combination.str.contains(r"\?").any()


def test_tonic_explore_replay_svgs_render_from_artifact():
    """The two committed figures regenerate from the committed parquet —
    the artifact and its plots cannot drift apart."""
    from postbound_spark.vis_plots import qerror_box_svg, runtime_bars_svg

    df = pd.read_parquet(
        os.path.join(RESULTS, "job_tonic_explore_reps.parquet")
    )
    bars = runtime_bars_svg(
        df, time_col="exec_time", label_col="label", group_col="phase",
        title="QEP-S exploration vs trie replay (min-of-3 per execution)",
    )
    box = qerror_box_svg(
        df[df.phase == "explore"], value_col="exec_time", group_col="label",
        title="explored runtime spread per query (8 combos, min-of-3 each)",
    )
    assert bars.startswith(b"<svg") and box.startswith(b"<svg")
    for name, fresh in (
        ("job_tonic_explore_reps_bars.svg", bars),
        ("job_tonic_explore_reps_spread.svg", box),
    ):
        with open(os.path.join(RESULTS, name), "rb") as fh:
            assert fh.read() == fresh, f"{name} drifted from its parquet"


def test_jobcomplex_strategy_matrix_covers_corpus():
    """The third corpus stress of the DP/pgdp/TONIC stages: the 22-query
    aggregate-bearing JOB-complex fixture (GROUP BY/HAVING/COUNT
    DISTINCT/EXISTS/CASE/LEFT JOIN) × 5 strategies. The one UNION ALL
    query is legitimately absent — a set-operation query has no single
    join graph to force (to_query_spec rejects it with
    UnsupportedSqlError; the runner records the skip). Results identical
    across strategies for every covered query."""
    df = pd.read_parquet(
        os.path.join(RESULTS, "jobcomplex_strategy_matrix.parquet")
    )
    jc_dir = os.path.join(ROOT, "workloads", "fixtures", "job-complex")
    covered = set(df.label)
    all_labels = _labels(jc_dir)
    assert len(all_labels - covered) <= 1  # the UNION ALL query
    assert len(covered) >= 21
    per_query = df.groupby("label").strategy.agg(set)
    assert (per_query == STRATEGIES).all(), "missing strategy rows"
    _invariant(df)


# ---- round-7: the learned-cardinality loop ------------------------------


def test_job_intermediate_cards_cover_all_queries():
    """The JOB ground-truth dump (the learned estimator's training/eval
    frame) must cover every fixture query."""
    df = pd.read_parquet(
        os.path.join(RESULTS, "job_intermediate_cards_mt4.parquet")
    )
    assert set(df.label) == _labels(JOB_DIR)
    assert (df.n_tables <= 4).all()
    assert (df.cardinality >= 0).all()


def test_learned_qerror_gate_holds():
    """The committed CV artifact must still satisfy the round-7 gate:
    learned beats the statistics estimator on median q-error AND on the
    per-query maximum (the planner-relevant statistic)."""
    df = pd.read_parquet(os.path.join(RESULTS, "job_learned_qerror.parquet"))
    assert set(df.label) == _labels(JOB_DIR)
    assert df.qerr_learned.median() < df.qerr_stats.median()
    per_q = df.groupby("label")[["qerr_stats", "qerr_learned"]].max()
    assert per_q.qerr_learned.median() < per_q.qerr_stats.median()
    # the headline failure mode: catastrophic tails must be cut by >10x
    assert df.qerr_learned.quantile(0.9) * 10 < df.qerr_stats.quantile(0.9)


def test_learned_corrector_artifact_deploys():
    """The committed model must load and correct — the deployable half
    of the loop (ref opt/_stages.py:592)."""
    from postbound_spark.optimizer.learned import CardCorrector

    with open(os.path.join(RESULTS, "learned_card_corrector.json")) as fh:
        cor = CardCorrector.from_json(fh.read())
    assert cor.max_arity == 4
    assert set(cor.models) == {2, 3, 4}
    # within support the correction is live, beyond it the base passes
    assert cor.correct(3, 10.0, 1e9, 100.0, 1e4, 2) != 10.0
    assert cor.correct(9, 10.0, 1e30, 100.0, 1e4, 8) == 10.0


def test_learned_runtime_sweep_invariant():
    """All four estimator arms must agree on every result fingerprint —
    statistics (learned or not) steer plans, never answers."""
    df = pd.read_parquet(
        os.path.join(RESULTS, "job_learned_runtimes.parquet")
    )
    assert set(df["mode"]) == {"native", "stats", "learned", "truecards"}
    inv = df.groupby("label").result_fingerprint.nunique()
    assert (inv == 1).all()
    # every non-skipped query ran all four arms
    assert (df.groupby("label")["mode"].count() == 4).all()


def test_cost_constants_artifact_loads_and_orders():
    """The measured constants must load and preserve the measured family
    ordering at probe shapes (broadcast cheapest end-to-end on the
    fact⋈dim probes, sort ≈ shuffle)."""
    from postbound_spark.optimizer.costmodel import CostConstants

    cc = CostConstants.load(os.path.join(RESULTS, "cost_constants.json"))
    assert cc.out_row > 0 and cc.shuffle_row > 0
    factors = cc.pgdp_factors()
    assert set(factors) == {
        "SHUFFLE_FACTOR", "SORT_FACTOR", "BROADCAST_FACTOR",
    }
    assert all(v > 0 for v in factors.values())
    probes = pd.read_parquet(
        os.path.join(RESULTS, "cost_calibration_probes.parquet")
    )
    assert set(probes.family) == {"broadcast_hash", "shuffle_hash", "sort_merge"}
    # each probe ran all three families on identical inputs
    assert (probes.groupby("probe").family.nunique() == 3).all()


def test_calibrated_dp_sweep_invariant_and_no_worse():
    """The committed default-vs-calibrated DP sweep must stay result
    invariant and keep the round-7 acceptance: the calibrated arm picks
    plans no worse than C_out's. At fixture scale the per-query runtimes
    sit inside the measured warm rep-spread (BASELINE.md: 1.16-1.96x),
    so a STRICT <= per query is a coin flip on equal plans — the gate is
    noise-tolerant: majority-at-10%-tolerance plus a mean-ratio bound,
    with the strict comparison still required to not lose outright."""
    df = pd.read_parquet(os.path.join(RESULTS, "job_calibrated_dp.parquet"))
    assert set(df.label) == _labels(JOB_DIR)
    inv = df.groupby("label").result_fingerprint.nunique()
    assert (inv == 1).all()
    piv = df.pivot_table(
        index="label", columns="mode", values="exec_time"
    ).dropna()
    assert (piv["calibrated"] <= piv["default"] * 1.10).mean() > 0.75
    assert piv["calibrated"].mean() <= piv["default"].mean() * 1.05
    assert (piv["calibrated"] <= piv["default"]).mean() >= 0.45


def test_job_selectivity_audit_non_vacuous():
    """The committed selectivity audit (round-7: bounds the fixture's
    literal drift) must cover every query, agree across engines, and
    show zero empty predicates under fixture v2's witness bundles."""
    df = pd.read_parquet(
        os.path.join(RESULTS, "job_fixture_selectivity.parquet")
    )
    assert set(df.label) == _labels(JOB_DIR)
    assert set(df.literal_confidence) == {
        "canonical", "transcribed", "reconstructed",
    }
    assert (df.spark_rows == df.duckdb_rows).all()
    assert (df.spark_rows > 0).all()
    # all 33 a-variants carry canonical confidence
    assert (df[df.variant == "a"].literal_confidence == "canonical").all()


def test_shuffle_scaling_volume_is_linear_or_explained():
    """Shuffle-VOLUME exponents (bytes, from Spark's own stage metrics):
    every measured query must shuffle linearly (±AQE noise); the one
    documented exception is text_tfidf_topk, whose partial
    WindowGroupLimit keeps 3-per-doc-per-partition — its window input is
    bounded by the tf relation (a linear quantity), so the elevated
    exponent is a small-baseline artifact, not a pair blow-up
    (BASELINE.md §F). Queries shuffling < 1 MiB at the small scale
    (broadcast-only / sketch-space plans) legitimately have no exponent
    but must still be present with raw byte counts."""
    with open(os.path.join(RESULTS, "shuffle_scaling.json")) as fh:
        d = json.load(fh)
    assert d["factor"] == 10
    exps = d["byte_exponent"]
    assert set(exps) == set(d["small"]) == set(d["big"])
    for name, e in exps.items():
        if e is None:
            assert d["small"][name]["shuffle_write_bytes"] < (1 << 20)
            continue
        bound = 1.35 if name == "text_tfidf_topk" else 1.1
        assert e <= bound, f"{name} shuffle volume exponent {e} > {bound}"
    # the sketch is the bounded-state control: its big-scale shuffle must
    # stay metadata-sized while the corpus grew x10
    assert d["big"]["sketch_kmv_source_overlap"]["shuffle_write_bytes"] < (
        8 << 20
    )


def test_shuffle_scaling_x30_confirms_tfidf_saturation():
    """The ×30 point: with the measured df broadcast in place,
    text_tfidf_topk's byte exponent stays ≤ 1.1 (the pre-fix history —
    1.27 at ×10 from the partial-WindowGroupLimit baseline artifact plus
    the estimate-driven join flip — is narrated in BASELINE.md §F)."""
    with open(os.path.join(RESULTS, "shuffle_scaling_x30.json")) as fh:
        d = json.load(fh)
    assert d["factor"] == 30
    assert d["byte_exponent"]["text_tfidf_topk"] <= 1.1
    assert d["byte_exponent"]["flagship_regional_revenue"] <= 1.1
    # sketch state stays metadata-sized at x30
    assert d["big"]["sketch_kmv_source_overlap"]["shuffle_write_bytes"] < (
        16 << 20
    )


def test_shuffle_scaling_x100_definitive_points():
    """The ×100 shuffle-volume points after the round-7 fixes: flagship
    and tfidf byte exponents ≤ 1.05 at two orders of magnitude (tfidf's
    df-join broadcast decision is measured, so the estimate-driven
    SortMergeJoin flip is gone); both KMV tiers shuffle metadata-sized
    state; dedup's total is bounded by the linear postings exchange
    (shingle movement prefiltered to colliding docs — BASELINE.md §F)."""
    with open(os.path.join(RESULTS, "shuffle_scaling_x100.json")) as fh:
        d = json.load(fh)
    assert d["factor"] == 100
    assert d["byte_exponent"]["flagship_regional_revenue"] <= 1.05
    assert d["byte_exponent"]["text_tfidf_topk"] <= 1.05
    for q in ("sketch_kmv_source_overlap", "sketch_kmv_estimate_only"):
        assert d["big"][q]["shuffle_write_bytes"] < (48 << 20)
    # 16M postings rows x ~45 B dominate; the verify join's shingle
    # movement must stay well under the pre-fix 825 MB
    assert d["big"]["dedup_minhash_lsh"]["shuffle_write_bytes"] < (1 << 30)
