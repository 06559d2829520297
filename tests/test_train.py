"""Training-data management (ref train/_train.py): spec contracts,
dataset shaping/merging/persistence, the repository, and the Spark-side
sample generators that feed learned-optimizer pipelines from executed
plans."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from postbound_spark.experiments import imdb_shaped_frames, register_frames
from postbound_spark.train import (
    SpecViolations,
    TrainingData,
    TrainingDataRepository,
    TrainingSpec,
    collect_cardinality_samples,
    collect_query_samples,
)


# ---------------------------------------------------------------------------
# TrainingSpec
# ---------------------------------------------------------------------------


def test_spec_dedupes_preserving_order():
    spec = TrainingSpec("query", "runtime_ms", "query", ["cardinality"])
    assert spec.features == ("query", "runtime_ms", "cardinality")


def test_spec_satisfies_reports_missing():
    provider = TrainingSpec("query", "runtime_ms")
    required = TrainingSpec("query", "cardinality")
    violations = provider.satisfies(required)
    assert isinstance(violations, SpecViolations)
    assert violations.contains_violations()
    assert not violations  # truthiness == "satisfied"
    assert violations.missing_features == ("cardinality",)
    assert bool(provider.satisfies(TrainingSpec("query")))


def test_spec_equality_ignores_order():
    assert TrainingSpec("a", "b") == TrainingSpec("b", "a")
    assert hash(TrainingSpec("a", "b")) == hash(TrainingSpec("b", "a"))


# ---------------------------------------------------------------------------
# TrainingData
# ---------------------------------------------------------------------------


@pytest.fixture
def toy_data() -> TrainingData:
    return TrainingData.from_df(
        pd.DataFrame(
            {
                "query": ["SELECT 1", "SELECT 2"],
                "runtime_ms": [1.5, 2.5],
                "cardinality": [1, 1],
            }
        )
    )


def test_from_df_infers_spec_from_columns(toy_data):
    assert toy_data.spec == TrainingSpec("query", "runtime_ms", "cardinality")
    assert toy_data.provides("runtime_ms")
    assert not toy_data.provides("query_plan")


def test_feature_map_absorbs_renamed_columns():
    raw = pd.DataFrame({"sql_text": ["SELECT 1"], "ms": [3.0]})
    data = TrainingData(
        raw, feature_map={"query": "sql_text", "runtime_ms": "ms"}
    )
    df = data.as_df()
    assert list(df.columns) == ["query", "runtime_ms"]
    assert df.iloc[0]["query"] == "SELECT 1"


def test_feature_map_rejects_absent_column():
    with pytest.raises(ValueError, match="absent"):
        TrainingData(pd.DataFrame({"a": [1]}), feature_map={"query": "b"})


def test_conform_to_projects_and_orders(toy_data):
    shaped = toy_data.conform_to(TrainingSpec("cardinality", "query"))
    assert list(shaped.as_df().columns) == ["cardinality", "query"]
    with pytest.raises(ValueError, match="lacks"):
        toy_data.conform_to(TrainingSpec("query_plan"))


def test_merge_concatenates_conformed(toy_data):
    other = TrainingData(
        pd.DataFrame(
            {"q": ["SELECT 3"], "runtime_ms": [9.0], "cardinality": [4],
             "extra": ["x"]}
        ),
        feature_map={
            "query": "q",
            "runtime_ms": "runtime_ms",
            "cardinality": "cardinality",
            "extra": "extra",
        },
    )
    merged = toy_data.merge_with(other)
    assert len(merged) == 3
    # extra feature is dropped: the merge conforms to toy_data's spec
    assert merged.spec == toy_data.spec
    assert merged[2][0] == "SELECT 3"


def test_parquet_roundtrip_is_self_describing(toy_data, tmp_path):
    path = str(tmp_path / "samples.parquet")
    toy_data.to_parquet(path)
    restored = TrainingData.from_parquet(path)
    assert restored.spec == toy_data.spec
    pd.testing.assert_frame_equal(
        restored.as_df(), toy_data.as_df(), check_dtype=False
    )


def test_container_protocol(toy_data):
    assert len(toy_data) == 2
    assert toy_data[0] == ["SELECT 1", 1.5, 1]
    assert [row[0] for row in toy_data] == ["SELECT 1", "SELECT 2"]


# ---------------------------------------------------------------------------
# TrainingDataRepository
# ---------------------------------------------------------------------------


def test_repository_retrieves_by_spec(toy_data):
    plan_only = TrainingData.from_df(
        pd.DataFrame({"query": ["SELECT 9"], "query_plan": ["scan"]})
    )
    repo = TrainingDataRepository().register(toy_data).register(plan_only)

    want_runtime = TrainingSpec("query", "runtime_ms")
    assert repo.retrieve_first(want_runtime).spec == want_runtime
    assert repo.retrieve_first(TrainingSpec("nope")) is None
    assert len(repo.retrieve_all(TrainingSpec("query"))) == 2

    merged = repo.retrieve_merged(TrainingSpec("query"))
    assert len(merged) == 3
    assert merged.spec == TrainingSpec("query")
    assert repo.retrieve_merged(TrainingSpec("nope")) is None


# ---------------------------------------------------------------------------
# Spark sample generators
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def imdb_tables(spark):
    return register_frames(spark, imdb_shaped_frames())


_CORPUS = {
    "two_way": (
        "SELECT COUNT(*) FROM title t, movie_companies mc "
        "WHERE t.id = mc.movie_id AND t.production_year > 2000"
    ),
    "three_way": (
        "SELECT COUNT(*) FROM title t, cast_info ci, movie_keyword mk "
        "WHERE t.id = ci.movie_id AND t.id = mk.movie_id AND t.kind_id = 1"
    ),
}


def test_collect_query_samples_features(spark, imdb_tables):
    data = collect_query_samples(spark, _CORPUS, imdb_tables)
    assert bool(
        data.satisfies(
            TrainingSpec(
                "query", "runtime_ms", "cardinality", "estimated_cost", "query_plan"
            )
        )
    )
    df = data.as_df().set_index("label")
    assert len(df) == 2
    # COUNT(*) queries: exactly one result row each
    assert (df.cardinality == 1).all()
    assert (df.runtime_ms > 0).all()
    assert (df.estimated_cost > 0).all()
    assert df.query_plan.str.contains("Join").all()


def test_collect_cardinality_samples_pairs_estimates_with_actuals(
    spark, imdb_tables
):
    data = collect_cardinality_samples(spark, _CORPUS, imdb_tables)
    df = data.as_df()
    # one sample per join: 1 (two_way) + 2 (three_way)
    assert len(df) == 3
    assert set(df.label) == {"two_way", "three_way"}
    ok = df.dropna(subset=["qerror"])
    assert not ok.empty
    assert (ok.qerror >= 1.0).all()
    assert (ok.cardinality >= 0).all()
    # the generated dataset feeds straight into the repository machinery
    repo = TrainingDataRepository().register(data)
    got = repo.retrieve_first(TrainingSpec("query", "cardinality"))
    assert got is not None and len(got) == 3


def test_generator_output_merges_across_corpora(spark, imdb_tables, tmp_path):
    """The reference's workflow: persist per-corpus sample files, then
    merge them under one requirements spec for training."""
    a = collect_query_samples(spark, {"q1": _CORPUS["two_way"]}, imdb_tables)
    b = collect_query_samples(spark, {"q2": _CORPUS["three_way"]}, imdb_tables)
    pa, pb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    a.to_parquet(pa)
    b.to_parquet(pb)
    spec = TrainingSpec("query", "runtime_ms", "cardinality")
    merged = TrainingData.merge(
        [TrainingData.from_parquet(pa), TrainingData.from_parquet(pb)],
        according_to=spec,
    )
    assert len(merged) == 2 and merged.spec == spec
    assert not math.isnan(merged.as_df().runtime_ms.sum())


# ---------------------------------------------------------------------------
# spec algebra properties
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_features = st.lists(
    st.sampled_from(["query", "runtime_ms", "cardinality", "query_plan", "cost", "custom_x"]),
    min_size=0,
    max_size=6,
)


@settings(max_examples=50, deadline=None)
@given(_features)
def test_spec_satisfies_is_reflexive(feats):
    spec = TrainingSpec(feats)
    assert bool(spec.satisfies(spec))


@settings(max_examples=50, deadline=None)
@given(_features, _features)
def test_spec_satisfies_iff_subset(a, b):
    provider, required = TrainingSpec(a), TrainingSpec(b)
    assert bool(provider.satisfies(required)) == (
        set(required.features) <= set(provider.features)
    )


@settings(max_examples=50, deadline=None)
@given(_features, _features)
def test_conform_is_idempotent_and_exact(a, b):
    provider = TrainingSpec(a + b)  # guarantees b ⊆ provider
    df = pd.DataFrame({f: [1] for f in provider.features})
    data = TrainingData.from_df(df)
    target = TrainingSpec(b)
    shaped = data.conform_to(target)
    assert shaped.spec == target
    assert shaped.conform_to(target).spec == target
    assert list(shaped.as_df().columns) == list(target.features)
