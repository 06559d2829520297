"""Learned cardinality corrector — unit gates for the ML loop's model
(optimizer/learned.py; ref examples/example-05-machine-learning.py,
opt/_stages.py:592)."""

from __future__ import annotations

import pytest

from postbound_spark.optimizer.learned import (
    CardCorrector,
    LearnedCardinalityEstimator,
    fit_card_corrector,
)


def _biased_samples(arity, bias, n=10):
    # base estimator systematically off by `bias`×
    return [
        (arity, 10.0**x, 10.0 ** (x + 3), 50.0, 10.0**x, arity - 1,
         bias * 10.0**x)
        for x in range(1, n + 1)
    ]


class TestFit:
    def test_learns_systematic_bias(self):
        cor = fit_card_corrector(_biased_samples(2, 100.0), min_arity_samples=5)
        corrected = cor.correct(2, 1e4, 1e7, 50.0, 1e4, 1)
        assert corrected == pytest.approx(1e6, rel=0.5)

    def test_identity_prior_with_unbiased_data(self):
        cor = fit_card_corrector(_biased_samples(3, 1.0), min_arity_samples=5)
        corrected = cor.correct(3, 1e4, 1e7, 50.0, 1e4, 2)
        assert corrected == pytest.approx(1e4, rel=0.3)

    def test_zero_actuals_dropped_not_fatal(self):
        samples = _biased_samples(2, 10.0) + [(2, 100.0, 1e4, 1.0, 100.0, 1, 0.0)]
        cor = fit_card_corrector(samples, min_arity_samples=5)
        assert cor.pooled[1] == 10  # the zero row contributed nothing

    def test_no_usable_rows_raises(self):
        with pytest.raises(ValueError, match="no usable"):
            fit_card_corrector([(2, 0.0, 1.0, 1.0, 1.0, 1, 5.0)])


class TestCorrect:
    def test_zero_estimate_propagates(self):
        cor = fit_card_corrector(_biased_samples(2, 10.0), min_arity_samples=5)
        assert cor.correct(2, 0.0, 1.0, 0.0, 0.0, 1) == 0.0

    def test_clamped_to_cross_product(self):
        cor = fit_card_corrector(_biased_samples(2, 1e6), min_arity_samples=5)
        assert cor.correct(2, 1e4, 1e5, 50.0, 1e4, 1) <= 1e5

    def test_beyond_training_arity_returns_base(self):
        """The support bound: a linear model extrapolated past its
        deepest trained arity can be wrong by orders of magnitude —
        outside support the corrector must trust the base estimate
        (the round-7 fix for the injector sweep's deep intermediates)."""
        cor = fit_card_corrector(_biased_samples(2, 100.0), min_arity_samples=5)
        assert cor.max_arity == 2
        assert cor.correct(9, 1234.5, 1e30, 1.0, 1e10, 8) == 1234.5

    def test_pooled_fallback_within_support(self):
        samples = _biased_samples(2, 10.0) + _biased_samples(4, 10.0)
        cor = fit_card_corrector(samples, min_arity_samples=5)
        # arity 3 never trained but inside [2, 4]: pooled model applies
        assert cor.correct(3, 1e3, 1e9, 10.0, 1e3, 2) != 1e3


class TestSerialization:
    def test_json_roundtrip_bitwise(self):
        cor = fit_card_corrector(
            _biased_samples(2, 100.0) + _biased_samples(3, 0.01),
            min_arity_samples=5,
        )
        rt = CardCorrector.from_json(cor.to_json())
        args = (2, 777.0, 1e6, 10.0, 777.0, 1)
        assert rt.correct(*args) == cor.correct(*args)
        assert rt.max_arity == cor.max_arity

    def test_legacy_artifact_without_bound_loads(self):
        import json

        cor = fit_card_corrector(_biased_samples(2, 10.0), min_arity_samples=5)
        raw = json.loads(cor.to_json())
        del raw["max_arity"]
        rt = CardCorrector.from_json(json.dumps(raw))
        assert rt.max_arity is None


class TestEstimatorStage:
    def test_wraps_stats_estimator(self, spark, sf_small):
        from postbound_spark.catalog import load_tables
        from postbound_spark.optimizer import QuerySpec, pk_fk_edges_for
        from postbound_spark.optimizer.cardinalities import (
            StatsCardinalityEstimator,
        )

        tables = load_tables(spark, sf_small, ["nation", "region"])
        spec = QuerySpec(
            ("nation", "region"), tuple(pk_fk_edges_for(["nation", "region"]))
        )
        stats = StatsCardinalityEstimator()
        cor = fit_card_corrector(_biased_samples(2, 4.0), min_arity_samples=5)
        learned = LearnedCardinalityEstimator(cor, stats)
        base_est = stats.estimate_cardinality(
            spec, frozenset({"nation", "region"}), tables
        )
        learned_est = learned.estimate_cardinality(
            spec, frozenset({"nation", "region"}), tables
        )
        assert learned_est > base_est  # 4x-bias correction raises it
        # base tables pass through uncorrected (statistics are exact)
        assert learned.estimate_cardinality(
            spec, frozenset({"nation"}), tables
        ) == stats.estimate_cardinality(spec, frozenset({"nation"}), tables)
