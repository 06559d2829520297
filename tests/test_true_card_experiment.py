"""The true-card runtime experiment (round-5 verdict item 2).

Pins the three properties the reference's signature experiment
(``examples/experiment-job-true-card-runtimes.py``) rests on, over a
JOB-fixture subset:

1. injection steers the PLAN, never the ANSWER — result fingerprints are
   identical across native / truecards / distorted modes;
2. true cardinalities never produce a worse broadcast census than the
   factor-distorted arm (misestimation can only kill broadcasts);
3. the distorted arm actually bites at fixture scale (some broadcast
   joins degrade to sort-merge), so property 2 is not vacuously equal.
"""

from __future__ import annotations

import os
import warnings

import pytest

from postbound_spark.experiments import true_card_runtime_experiment

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "workloads",
    "fixtures",
    "job",
)

SUBSET = ("1a", "10a", "16b")


@pytest.fixture(scope="module")
def frame(imdb_engines):
    spark, _con = imdb_engines
    from postbound_spark.sources.imdb_fixture import IMDB_TABLES

    base = {t: spark.table(t) for t in IMDB_TABLES}
    corpus = {}
    for label in SUBSET:
        with open(os.path.join(FIXTURE_DIR, f"{label}.sql")) as fh:
            corpus[label] = fh.read().strip().rstrip(";")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return true_card_runtime_experiment(
            spark, corpus, base, reps=1, distort_factor=10000.0
        )


def test_all_modes_ran(frame):
    assert sorted(frame["mode"].unique()) == ["distorted", "native", "truecards"]
    assert len(frame) == len(SUBSET) * 3
    assert (frame[frame["mode"] != "native"].n_injected_sets > 0).all()


def test_injection_is_result_invariant(frame):
    fingerprints = frame.groupby("label").result_fingerprint.nunique()
    assert (fingerprints == 1).all(), fingerprints.to_dict()


def test_true_cards_never_censused_worse_than_distorted(frame):
    """Misestimation (factor**|S| inflation) can only kill broadcasts;
    truth keeps them — per query, the truecards plan must have at least
    as many broadcast joins and at most as many sort-merge joins."""
    piv_b = frame.pivot_table(
        index="label", columns="mode", values="n_broadcast_joins"
    )
    piv_s = frame.pivot_table(
        index="label", columns="mode", values="n_sortmerge_joins"
    )
    assert (piv_b["truecards"] >= piv_b["distorted"]).all()
    assert (piv_s["truecards"] <= piv_s["distorted"]).all()


def test_distortion_actually_bites(frame):
    """The comparison above must not be vacuous: at factor 1e4 the
    distorted arm degrades at least one broadcast join to sort-merge on
    this subset (it degrades several on every query in practice)."""
    distorted = frame[frame["mode"] == "distorted"]
    assert distorted.n_sortmerge_joins.sum() > 0
