"""Incremental MinHash-LSH near-dup == batch near-dup: folding the corpus
in as micro-batches (any arrival order) must surface exactly the batch
operator's verified pair set, each pair exactly once."""

from __future__ import annotations

import pytest

from postbound_spark.queries import load_all
from postbound_spark.streaming.neardup import run_near_dup_stream
from tests.test_streaming_curation import _chunked_input


def _pair_set(rows):
    return {(r.doc_a, r.doc_b, r.jaccard) for r in rows}


@pytest.mark.parametrize("reverse", [False, True], ids=["in-order", "reversed"])
def test_streaming_neardup_matches_batch(spark, sf_small, tmp_path, reverse):
    batch = load_all()["dedup_minhash_lsh"].builder(spark, sf_small)
    want = _pair_set(batch.collect())
    from postbound_spark.queries.pipeline import release_stage_caches

    release_stage_caches()
    assert want, "fixture has no near-dup pairs — test would be vacuous"

    flat = _chunked_input(
        spark, sf_small, str(tmp_path / "in"), n_chunks=3, reverse=reverse
    )
    sink = run_near_dup_stream(spark, flat, str(tmp_path / "state"))
    got_rows = sink.pairs().collect()
    assert _pair_set(got_rows) == want
    # exactly once: the PRE-distinct store holds each pair in exactly one
    # batch directory (pairs() applies distinct, so count it raw)
    assert sink._store("pairs").count() == len(want)


def test_streaming_neardup_replay_is_idempotent(spark, sf_small, tmp_path):
    """Re-processing an already-indexed batch overwrites its own state
    shards and re-derives the same pairs — the checkpoint-replay path."""
    flat = _chunked_input(spark, sf_small, str(tmp_path / "in"), n_chunks=2)
    state = str(tmp_path / "state")
    sink = run_near_dup_stream(spark, flat, state)
    want = _pair_set(sink.pairs().collect())

    replay = spark.read.parquet(f"{flat}/01.parquet")
    sink.process_batch(replay, batch_id=1)  # same id the stream used
    assert _pair_set(sink.pairs().collect()) == want


def test_pairs_before_any_batch_raises(spark, tmp_path):
    from postbound_spark.streaming.neardup import StreamingNearDup

    with pytest.raises(FileNotFoundError):
        StreamingNearDup(spark, str(tmp_path / "s")).pairs()


def _label_set(rows):
    return {(r.doc_id, r.component) for r in rows}


@pytest.mark.parametrize("reverse", [False, True], ids=["in-order", "reversed"])
def test_streaming_components_match_batch(spark, sf_small, tmp_path, reverse):
    """Round-9: incremental connected components == batch
    dedup_components — folding each micro-batch's new verified pairs into
    the persisted labeling (representative contraction + one broadcast
    relabel) lands on the identical min-doc_id labeling regardless of
    arrival order. Completes 'every dedup stage has an incremental
    form'."""
    from postbound_spark.streaming.components import fold_near_dup_components

    batch = load_all()["dedup_components"].builder(spark, sf_small)
    want = _label_set(batch.collect())
    from postbound_spark.queries.pipeline import release_stage_caches

    release_stage_caches()
    assert want, "fixture has no components — test would be vacuous"

    flat = _chunked_input(
        spark, sf_small, str(tmp_path / "in"), n_chunks=3, reverse=reverse
    )
    sink = run_near_dup_stream(spark, flat, str(tmp_path / "state"))
    cc = fold_near_dup_components(
        spark, str(tmp_path / "state"), str(tmp_path / "cc")
    )
    assert _label_set(cc.labels().collect()) == want


def test_streaming_components_replay_is_idempotent(spark, sf_small, tmp_path):
    """Replaying a batch fold reads the snapshot BELOW its id and rewrites
    its own deterministically — labels unchanged."""
    from postbound_spark.streaming.components import (
        StreamingComponents,
        fold_near_dup_components,
    )

    flat = _chunked_input(spark, sf_small, str(tmp_path / "in"), n_chunks=2)
    nd_state = str(tmp_path / "state")
    sink = run_near_dup_stream(spark, flat, nd_state)
    cc = fold_near_dup_components(spark, nd_state, str(tmp_path / "cc"))
    want = _label_set(cc.labels().collect())

    last = sorted(
        int(p.rsplit("=", 1)[1])
        for p in __import__("glob").glob(f"{nd_state}/pairs/batch=*")
    )[-1]
    replayed = spark.read.parquet(f"{nd_state}/pairs/batch={last:06d}")
    cc.process_pairs(replayed, batch_id=last)
    assert _label_set(cc.labels().collect()) == want

    with pytest.raises(FileNotFoundError):
        StreamingComponents(spark, str(tmp_path / "empty")).labels()
