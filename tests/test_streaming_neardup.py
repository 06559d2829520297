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
