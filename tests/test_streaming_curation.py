"""Streaming keep-list == batch keep-list (VERDICT r3 item 9): the
curation composite run incrementally over chunked arrivals must converge
to exactly the batch query's result, in any arrival order."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postbound_spark.catalog import load_table
from postbound_spark.queries import load_all
from postbound_spark.streaming.curation import run_keep_list_stream


def _chunked_input(spark, sf_dir, out_dir: str, n_chunks: int, *, reverse: bool = False):
    """Split the documents fixture into n parquet files, one per future
    micro-batch. ``reverse`` flips which chunk holds the low doc_ids, so
    the dedup min-fold is exercised against arrival order."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(F.col("doc_id"), n_chunks)
    order = range(n_chunks - 1, -1, -1) if reverse else range(n_chunks)
    for i, b in enumerate(order):
        docs.filter(bucket == b).coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/chunk={i:02d}"
        )
    # flatten: move each chunk's part file up so the stream sees N files
    import glob
    import os
    import shutil

    flat = f"{out_dir}_flat"
    os.makedirs(flat, exist_ok=True)
    for i in range(n_chunks):
        (part,) = glob.glob(f"{out_dir}/chunk={i:02d}/part-*.parquet")
        shutil.copy(part, f"{flat}/{i:02d}.parquet")
    return flat


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("reverse", [False, True], ids=["in-order", "reversed"])
def test_streaming_keep_list_matches_batch(spark, sf_small, tmp_path, reverse):
    batch = load_all()["pipeline_keep_list"].builder(spark, sf_small)
    want = _rows(batch)

    flat = _chunked_input(
        spark, sf_small, str(tmp_path / "in"), n_chunks=4, reverse=reverse
    )
    sink = run_keep_list_stream(spark, flat, str(tmp_path / "state"))
    got = _rows(sink.keep_list(per_source_cap=15))
    assert got == want


def test_streaming_batch_replay_is_idempotent(spark, sf_small, tmp_path):
    """Crash-recovery property: re-processing an already-folded batch must
    not change the pool (min-per-key is idempotent)."""
    flat = _chunked_input(spark, sf_small, str(tmp_path / "in"), n_chunks=2)
    sink = run_keep_list_stream(spark, flat, str(tmp_path / "state"))
    before = _rows(sink.keep_list())
    replay = spark.read.parquet(f"{flat}/00.parquet")
    sink.process_batch(replay, batch_id=99)
    assert _rows(sink.keep_list()) == before


def test_keep_list_before_any_batch_raises(spark, tmp_path):
    from postbound_spark.streaming.curation import StreamingKeepList

    sink = StreamingKeepList(spark, str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        sink.keep_list()


def test_pool_swap_recovers_from_crash_windows(spark, sf_small, tmp_path):
    """The generation swap must never lose the whole pool: simulate each
    crash window (pool retired to pool_prev before pool_next lands; a
    partial pool_next without _SUCCESS) and assert _read_pool restores a
    complete generation."""
    import os
    import shutil

    from postbound_spark.streaming.curation import StreamingKeepList

    flat = _chunked_input(spark, sf_small, str(tmp_path / "in"), n_chunks=2)
    state = str(tmp_path / "state")
    sink = run_keep_list_stream(spark, flat, state)
    want = _rows(sink.keep_list())
    pool, prev, nxt = sink._pool, sink._prev, sink._next

    # window 1: crash between the two renames — pool retired, next
    # complete. A READER inside the window serves pool_next without
    # mutating anything; the next batch's _recover() finishes the swap.
    shutil.copytree(pool, nxt)
    os.rename(pool, prev)
    assert _rows(StreamingKeepList(spark, state).keep_list()) == want
    assert not os.path.exists(pool)  # the read stayed pure
    writer = StreamingKeepList(spark, state)
    writer._recover()
    assert os.path.exists(pool) and not os.path.exists(nxt)
    assert _rows(StreamingKeepList(spark, state).keep_list()) == want

    # window 2: crash mid-write of pool_next — partial (no _SUCCESS),
    # current pool already retired; readers and recovery both fall back
    # to the previous generation
    shutil.rmtree(prev, ignore_errors=True)
    shutil.rmtree(nxt, ignore_errors=True)
    shutil.copytree(pool, nxt)
    os.remove(os.path.join(nxt, "_SUCCESS"))
    os.rename(pool, prev)
    assert _rows(StreamingKeepList(spark, state).keep_list()) == want
    StreamingKeepList(spark, state)._recover()
    assert os.path.exists(pool)
    assert _rows(StreamingKeepList(spark, state).keep_list()) == want
