"""Edge-corpus oracle parity for the round-6 text operators.

The driver fixtures contain no empty documents, so engine/oracle
divergence on degenerate texts would be invisible to the standard
sweep. This module rebuilds a corpus that HAS those rows (empty text,
whitespace-only text, single-char text) and requires full oracle parity
on it — pinning the ``sequence(1, stop<1)`` descending-range guard in
``quality_char_entropy`` (the functions/text.py:65 trap) and the
empty-bigram short-circuit in ``sample_importance_dsir``.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from postbound_spark.testing import compare_query

SF_SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_corpus")
    for f in os.listdir(SF_SRC):
        if f.endswith(".parquet") and f != "documents.parquet":
            os.symlink(os.path.join(SF_SRC, f), os.path.join(d, f))
    docs = pq.read_table(os.path.join(SF_SRC, "documents.parquet"))
    base = docs.to_pylist()
    next_id = max(r["doc_id"] for r in base) + 1
    for i, (text, lang) in enumerate(
        [("", "en"), ("   ", "en"), ("x", "de"), ("\n\t", "fr")]
    ):
        base.append(
            {
                "doc_id": next_id + i,
                "text": text,
                "lang": lang,
                "source": "edge",
                "n_chars": len(text),
            }
        )
    pq.write_table(
        pa.Table.from_pylist(base, schema=docs.schema),
        os.path.join(d, "documents.parquet"),
    )
    return str(d)


@pytest.mark.parametrize(
    "name", ["quality_char_entropy", "sample_importance_dsir"]
)
def test_edge_corpus_oracle_parity(spark, edge_dir, name):
    ok, msg = compare_query(spark, name, edge_dir)
    assert ok, f"{name} diverged on the edge corpus: {msg}"


def test_adaptive_plane_count_clamps_at_production_scale():
    """Round-9 (advisor): above 32 * 2^20 (~33.5M) vectors the min-k scan
    has no satisfying k in [4, 20] — next() without a default raised a
    bare StopIteration exactly at the scale the production mode exists
    for. Clamped to 20; the DuckDB oracle spells the same clamp via
    coalesce(min(k), 20)."""
    from postbound_spark.queries.pipeline import adaptive_plane_count

    assert adaptive_plane_count(100) == 4
    assert adaptive_plane_count(32 << 20) == 20        # exact boundary
    assert adaptive_plane_count((32 << 20) + 1) == 20  # past it: clamp
    assert adaptive_plane_count(10**12) == 20
