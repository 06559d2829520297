"""Parse-hardening corpus in the shape of the public JOB-light workload.

JOB-light (Kipf et al., "Learned Cardinalities", CIDR'19; the reference
loads the real files on demand, rbergm/PostBOUND ``postbound/workloads.py:
46-53``, ``:936-1150``) is 70 COUNT(*) star queries over six IMDB tables:
``title`` at the center, joined to ``cast_info`` / ``movie_companies`` /
``movie_info`` / ``movie_info_idx`` / ``movie_keyword`` on ``movie_id``,
with 0-4 numeric/equality filters. The real texts are not redistributable
inside this repo (the reference downloads them at runtime), so this corpus
generates the same 70-query grammar deterministically: every join-pattern x
filter-pattern combination the workload uses, over the genuine schema.

Property checked (the reference's own parser invariant,
``tests/test_qal.py:437`` round-trips): ``parse_query -> to_sql ->
parse_query`` reaches a fixpoint, and the join graph the optimizer sees
(``to_query_spec``) names every FROM table.
"""

from __future__ import annotations

import pytest

from postbound_spark.plans.parser import parse_query, to_query_spec
from postbound_spark.workloads import job_light, job_light_shaped_corpus

CORPUS = job_light_shaped_corpus()


def test_corpus_size_matches_workload():
    assert len(CORPUS) == 70  # JOB-light's query count


def test_named_workload_front_door():
    """workloads.job_light() is the catalog entry (ref workloads.py:48);
    directory-only workloads refuse politely without texts."""
    from postbound_spark import workloads as W

    assert len(job_light()) == 70
    with pytest.raises(ValueError, match="not bundled"):
        W.ssb("")


@pytest.mark.parametrize("sql", CORPUS.values(), ids=list(CORPUS))
def test_joblight_roundtrip(sql):
    q = parse_query(sql)
    rendered = q.to_sql()
    assert parse_query(rendered) == q, "parse -> to_sql -> parse not a fixpoint"
    spec = to_query_spec(q)
    assert "t" in spec.tables
    # every satellite table is reachable from title in the join graph
    satellites = set(spec.tables) - {"t"}
    edge_tables = {tab for e in spec.edges for tab in e.tables()}
    assert satellites <= edge_tables
