"""Example 12 — a training-data curation pipeline, end to end.

No reference counterpart (the reference is a batch-SQL optimizer
framework); this walkthrough chains the engine's LLM-pipeline operators
the way a corpus team actually runs them on a crawl:

    raw corpus
      -> near-duplicate clusters, keep one canonical doc per cluster
      -> character-entropy quality gate
      -> cross-source duplication census (which snapshots overlap?)
      -> temperature-scaled mixing report + per-source token-budget fill
      -> tokenizer fertility readout per language
      -> leakage-safe train/valid/test split by source hash

Every stage is a registry query with its own DuckDB oracle and a
physical-plan gate in ``tests/test_plan_quality.py``; the composition
here adds only keep-list joins. Scale notes inline: the DROP list
(duplicates to remove) is broadcast because duplicates are a small
fraction of any corpus, while the quality KEEP list is corpus-sized and
therefore joined semi WITHOUT a broadcast hint — in a production run the
entropy flag would instead be computed inline on the deduped frame
(it is map-only; see the quality_char_entropy plan gate).
"""

from __future__ import annotations


def main(spark=None, sf_dir=None):
    from _shared import bootstrap

    spark, sf_dir, _ = bootstrap(spark, sf_dir)

    from pyspark.sql import functions as F

    from postbound_spark.catalog import load_table
    from postbound_spark.queries.pipeline import (
        dedup_cluster_sources,
        dedup_components,
        quality_char_entropy,
        release_stage_caches,
        sample_split_assign,
        sample_temperature_mix,
        sample_token_budget_fill,
        stage_cache,
        tokenizer_fertility,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # -- stage 1: near-duplicate removal --------------------------------
    # Cluster labels from MinHash-LSH + connected components; every
    # cluster keeps its smallest doc_id (the canonical representative),
    # so the drop list is exactly the rows whose label differs from
    # their own id. Drop lists are duplicate-sized, hence broadcast.
    labels = dedup_components(spark, sf_dir)  # (doc_id, component)
    drop = labels.filter("doc_id != component").select("doc_id")
    # stage_cache: three actions read this frame (two counts + the
    # quality join) — without it each one would re-run the LSH +
    # connected-components chain, the pipeline's most expensive stage
    deduped = stage_cache(docs.join(F.broadcast(drop), "doc_id", "left_anti"))
    n_dedup = deduped.count()

    # -- stage 2: quality gate -------------------------------------------
    # Character-entropy keep flag (low entropy = key-mash/boilerplate).
    # The keep list is corpus-sized: no broadcast hint (at scale, compute
    # the flag inline on `deduped` instead of joining it back).
    keep = quality_char_entropy(spark, sf_dir).filter("keep = 1")
    curated = stage_cache(
        deduped.join(keep.select("doc_id"), "doc_id", "left_semi")
    )
    n_quality = curated.count()

    # -- stage 3: provenance censuses --------------------------------------
    overlap = dedup_cluster_sources(spark, sf_dir)
    print("cross-source duplicate clusters (snapshot overlap):")
    overlap.show(5, truncate=False)

    # -- stage 4: mixing + budget ----------------------------------------
    mix = sample_temperature_mix(spark, sf_dir)
    print("temperature-scaled mixing shares (alpha = 1/2):")
    mix.select("source", "raw_share_ppm", "temp_share_ppm").show(5)
    fill = sample_token_budget_fill(spark, sf_dir)
    print("per-source 2/5 token-budget fill:")
    fill.select("source", "alloc_tokens", "n_docs_kept", "fill_ppm").show(5)

    # -- stage 5: tokenizer readout ---------------------------------------
    fert = tokenizer_fertility(spark, sf_dir)
    print("tokenizer fertility by language:")
    fert.show()

    # -- stage 6: leakage-safe split --------------------------------------
    # The LAST stage of every curation run: route documents to
    # train/valid/test by a hash of the LEAKAGE GROUP (source), so the
    # near-duplicates stages 1-2 could not remove can still never
    # straddle a split boundary. The hash IS the routing table — nothing
    # is broadcast, however many groups exist.
    split = sample_split_assign(spark, sf_dir)
    print("leakage-safe split census (group-hash routing):")
    split.show()

    summary = spark.createDataFrame(
        [
            (
                n_raw,
                n_dedup,
                n_quality,
                overlap.count(),
                fill.count(),
            )
        ],
        "n_raw long, n_after_dedup long, n_after_quality long, "
        "n_overlap_pairs long, n_sources long",
    )
    print(
        f"curation funnel: {n_raw} raw -> {n_dedup} deduped -> "
        f"{n_quality} quality-kept"
    )
    release_stage_caches()
    return summary


if __name__ == "__main__":
    main().show()
