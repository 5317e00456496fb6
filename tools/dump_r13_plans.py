"""Dump .explain('formatted') for the round-13 optimization's touched
queries into a directory: ``python tools/dump_r13_plans.py <outdir> <suffix>``.

Run once from the pre-optimization worktree (suffix=before) and once
from the optimized tree (suffix=after); the judge checks plan claims in
OPTIMIZATION_r13.md against these files. sf0.001 keeps builder
execution (the chain rows materialize checkpoints at build time) cheap;
plan SHAPES are scale-independent.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

TOUCHED = (
    "q01_pricing_summary",
    "q02_items_per_order",
    "q20_monthly_revenue_yoy",
    "q22_top3_parts_per_brand",
    "q45_ngram_jaccard_pairs",
    "q46p_minhash_lsh_portable",
    "q143_semdedup",
    "q186_bigram_lm",
    "q187_kmeans_lloyd",
    "q197_tokenizer_fertility",
    "q198_idf_weighted_minhash",
    "q244_udtf_polymorphic_ngrams",
    "q274_semantic_decontamination",
    "q330_curation_pipeline",
    "q342_semdedup_vectorized",
    "q343_ngram_jaccard_capped",
    "q344_incremental_curation",
    "q348_boiler_epoch_freeze",
    "q349_release_manifest",
    "q350_incremental_frozen_chain",
)


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    from brazilian_e_commerce_data_pipeline_analytics_spark.plans.explain import formatted_plan
    from brazilian_e_commerce_data_pipeline_analytics_spark.registry import spark_queries
    from brazilian_e_commerce_data_pipeline_analytics_spark.session import get_spark

    spark = get_spark(app_name="dump-r13-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    for name in TOUCHED:
        spark.catalog.clearCache()
        try:
            plan = formatted_plan(qs[name](spark, SF_DIR))
        except Exception as exc:  # noqa: BLE001 — record instead of abort
            plan = f"PLAN DUMP FAILED: {exc!r}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan + "\n")
        print(path)


if __name__ == "__main__":
    main()
