"""Dump .explain('formatted') for round-14-touched queries:

    python tools/dump_r14_plans.py <outdir> <suffix> [query ...]

Run once from the pre-optimization tree (suffix=before) and once from
the optimized tree (suffix=after); the judge checks plan claims in
OPTIMIZATION_r14.md against these files. sf0.001 keeps builder
execution (the chain rows materialize checkpoints at build time) cheap;
plan SHAPES are scale-independent. With no query names given, dumps the
default r14 touched set.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

DEFAULT_TOUCHED = (
    "q45_ngram_jaccard_pairs",
    "q46p_minhash_lsh_portable",
    "q54_sessions_batch",
    "q141_bpe_merges",
    "q197_tokenizer_fertility",
    "q198_idf_weighted_minhash",
    "q244_udtf_polymorphic_ngrams",
    "q245_stream_gold_yoy",
    "q330_curation_pipeline",
    "q343_ngram_jaccard_capped",
    "q344_incremental_curation",
    "q349_release_manifest",
    "q350_incremental_frozen_chain",
)


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = tuple(sys.argv[3:]) or DEFAULT_TOUCHED
    os.makedirs(outdir, exist_ok=True)
    from brazilian_e_commerce_data_pipeline_analytics_spark.plans.explain import formatted_plan
    from brazilian_e_commerce_data_pipeline_analytics_spark.registry import spark_queries
    from brazilian_e_commerce_data_pipeline_analytics_spark.session import get_spark

    spark = get_spark(app_name="dump-r14-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    for name in names:
        spark.catalog.clearCache()
        try:
            plan = formatted_plan(qs[name](spark, SF_DIR))
        except Exception as exc:  # noqa: BLE001 — record instead of abort
            plan = f"PLAN DUMP FAILED: {exc!r}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
