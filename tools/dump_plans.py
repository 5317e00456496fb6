"""Regenerate PLANS.md: the actual physical plans of representative
queries, annotated with what to look for. Evidence artifact for the
"iterate on the plan, not just the result" loop — run after plan-shape
changes: ``python tools/dump_plans.py``.

WARNING: PLANS.md also contains HAND-CURATED sections beyond this
tool's SHOWCASE dict (multi-query sections like "q142/q143" that the
one-query loop can't produce). Running this tool overwrites the file
with SHOWCASE only — diff against git and re-append the manual sections
before committing (this bit a round-4 regeneration; the sections were
restored from HEAD).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

# query -> what the plan proves
SHOWCASE = {
    "q01_pricing_summary": (
        "Filter pushdown (`PushedFilters: LessThanOrEqual(l_shipdate,…)`), "
        "column pruning (7 of 16 lineitem columns in `ReadSchema`), "
        "map-side partial aggregation, ONE exchange."
    ),
    "q03_region_revenue": (
        "Both dimension joins are `BroadcastHashJoin` — the fact side "
        "never shuffles for dim joins."
    ),
    "q21_top10_customers": (
        "`TakeOrderedAndProject`: distributed per-partition top-k, never "
        "a single-partition global window sort."
    ),
    "q36_salted_user_agg": (
        "Two exchanges by design: partial agg on (key, salt) spreads the "
        "hot key, final agg on key merges n_salts partials."
    ),
    "q46p_minhash_lsh_portable": (
        "MinHash + banded LSH entirely in JVM expressions (md5/conv "
        "inside WholeStageCodegen) — no Python anywhere in the plan."
    ),
    "q48_knn_bruteforce": (
        "Query set broadcast (`BroadcastNestedLoopJoin`), corpus streamed "
        "once; cosine is a codegen'd fold, not a UDF."
    ),
    "q57_knn_pandas_udf": (
        "`FlatMapCoGroupsInPandas`: corpus blocked once, queries "
        "replicated in-plan — the Python kNN path with NO driver-side "
        "collect at any scale."
    ),
    "q104_jdbc_roundtrip": (
        "`Scan JDBCRelation(orders_rt) [numPartitions=8]`: the JDBC "
        "read-back is 8 concurrent range slices, never the 1-task "
        "whole-table pull."
    ),
    "q102_token_zipf": (
        "Vocabulary head: map-side-combined token counts, then "
        "`TakeOrderedAndProject` — the rank/cum-share window runs over "
        "the 30 survivors, O(k) at any corpus size."
    ),
    "q114_incremental_gold_merge": (
        "Incremental maintenance: the touched-hour set feeds a "
        "`BroadcastHashJoin ... LeftSemi` (recompute scope) and a "
        "`LeftAnti` (stale-row eviction) — work per delta is O(touched "
        "partitions), with no driver-side collect of the touched keys."
    ),
    "q118_bloom_join_prefilter": (
        "Semi-join reduction: the fact scan is prefiltered by a "
        "broadcast bucket-set membership join BEFORE the real dim join — "
        "only the possibly-matching fraction of the fact table reaches "
        "the join."
    ),
    "q180_interval_bucket_join": (
        "Big-big time-window join after the bucket-expansion rewrite: an "
        "ordinary shuffled equi-join on (user, bucket) — no "
        "BroadcastNestedLoopJoin, no CartesianProduct — with the exact "
        "time predicate as a post-join filter. AQE can size and "
        "skew-split it like any other shuffle join."
    ),
    "q187_kmeans_lloyd": (
        "Both Lloyd assignment passes crossJoin a BROADCAST k-row "
        "codebook (the corpus never shuffles to be assigned); centroid "
        "updates are map-side-combined (cell, dim) integer sums. No "
        "Python, no driver collect."
    ),
    "q196_sql_udf": (
        "The SQL UDF is GONE from the plan: Catalyst inlined "
        "`price_band(x)` into a codegen'd CASE expression — compare a "
        "Python UDF, which would pin a BatchEvalPython node here."
    ),
    "q262_cbo_stats_join_strategy": (
        "Statistics-driven planning: with ANALYZE'd column stats under "
        "spark.sql.cbo.enabled, FilterEstimation shrinks the point-"
        "filtered orders side to ~rows/NDV and it BROADCASTS "
        "(`BroadcastHashJoin`); stats-less, the identical query plans a "
        "SortMergeJoin — the before/after pair is pinned in "
        "tests/test_plans.py."
    ),
    "q264_mapinarrow_doc_bytes": (
        "The Python boundary is ONE `MapInArrow` node between the scan "
        "and the JVM aggregate — RecordBatches cross zero-copy, no "
        "pandas materialization node, and the groupBy stays whole-stage "
        "codegen."
    ),
    "q271_udtf_table_argument": (
        "UDTF with a TABLE argument: `BatchEvalPythonUDTF` fed by "
        "EXACTLY ONE exchange on the PARTITION BY key — each user's "
        "rows stream through one UDTF instance in ORDER BY order; the "
        "per-key sequential operator without applyInPandas."
    ),
}


# NOTE: PLANS.md contains HAND-CURATED sections (q125/q126/q127, ...)
# beyond this showcase — regenerating overwrites them. To add a section,
# run this tool to a temp file and append the new sections to PLANS.md,
# or re-add the curated text after regenerating (round-7 lesson).


def main() -> None:
    from brazilian_e_commerce_data_pipeline_analytics_spark.plans.explain import formatted_plan
    from brazilian_e_commerce_data_pipeline_analytics_spark.registry import spark_queries
    from brazilian_e_commerce_data_pipeline_analytics_spark.session import get_spark

    spark = get_spark(app_name="bedpa-plans", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()

    out = [
        "# PLANS — physical plans of representative queries\n",
        "Generated by `tools/dump_plans.py` at sf0.001 (plan shapes are",
        "scale-independent; AQE adjusts partition counts at runtime).",
        "These are the plan properties `tests/test_plans.py` pins in CI.\n",
    ]
    for name, note in SHOWCASE.items():
        plan = formatted_plan(qs[name](spark, SF_DIR))
        # keep the tree + scan details, drop the long per-node dumps
        tree = plan.split("\n\n")[0]
        details = "\n".join(
            line
            for line in plan.splitlines()
            if re.match(r"^(PushedFilters|ReadSchema):", line.strip())
        )
        out.append(f"## {name}\n\n{note}\n")
        out.append("```")
        out.append(tree.rstrip())
        if details:
            out.append("--- scan details ---")
            out.append(details)
        out.append("```\n")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
