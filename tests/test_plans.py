"""Physical-plan assertions (SURVEY.md §4): the scale claims each
operator makes — filter pushdown, column pruning, broadcast dim joins,
no Python in core paths, shuffle counts — pinned as tests so a plan
regression fails CI like a wrong value would."""

from __future__ import annotations

import pytest

from brazilian_e_commerce_data_pipeline_analytics_spark.plans.explain import (
    exchange_count,
    has_python_eval,
    pushed_filters,
    read_schemas,
    uses_broadcast_join,
)
from brazilian_e_commerce_data_pipeline_analytics_spark.registry import all_queries

from .conftest import SF_SMALL

QUERIES = all_queries()

# Every registered query built from DataFrame expressions must stay
# JVM-side — Python evaluation in the plan means a 10-100x slowdown at
# scale. (The multimodal decode path uses mapInPandas by design, but its
# registered query q52 is JVM-only.)
CORE = [
    "q01_pricing_summary",
    "q02_items_per_order",
    "q03_region_revenue",
    "q08_dedup_first_line",
    "q19_grouping_sets",
    "q20_monthly_revenue_yoy",
    "q21_top10_customers",
    "q22_top3_parts_per_brand",
    "q27_price_percentiles",
    "q30_events_hourly",
    "q36_salted_user_agg",
    "q37_sliding_windows",
    "q40_token_stats",
    "q44_exact_dedup",
    "q45_ngram_jaccard_pairs",
    "q46_minhash_lsh_pairs",
    "q48_knn_bruteforce",
    "q51_ann_lsh_bucketed",
    "q52_blob_meta",
    "q54_sessions_batch",
]


def test_salted_agg_spreads_then_merges(spark):
    """q36's plan: exactly two exchanges — (key, salt) partial then key
    final — the documented skew shape, not a single hot-key shuffle."""
    df = QUERIES["q36_salted_user_agg"].builder(spark, SF_SMALL)
    assert exchange_count(df) == 2


@pytest.mark.parametrize("name", CORE)
def test_no_python_in_core_plans(spark, name):
    df = QUERIES[name].builder(spark, SF_SMALL)
    assert not has_python_eval(df), f"{name} plan crosses into Python"


def test_q01_filter_pushdown_and_pruning(spark):
    df = QUERIES["q01_pricing_summary"].builder(spark, SF_SMALL)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed and "LessThanOrEqual" in pushed
    (schema,) = read_schemas(df)
    # column pruning: the 11-column table is read as exactly 7 columns
    assert "l_orderkey" not in schema and "l_partkey" not in schema
    assert "l_quantity" in schema


def test_q05_pushdown_of_range_and_in(spark):
    df = QUERIES["q05_priority_counts"].builder(spark, SF_SMALL)
    pushed = " ".join(pushed_filters(df))
    assert "o_orderdate" in pushed
    assert "In(o_orderstatus" in pushed or "o_orderstatus" in pushed


def test_dim_joins_broadcast(spark):
    for name in ("q03_region_revenue", "q22_top3_parts_per_brand", "q23_region_pct_of_total"):
        df = QUERIES[name].builder(spark, SF_SMALL)
        assert uses_broadcast_join(df), f"{name} should broadcast its dims"


def test_projection_only_query_has_no_shuffle(spark):
    df = QUERIES["q17_scalar_strings"].builder(spark, SF_SMALL)
    assert exchange_count(df) == 0


def test_knn_broadcasts_queries_not_corpus(spark):
    df = QUERIES["q48_knn_bruteforce"].builder(spark, SF_SMALL)
    plan_has_broadcast = uses_broadcast_join(df) or "BroadcastNestedLoopJoin" in (
        __import__(
            "brazilian_e_commerce_data_pipeline_analytics_spark.plans.explain", fromlist=["formatted_plan"]
        ).formatted_plan(df)
    )
    assert plan_has_broadcast


def test_single_agg_query_has_one_exchange(spark):
    # q01: partial agg map-side, one exchange on the tiny group key, final agg
    df = QUERIES["q01_pricing_summary"].builder(spark, SF_SMALL)
    assert exchange_count(df) == 1


def test_global_topk_is_distributed_take_ordered(spark):
    """q21's global top-10 must plan as TakeOrderedAndProject (per-
    partition top-k then merge on the driver-side heap), NOT a global
    single-partition window sort — the difference between O(k) and
    O(table) on one task at 100 TB."""
    from brazilian_e_commerce_data_pipeline_analytics_spark.plans.explain import formatted_plan

    df = QUERIES["q21_top10_customers"].builder(spark, SF_SMALL)
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's runtime skew handling — the default defense SCALING.md
    leans on before explicit salting — actually splits a hot partition:
    thresholds lowered so local-scale data triggers it, then the final
    adaptive plan must show SortMergeJoin(skew=true)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = (
            spark.range(300000)
            .withColumn(
                "k",
                F.when(F.col("id") < 250000, F.lit(0)).otherwise(
                    (F.col("id") % 100) + 1
                ),
            )
            .withColumn("pad", F.lit("x" * 80))
        )
        small = spark.range(101).select(
            F.col("id").alias("k"), F.concat(F.lit("n_"), F.col("id")).alias("name")
        )
        j = big.join(small, "k")
        assert len(j.collect()) == 300000
        plan = j._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "skew=true" in plan, "AQE did not split the skewed partition"
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
