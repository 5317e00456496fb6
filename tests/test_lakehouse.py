"""Lakehouse-maintenance queries (analytics/lakehouse_q.py): semantic
invariants and plan shapes that the differential gate alone doesn't pin.

The DuckDB oracles already prove value parity; these tests pin the
claims that make each query scale-safe — salted join == plain join,
incremental merge == full recompute, SCD2 row algebra, prefilter
actually prefilters — so a refactor can't silently keep values right at
test SF while breaking the invariant class."""

from __future__ import annotations

from pyspark.sql import functions as F

from brazilian_e_commerce_data_pipeline_analytics_spark.plans.explain import (
    has_python_eval,
    uses_broadcast_join,
)
from brazilian_e_commerce_data_pipeline_analytics_spark.registry import all_queries

from .conftest import SF_SMALL

QUERIES = all_queries()


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_salted_topk_equals_unsalted(spark):
    """q112's whole claim: salting is a physical rewrite. Compare against
    the plain (unsalted) join computed inline."""
    from brazilian_e_commerce_data_pipeline_analytics_spark.catalog import load_table
    from pyspark.sql.window import Window

    salted = QUERIES["q112_skew_salted_topk_join"].builder(spark, SF_SMALL)
    ev = load_table(spark, SF_SMALL, "events")
    cust = load_table(spark, SF_SMALL, "customer")
    plain = (
        ev.join(cust, ev["user_id"] == cust["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.desc("n_events"), "segment")).cast("int"),
        )
        .filter(F.col("rnk") <= 3)
        .select("segment", "n_events", "rnk")
    )
    assert _rows(salted.select("segment", "n_events", "rnk")) == _rows(plain)


def test_incremental_merge_equals_full_recompute(spark):
    """q114: base(pre-cutover) merged with recomputed touched hours must
    equal the one-shot aggregation over all events."""
    from brazilian_e_commerce_data_pipeline_analytics_spark.analytics.lakehouse_q import _hourly_gold
    from brazilian_e_commerce_data_pipeline_analytics_spark.catalog import load_table

    merged = QUERIES["q114_incremental_gold_merge"].builder(spark, SF_SMALL)
    full = _hourly_gold(load_table(spark, SF_SMALL, "events"))
    assert _rows(merged) == _rows(full)


def test_incremental_merge_boundary_hour_recomputed(spark):
    """The cutover (12:30) splits an hour: the touched set must include
    the boundary hour so its pre-cutover events are re-aggregated — a
    hour-aligned implementation would double-count or drop them."""
    merged = QUERIES["q114_incremental_gold_merge"].builder(spark, SF_SMALL)
    boundary = merged.filter(
        F.col("hour_start") == F.lit("2024-01-20 12:00:00").cast("timestamp")
    )
    # one row per event_type present in that hour, each counting BOTH
    # sides of the cutover (the fixture has events all day every day)
    assert boundary.count() > 0


def test_scd2_dim_invariants(spark):
    """q115: exactly one open row per customer; every closed row's
    valid_to equals its successor's valid_from (contiguous history)."""
    dim = QUERIES["q115_scd2_customer_dim"].builder(spark, SF_SMALL).cache()
    open_rows = dim.filter(F.col("is_current"))
    assert open_rows.count() == open_rows.select("custkey").distinct().count()
    # every custkey has an open row
    assert dim.select("custkey").distinct().count() == open_rows.count()
    # closed rows chain into the open row that replaced them
    closed = dim.filter(~F.col("is_current")).select("custkey", "valid_to")
    dangling = closed.join(
        dim.select("custkey", F.col("valid_from").alias("valid_to")),
        ["custkey", "valid_to"],
        "left_anti",
    )
    assert dangling.count() == 0
    dim.unpersist()


def test_audit_exercises_nonzero_violation_path(spark):
    """q116: the customers-without-events completeness check must report
    REAL findings (the event user domain is 10x smaller than the
    customer table at every SF) — the audit's red path is covered, not
    just all-green."""
    audit = {r["check_name"]: r for r in QUERIES["q116_dim_lineage_checks"].builder(spark, SF_SMALL).collect()}
    assert len(audit) == 7
    assert audit["customers_without_events"]["n_bad"] > 0
    assert audit["pk_customer_unique"]["n_bad"] == 0
    assert audit["fk_orders_custkey"]["n_bad"] == 0


def test_bloom_prefilter_reduces_before_join(spark):
    """q118: the membership prefilter must drop fact rows BEFORE the
    join (that's its entire point), and the final join must broadcast
    the dim."""
    from brazilian_e_commerce_data_pipeline_analytics_spark.catalog import load_table

    df = QUERIES["q118_bloom_join_prefilter"].builder(spark, SF_SMALL)
    assert uses_broadcast_join(df)
    assert not has_python_eval(df)
    li = load_table(spark, SF_SMALL, "lineitem")
    sup = load_table(spark, SF_SMALL, "supplier").filter(F.col("s_acctbal") >= 5000)
    dim_buckets = (
        sup.select(F.pmod(F.xxhash64("s_suppkey"), F.lit(4096)).alias("__b")).distinct()
    )
    pref_n = (
        li.withColumn("__b", F.pmod(F.xxhash64("l_suppkey"), F.lit(4096)))
        .join(F.broadcast(dim_buckets), "__b", "left_semi")
        .count()
    )
    # the filtered-dim selectivity (~half the suppliers) must show up as
    # a genuinely smaller prefiltered fact side
    assert pref_n < li.count()


def test_new_queries_stay_jvm_side(spark):
    for name in (
        "q112_skew_salted_topk_join",
        "q113_sessionized_funnel",
        "q114_incremental_gold_merge",
        "q115_scd2_customer_dim",
        "q116_dim_lineage_checks",
        "q118_bloom_join_prefilter",
    ):
        df = QUERIES[name].builder(spark, SF_SMALL)
        assert not has_python_eval(df), f"{name} plan crosses into Python"
