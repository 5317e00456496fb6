"""Window-function queries (SURVEY.md §2.5) — the dashboard semantics the
reference delegates to Power BI (Readme.md:157-196), expressed as Spark
window/rollup plans with DuckDB oracles.

Scale shapes:
- YoY: window partitioned by month over a per-(year,month) rollup — the
  window input is tiny regardless of raw data size.
- top-k per group: rank over the group key the aggregation already
  shuffled on → no extra exchange.
- % of total: exact decimal group sums + a broadcast 1-row total; no
  empty-frame window (which would serialize onto one task).
- moving average: window over the per-day rollup (small), decimal frame
  sums so sliding-window retraction stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, spread
from ..functions.compat import dmoney, dsum
from ..operators.datespine import gap_fill_ffill
from ..operators.windows import moving_sum_avg, top_k_per_group, yoy
from ..registry import register

_REV_DEC = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)


def _revenue_expr() -> F.Column:
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    one = F.lit(1).cast("decimal(3,2)")
    disc = F.col("l_discount").cast("decimal(3,2)")
    return price * (one - disc)


# ---------------------------------------------------------------------------
# q20 (flagship): monthly revenue with YoY% — scan → join → groupBy →
# lag window → project (SURVEY.md §7 step 1; reference Readme.md:163-164).
# ---------------------------------------------------------------------------

_Q20_ORACLE = f"""
WITH rev AS (
  SELECT
    year(o_orderdate) AS o_year,
    month(o_orderdate) AS o_month,
    CAST(SUM({_REV_DEC}) AS DOUBLE) AS revenue,
    COUNT(DISTINCT o_orderkey) AS n_orders
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
)
SELECT
  o_year,
  o_month,
  revenue,
  n_orders,
  lag(revenue) OVER (PARTITION BY o_month ORDER BY o_year) AS prev_value,
  CASE WHEN lag(revenue) OVER (PARTITION BY o_month ORDER BY o_year) <> 0
       THEN (revenue - lag(revenue) OVER (PARTITION BY o_month ORDER BY o_year))
            / lag(revenue) OVER (PARTITION BY o_month ORDER BY o_year) * 100.0
  END AS yoy_pct
FROM rev
"""


@register("q20_monthly_revenue_yoy", oracle=_Q20_ORACLE, tags=("window", "join", "agg", "flagship"))
def q20_monthly_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # spread (opt r13): the fact side of the dim join + the revenue
    # decimal products ran on the single-row-group scan's one task; the
    # conditional floor is a no-op where splits >= cores. The orders
    # side broadcasts (file-size estimate), so the join stays
    # shuffle-free for the fact. Measured sf0.1: 2.46s -> ~1.5s (noop).
    joined = spread(li).join(o, li.l_orderkey == o.o_orderkey)
    monthly = joined.groupBy(
        F.year("o_orderdate").alias("o_year"), F.month("o_orderdate").alias("o_month")
    ).agg(
        F.sum(_revenue_expr()).cast("double").alias("revenue"),
        F.countDistinct("o_orderkey").alias("n_orders"),
    )
    return yoy(monthly, entity_cols=["o_month"], period_col="o_year", metric_col="revenue")


# ---------------------------------------------------------------------------
# q21: global top-10 customers by revenue (rank + unique tiebreaker).
# TakeOrderedAndProject under the hood — no single-partition global window.
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT c_custkey, c_name, revenue, n_orders,
       row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rank
FROM (
  SELECT c_custkey, c_name,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_orders
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey, c_name
)
QUALIFY rank <= 10
"""


@register("q21_top10_customers", oracle=_Q21_ORACLE, tags=("window", "topk", "join"))
def q21_top10_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(dsum("o_totalprice", "revenue"), F.count(F.lit(1)).alias("n_orders"))
    )
    from ..operators.windows import top_k

    return top_k(per_cust, order_by=[F.col("revenue").desc(), F.col("c_custkey")], k=10)


# ---------------------------------------------------------------------------
# q22: top-3 parts per brand (rank over partition — Top-N per group,
# Readme.md:165 "Top 10 products" generalized).
# ---------------------------------------------------------------------------

_Q22_ORACLE = f"""
SELECT p_brand, p_partkey, revenue,
       row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rank
FROM (
  SELECT p_brand, p_partkey, CAST(SUM({_REV_DEC}) AS DOUBLE) AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_partkey
)
QUALIFY rank <= 3
"""


@register("q22_top3_parts_per_brand", oracle=_Q22_ORACLE, tags=("window", "topk", "join"))
def q22_top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_part = (
        # part scales with SF — no broadcast hint (q215's rule); AQE
        # broadcasts while it fits, shuffle-joins on partkey when not.
        # spread (opt r13): conditional parallelism floor on the fact
        # side — the single-row-group fixture ran join+partial-agg on
        # one task; no-op at scale. Measured sf0.1: 2.16s -> 1.68s.
        spread(li).join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum(_revenue_expr()).cast("double").alias("revenue"))
    )
    return top_k_per_group(
        per_part,
        partition_by=["p_brand"],
        order_by=[F.col("revenue").desc(), F.col("p_partkey")],
        k=3,
    )


# ---------------------------------------------------------------------------
# q23: % of total by region (Readme.md:187). Exact decimal group sums; the
# grand total is an exact decimal sum of those, so the double division is
# bit-identical in both engines.
# ---------------------------------------------------------------------------

_Q23_ORACLE = """
SELECT r_name,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE) * 100.0 AS pct_of_total
FROM (
  SELECT r_name, SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
  FROM region
  JOIN nation ON n_regionkey = r_regionkey
  JOIN customer ON c_nationkey = n_nationkey
  JOIN orders ON o_custkey = c_custkey
  GROUP BY r_name
)
"""


@register("q23_region_pct_of_total", oracle=_Q23_ORACLE, tags=("window", "pct", "join"))
def q23_region_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_region = (
        # customer scales with the fact — no explicit broadcast hint
        # (same reasoning as q215; AQE broadcasts at runtime while it
        # fits, shuffle-joins when it doesn't). nation/region are
        # fixed-cardinality dims, safe to hint.
        orders.join(customer.select("c_custkey", "c_nationkey"), orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_regionkey")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.sum(dmoney("o_totalprice")).alias("rev"))
    )
    total = per_region.agg(F.sum("rev").alias("__total"))
    return (
        per_region.crossJoin(F.broadcast(total))
        .select(
            "r_name",
            F.col("rev").cast("double").alias("revenue"),
            (F.col("rev").cast("double") / F.col("__total").cast("double") * F.lit(100.0)).alias(
                "pct_of_total"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q24: 7-day trailing moving average of daily revenue (frame window,
# Readme.md:166 daily patterns). Window input = per-day rollup (small).
# ---------------------------------------------------------------------------

_Q24_ORACLE = """
SELECT d, day_revenue,
       CAST(SUM(CAST(day_revenue AS DECIMAL(28,8)))
            OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum,
       CAST(SUM(CAST(day_revenue AS DECIMAL(28,8)))
            OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(day_revenue) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS moving_avg
FROM (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS day_revenue
  FROM orders
  GROUP BY 1
)
"""


@register("q24_moving_avg_7d", oracle=_Q24_ORACLE, tags=("window", "frame"))
def q24_moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_day = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        dsum("o_totalprice", "day_revenue")
    )
    return moving_sum_avg(per_day, order_col="d", metric_col="day_revenue", n=7)


# ---------------------------------------------------------------------------
# q25: rollup(year, month) — subtotals + grand total (§2.4 note: cube/rollup
# nearly free in Spark; serves the Region→Product→City decomposition tree).
# ---------------------------------------------------------------------------

_Q25_ORACLE = """
SELECT year(o_orderdate) AS o_year,
       month(o_orderdate) AS o_month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM orders
GROUP BY ROLLUP (1, 2)
"""


@register("q25_rollup_year_month", oracle=_Q25_ORACLE, tags=("rollup", "agg"))
def q25_rollup_year_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("o_year", F.year("o_orderdate"))
        .withColumn("o_month", F.month("o_orderdate"))
        .rollup("o_year", "o_month")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "revenue"))
    )


# ---------------------------------------------------------------------------
# q26: cube over (status, priority) — all grouping-set combinations, with
# GROUPING() flags to disambiguate data NULLs from subtotal NULLs.
# ---------------------------------------------------------------------------

_Q26_ORACLE = """
SELECT o_orderstatus,
       o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("q26_cube_status_priority", oracle=_Q26_ORACLE, tags=("cube", "agg"))
def q26_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "revenue"),
    )


# ---------------------------------------------------------------------------
# q19: explicit GROUPING SETS — the general form rollup/cube specialize;
# here (status, priority) breakdown + per-status subtotal + grand total,
# which neither rollup nor cube expresses alone. One pass over the data:
# Spark expands the sets inside a single Expand + Aggregate.
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT o_orderstatus,
       o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


@register("q19_grouping_sets", oracle=_Q19_ORACLE, tags=("grouping-sets", "agg"))
def q19_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "revenue"),
    )


# ---------------------------------------------------------------------------
# q27: exact percentiles (A8 "averages" generalized to distribution
# stats). Spark's percentile() and DuckDB's quantile_cont() use the same
# linear interpolation over doubles — verified bit-identical — so no
# rounding is needed. (DECIMAL inputs would NOT match: DuckDB
# interpolates decimals exactly, Spark converts to double first.)
# ---------------------------------------------------------------------------

_Q27_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS p50,
       quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9) AS p90,
       quantile_cont(CAST(o_totalprice AS DOUBLE), 0.99) AS p99
FROM orders
GROUP BY o_orderpriority
"""


@register("q27_price_percentiles", oracle=_Q27_ORACLE, tags=("percentile", "agg"))
def q27_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
        F.percentile("o_totalprice", F.lit(0.99)).alias("p99"),
    )


# ---------------------------------------------------------------------------
# q63: decomposition tree (the reference's Region → Product → City
# drill-down visual, Readme.md:163) — region → nation → market segment
# in ONE grouping-sets pass, each row carrying its % of parent. Parent
# totals come from a window over the siblings (children partition their
# parent exactly), summed in DECIMAL so the window accumulation is
# order-independent on both engines.
# ---------------------------------------------------------------------------

_Q63_ORACLE = """
WITH cells AS (
  SELECT r.r_name AS region, n.n_name AS nation, c.c_mktsegment AS segment,
         CAST(GROUPING(n.n_name) AS INT) AS g_nation,
         CAST(GROUPING(c.c_mktsegment) AS INT) AS g_segment,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY GROUPING SETS ((r.r_name), (r.r_name, n.n_name),
                          (r.r_name, n.n_name, c.c_mktsegment))
),
lv AS (
  SELECT *, 3 - g_nation - g_segment AS lvl FROM cells
)
SELECT lvl, region, nation, segment, n_orders, revenue,
       ROUND(revenue / CAST(SUM(CAST(revenue AS DECIMAL(28,6))) OVER (
         PARTITION BY lvl,
                      CASE WHEN lvl >= 2 THEN region END,
                      CASE WHEN lvl = 3 THEN nation END
       ) AS DOUBLE), 6) AS pct_of_parent
FROM lv
"""


@register("q63_decomposition_tree", oracle=_Q63_ORACLE, tags=("grouping-sets", "window", "pct", "join", "bi"))
def q63_decomposition_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            "o_totalprice",
        )
    )
    cells = joined.groupingSets(
        [["region"], ["region", "nation"], ["region", "nation", "segment"]],
        "region",
        "nation",
        "segment",
    ).agg(
        F.grouping("nation").cast("int").alias("g_nation"),
        F.grouping("segment").cast("int").alias("g_segment"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "revenue"),
    )
    lv = cells.withColumn(
        "lvl", F.lit(3) - F.col("g_nation") - F.col("g_segment")
    )
    w = Window.partitionBy(
        "lvl",
        F.when(F.col("lvl") >= 2, F.col("region")),
        F.when(F.col("lvl") == 3, F.col("nation")),
    )
    parent = F.sum(F.col("revenue").cast("decimal(28,6)")).over(w).cast("double")
    return lv.select(
        "lvl",
        "region",
        "nation",
        "segment",
        "n_orders",
        "revenue",
        F.round(F.col("revenue") / parent, 6).alias("pct_of_parent"),
    )


# ---------------------------------------------------------------------------
# q69: distribution-position statistics — NTILE quartiles, percent_rank,
# cume_dist over per-customer revenue (customer segmentation semantics).
# The order is total (revenue desc, custkey) so every position value is
# deterministic and both engines agree exactly. Scale: the oracle uses
# the window functions; the Spark side computes the SAME values from one
# distributed_rank pass (range-shuffle + parallel local row_number +
# broadcast count prefixes) — on a total order ntile/percent_rank/
# cume_dist are pure expressions of (rank, n): ntile via ntile_expr,
# percent_rank = (rank-1)/(n-1), cume_dist = rank/n. No unpartitioned
# window; every customer row stays parallel (VERDICT r4 item 3).
# ---------------------------------------------------------------------------

_Q69_ORACLE = """
WITH per_cust AS (
  SELECT c_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
SELECT quartile,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(revenue AS DECIMAL(28,6))) AS DOUBLE) AS quartile_revenue,
       MIN(pr) AS min_pct_rank,
       MAX(cd) AS max_cume_dist
FROM (
  SELECT c_custkey, revenue,
         ntile(4) OVER w AS quartile,
         round(percent_rank() OVER w, 6) AS pr,
         round(cume_dist() OVER w, 6) AS cd
  FROM per_cust
  WINDOW w AS (ORDER BY revenue DESC, c_custkey)
)
GROUP BY quartile
"""


@register("q69_ntile_quartiles", oracle=_Q69_ORACLE, tags=("window", "ntile", "segmentation"))
def q69_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import (
        cume_dist_expr,
        distributed_rank,
        ntile_expr,
        percent_rank_expr,
    )

    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(dsum("o_totalprice", "revenue"))
    )
    ranked = distributed_rank(
        per_cust,
        [F.col("revenue").desc(), F.col("c_custkey")],
        out="__rank",
        total_out="__n",
    )
    rank, n = F.col("__rank"), F.col("__n")
    positioned = ranked.select(
        "c_custkey",
        "revenue",
        ntile_expr(rank, n, 4).alias("quartile"),
        # total order → percent_rank/cume_dist are rank arithmetic; the
        # integer→double divisions are single operations, bit-equal to
        # the window functions' own math in both engines (incl. the
        # n=1 degenerate case — percent_rank_expr pins it to 0.0).
        F.round(percent_rank_expr(rank, n), 6).alias("pr"),
        F.round(cume_dist_expr(rank, n), 6).alias("cd"),
    )
    return positioned.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("revenue").cast("decimal(28,6)")).cast("double").alias("quartile_revenue"),
        F.min("pr").alias("min_pct_rank"),
        F.max("cd").alias("max_cume_dist"),
    )


# ---------------------------------------------------------------------------
# q76: decomposition tree — the reference dashboard's Region -> Product ->
# City drill-down (Readme.md:163, Doc/…md:526-529) generalized to
# region -> nation -> market segment with pct-of-parent at every node.
# ONE pass computes all levels (rollup = single Expand + Aggregate; no
# per-level rescans), then one window derives pct-of-parent: within a
# level, children partitioned by their parent's keys sum to exactly the
# parent's total, so pct = revenue / window-sum. Parent keys are masked
# per level (CASE WHEN lvl >= d THEN key) so level-1 rows share the
# grand-total partition. Window sums go through DECIMAL to stay
# accumulation-order-independent across engines.
# ---------------------------------------------------------------------------

_Q76_ORACLE = """
WITH base AS (
  SELECT r_name, n_name, c_mktsegment, o_totalprice
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
),
agg AS (
  SELECT r_name, n_name, c_mktsegment,
         CAST(3 - (GROUPING(r_name) + GROUPING(n_name) + GROUPING(c_mktsegment)) AS INT) AS lvl,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM base
  GROUP BY ROLLUP (r_name, n_name, c_mktsegment)
)
SELECT r_name, n_name, c_mktsegment, lvl, n_orders, revenue,
       revenue / CAST(SUM(CAST(revenue AS DECIMAL(18,4))) OVER (
         PARTITION BY lvl,
           CASE WHEN lvl >= 2 THEN r_name END,
           CASE WHEN lvl >= 3 THEN n_name END
       ) AS DOUBLE) AS pct_of_parent
FROM agg
"""


@register("q76_decomposition_tree", oracle=_Q76_ORACLE, tags=("rollup", "window", "bi"))
def q76_decomposition_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dims = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    cust = customer.join(F.broadcast(dims), customer.c_nationkey == dims.n_nationkey)
    full = orders.join(cust, orders.o_custkey == cust.c_custkey)
    agg = full.rollup("r_name", "n_name", "c_mktsegment").agg(
        (
            F.lit(3)
            - (
                F.grouping("r_name")
                + F.grouping("n_name")
                + F.grouping("c_mktsegment")
            )
        )
        .cast("int")
        .alias("lvl"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "revenue"),
    )
    w = Window.partitionBy(
        "lvl",
        F.when(F.col("lvl") >= 2, F.col("r_name")),
        F.when(F.col("lvl") >= 3, F.col("n_name")),
    )
    return agg.withColumn(
        "pct_of_parent",
        F.col("revenue")
        / F.sum(F.col("revenue").cast("decimal(18,4)")).over(w).cast("double"),
    )


# ---------------------------------------------------------------------------
# q77: gap-fill + forward-fill — densify sparse per-key daily series onto
# a calendar spine, LOCF the daily value, and accumulate revenue-to-date.
# The reference's dim_date join (reporting.py:56-92) leaves gap days
# absent entirely; every "as of day X" BI visual needs this dense form.
# Decimal stays decimal THROUGH the window sum (exact, association-free),
# cast to double only at the output boundary — a windowed double sum
# would disagree with DuckDB's segment-tree accumulation order.
# ---------------------------------------------------------------------------

_Q77_ORACLE = """
WITH daily AS (
  SELECT o_orderpriority,
         CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev_dec
  FROM orders
  GROUP BY 1, 2
),
b AS (SELECT o_orderpriority, MIN(d) AS mn FROM daily GROUP BY 1),
g AS (SELECT MAX(d) AS mx FROM daily),
spine AS (
  SELECT b.o_orderpriority, CAST(gs AS DATE) AS d
  FROM b, g,
  LATERAL (SELECT unnest(generate_series(b.mn::TIMESTAMP, g.mx::TIMESTAMP,
                                         INTERVAL 1 DAY)) AS gs) s
)
SELECT spine.o_orderpriority,
       spine.d,
       CAST(last_value(daily.rev_dec IGNORE NULLS) OVER w AS DOUBLE) AS rev_filled,
       CAST(SUM(COALESCE(daily.rev_dec, 0)) OVER w AS DOUBLE) AS rev_to_date,
       daily.rev_dec IS NOT NULL AS was_observed
FROM spine
LEFT JOIN daily
  ON spine.o_orderpriority = daily.o_orderpriority AND spine.d = daily.d
WINDOW w AS (PARTITION BY spine.o_orderpriority ORDER BY spine.d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register(
    "q77_gap_fill_ffill",
    oracle=_Q77_ORACLE,
    tags=("spine", "window", "ffill", "bi"),
)
def q77_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority", F.col("o_orderdate").cast("date").alias("d")
    ).agg(F.sum(dmoney("o_totalprice")).alias("rev_dec"))
    dense = gap_fill_ffill(
        daily,
        keys=["o_orderpriority"],
        date_col="d",
        value_cols=["rev_dec"],
        running_total_cols=["rev_dec"],
    )
    return dense.select(
        "o_orderpriority",
        "d",
        F.col("rev_dec").cast("double").alias("rev_filled"),
        F.col("rev_dec_cum").cast("double").alias("rev_to_date"),
        "was_observed",
    )


# ---------------------------------------------------------------------------
# q93: RANGE-framed window (value-based frame) — trailing 7-day revenue
# per day. Unlike q24's ROWS frame, a RANGE frame is gap-correct: a day
# following a 10-day quiet period sums only itself, instead of reaching
# back over 6 calendar-unrelated rows. Spark expresses the interval
# bound as rangeBetween over an integer day number; DuckDB uses the
# native RANGE BETWEEN INTERVAL — same semantics, value-exact.
# ---------------------------------------------------------------------------

_Q93_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT day,
       revenue,
       CAST(SUM(CAST(revenue AS DECIMAL(18,4))) OVER (
         ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS revenue_7d
FROM daily
"""


@register("q93_range_frame_7d", oracle=_Q93_ORACLE, tags=("window", "range-frame"))
def q93_range_frame_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue")
        )
    )
    # integer day number carries the calendar distance for rangeBetween.
    # The unpartitioned window is deliberate and scale-safe HERE: the
    # input is one row per day (thousands of rows for years of data) —
    # the heavy lifting happened in the daily groupBy above.
    w = (
        Window.orderBy(F.datediff(F.col("day"), F.lit("1970-01-01")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "day",
        "revenue",
        F.sum(F.col("revenue").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("revenue_7d"),
    )


# ---------------------------------------------------------------------------
# q200: gold-layer data cube with grouping_id level selection — extends
# q19/q25/q26 from "emit every grouping-set combination" to the shape a
# BI serving layer actually materializes: a 3-dim cube over
# (order year, customer nation, order priority) where grouping_id()
# FILTERS the 8 cube levels down to the 4 a dashboard serves (full
# detail, priority rolled up, year totals, grand total) — the other 4
# margins (those aggregating across years at sub-total grain) are
# never queried and never stored. Catalyst evaluates the whole cube in
# ONE Expand+Aggregate pass and the gid filter prunes expanded rows
# before the shuffle, so the discarded levels cost no aggregation
# state — exactly how a 100 TB cube build avoids materializing 2^k
# levels. grouping_id bit order (leftmost grouping col = MSB) is
# verified identical between Spark and DuckDB's GROUPING(a,b,c).
# ---------------------------------------------------------------------------

_Q200_ORACLE = """
SELECT year(o_orderdate) AS o_year,
       n_name,
       o_orderpriority,
       CAST(GROUPING(year(o_orderdate), n_name, o_orderpriority) AS INT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
GROUP BY CUBE (1, 2, 3)
HAVING CAST(GROUPING(year(o_orderdate), n_name, o_orderpriority) AS INT)
         IN (0, 1, 3, 7)
"""


@register("q200_gold_cube_levels", oracle=_Q200_ORACLE, tags=("cube", "agg", "gold"))
def q200_gold_cube_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            "n_name",
            "o_orderpriority",
            "o_totalprice",
        )
    )
    gid = F.grouping_id().cast("int")
    return (
        base.cube("o_year", "n_name", "o_orderpriority")
        .agg(
            gid.alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "revenue"),
        )
        .filter(F.col("gid").isin(0, 1, 3, 7))
    )
