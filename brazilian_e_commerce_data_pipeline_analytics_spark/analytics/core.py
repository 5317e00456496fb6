"""Core relational queries (SURVEY.md §2.1-2.4, §2.7-2.8).

Each query generalizes an operator the reference exercises — scans,
projections, filters, equi-joins with broadcast dims, hash aggregations,
deterministic dedup, quality gates, set ops, date spine, scalar functions —
re-expressed over the driver's TPC-H-ish tables so the DuckDB oracle can
verify them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, spread
from ..functions.compat import davg, dmoney, dsum
from ..operators.aggregates import quality_check
from ..operators.datespine import date_spine
from ..operators.dedup import key_dedup, distinct_rows
from ..operators.joins import anti_join, equi_join, semi_join
from ..operators.projection import rename_select
from ..operators.setops import except_distinct, intersect_distinct
from ..registry import register

# ---------------------------------------------------------------------------
# q01: pricing summary — the classic scan→filter→hash-agg shape (A2-A4 wide
# aggs, reference reporting.py:260-321). Filter pushes to the parquet scan;
# one shuffle on the 6-value group key; map-side partial agg does ~all work.
# ---------------------------------------------------------------------------

_Q01_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
    AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
           * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE)
    AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q01_pricing_summary", oracle=_Q01_ORACLE, tags=("agg", "filter", "scan"))
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(3,2)")
    tax = F.col("l_tax").cast("decimal(3,2)")
    # spread (opt r13): the exact decimal products/sums are the CPU cost
    # here (BigDecimal past precision 18), and a single-row-group input
    # runs the whole partial agg on one task. The conditional floor is a
    # no-op at any scale where the scan has >= cores splits; the filter
    # still pushes through the repartition to the scan (plan-pinned).
    # Measured sf0.1: 2.4s -> 1.4s.
    return (
        spread(li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q02: per-key wide agg at full key cardinality (A4 "items per order",
# reference reporting.py:317-321). The expensive shape: shuffle on a
# high-cardinality key; AQE coalesces post-shuffle partitions.
# ---------------------------------------------------------------------------

_Q02_ORACLE = """
SELECT
  l_orderkey,
  COUNT(*) AS n_items,
  COUNT(DISTINCT l_partkey) AS n_parts,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS gross_value,
  MIN(l_linenumber) AS first_line,
  MAX(l_linenumber) AS last_line
FROM lineitem
GROUP BY l_orderkey
"""


@register("q02_items_per_order", oracle=_Q02_ORACLE, tags=("agg",))
def q02_items_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # spread (opt r13): same single-row-group serialization as q01 — the
    # map-side partial agg over the full key cardinality ran on one
    # task. No-op at scale (splits >= cores). Measured sf0.1 compute
    # (noop sink): 2.4s -> 0.9s.
    return spread(li).groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.countDistinct("l_partkey").alias("n_parts"),
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "gross_value"),
        F.min("l_linenumber").alias("first_line"),
        F.max("l_linenumber").alias("last_line"),
    )


# ---------------------------------------------------------------------------
# q03: broadcast-dim join chain region⋈nation⋈customer⋈orders (J4 dashboard
# joins). nation/region are broadcast — the orders side never shuffles for
# the dim joins; only the final groupBy exchanges data.
# ---------------------------------------------------------------------------

_Q03_ORACLE = """
SELECT
  r_name,
  COUNT(DISTINCT c.c_custkey) AS n_customers,
  COUNT(o.o_orderkey) AS n_orders,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer c ON c.c_nationkey = n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY r_name
"""


@register("q03_region_revenue", oracle=_Q03_ORACLE, tags=("join", "agg", "broadcast"))
def q03_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dims = equi_join(
        nation,
        region,
        on=nation.n_regionkey == region.r_regionkey,
        broadcast_right=True,
    )
    cust = equi_join(customer, dims, on=customer.c_nationkey == dims.n_nationkey, broadcast_right=True)
    full = equi_join(orders, cust, on=orders.o_custkey == cust.c_custkey, broadcast_right=False)
    return full.groupBy("r_name").agg(
        F.countDistinct("c_custkey").alias("n_customers"),
        F.count("o_orderkey").alias("n_orders"),
        dsum("o_totalprice", "revenue"),
    )


# ---------------------------------------------------------------------------
# q04: segment stats — groupBy + avg on a low-cardinality key (A8 totals).
# ---------------------------------------------------------------------------

_Q04_ORACLE = """
SELECT
  c_mktsegment,
  COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(c_acctbal) AS avg_acctbal,
  MIN(c_acctbal) AS min_acctbal,
  MAX(c_acctbal) AS max_acctbal
FROM customer
GROUP BY c_mktsegment
"""


@register("q04_segment_stats", oracle=_Q04_ORACLE, tags=("agg",))
def q04_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        davg("c_acctbal", "avg_acctbal"),
        F.min("c_acctbal").alias("min_acctbal"),
        F.max("c_acctbal").alias("max_acctbal"),
    )


# ---------------------------------------------------------------------------
# q05: filter + groupBy count (P2/P8 + A-counts): order priorities in a
# date range. The date predicate is pushed to the parquet scan.
# ---------------------------------------------------------------------------

_Q05_ORACLE = """
SELECT
  o_orderpriority,
  o_orderstatus,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderstatus IN ('O', 'F')
GROUP BY o_orderpriority, o_orderstatus
"""


@register("q05_priority_counts", oracle=_Q05_ORACLE, tags=("filter", "agg"))
def q05_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("o_orderstatus").isin("O", "F")
        )
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q06: global min/max/count (A1, reference date-range probe
# reporting.py:56-63) — kept fully distributed, no collect().
# ---------------------------------------------------------------------------

_Q06_ORACLE = """
SELECT
  MIN(o_orderdate) AS min_orderdate,
  MAX(o_orderdate) AS max_orderdate,
  COUNT(*) AS n_orders,
  COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
"""


@register("q06_order_date_range", oracle=_Q06_ORACLE, tags=("agg",))
def q06_order_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.min("o_orderdate").alias("min_orderdate"),
        F.max("o_orderdate").alias("max_orderdate"),
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# q07: distinct (A5) on projected columns.
# ---------------------------------------------------------------------------

_Q07_ORACLE = """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
"""


@register("q07_distinct_status_priority", oracle=_Q07_ORACLE, tags=("distinct",))
def q07_distinct_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return distinct_rows(o, ["o_orderstatus", "o_orderpriority"])


# ---------------------------------------------------------------------------
# q08: deterministic key-dedup (A6). The reference's dropDuplicates picks an
# arbitrary row (transformation.py:70); here the pick follows a TOTAL order
# (l_linenumber alone is not unique within an order in this data — the
# tiebreaker must extend to a unique key) — same shuffle, reproducible
# result.
# ---------------------------------------------------------------------------

_Q08_ORACLE = """
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity
FROM (
  SELECT *, row_number() OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
  FROM lineitem
)
WHERE rn = 1
"""


@register("q08_dedup_first_line", oracle=_Q08_ORACLE, tags=("dedup", "window"))
def q08_dedup_first_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    deduped = key_dedup(
        li, keys=["l_orderkey"], order_by=["l_linenumber", "l_partkey", "l_suppkey"]
    )
    return deduped.select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity")


# ---------------------------------------------------------------------------
# q09: quality-gate probe (A7, Dag/E-commerce_dag.py:22-37) as a single
# conditional-count aggregation over lineitem.
# ---------------------------------------------------------------------------

_Q09_ORACLE = """
SELECT
  COUNT(*) AS n_rows,
  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderkey,
  CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_qty,
  CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
  CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_shipdate,
  CAST(SUM(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS bad_returnflag
FROM lineitem
"""


@register("q09_quality_gate", oracle=_Q09_ORACLE, tags=("quality", "agg"))
def q09_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return quality_check(
        li,
        {
            "null_orderkey": F.col("l_orderkey").isNull(),
            "nonpositive_qty": F.col("l_quantity") <= 0,
            "bad_discount": (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
            "null_shipdate": F.col("l_shipdate").isNull(),
            "bad_returnflag": ~F.col("l_returnflag").isin("A", "N", "R"),
        },
    )


# ---------------------------------------------------------------------------
# q10: two-level "average daily revenue" (A8 dashboard semantics,
# Readme.md:157-196): per-day exact sums, then stats over days. The second
# aggregation input is one row per day — tiny at any scale.
# ---------------------------------------------------------------------------

_Q10_ORACLE = """
SELECT
  COUNT(*) AS n_days,
  CAST(SUM(day_total) AS DOUBLE) / COUNT(*) AS avg_daily_revenue,
  MIN(CAST(day_total AS DOUBLE)) AS min_daily_revenue,
  MAX(CAST(day_total AS DOUBLE)) AS max_daily_revenue
FROM (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS day_total
  FROM orders
  GROUP BY 1
)
"""


@register("q10_avg_daily_revenue", oracle=_Q10_ORACLE, tags=("agg", "two-level"))
def q10_avg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_day = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(dmoney("o_totalprice")).alias("day_total")
    )
    return per_day.agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.sum("day_total").cast("double") / F.count(F.lit(1))).alias("avg_daily_revenue"),
        F.min(F.col("day_total").cast("double")).alias("min_daily_revenue"),
        F.max(F.col("day_total").cast("double")).alias("max_daily_revenue"),
    )


# ---------------------------------------------------------------------------
# q11/q12: set operations (§2.7).
# ---------------------------------------------------------------------------

_Q11_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
"""


@register("q11_intersect_custkeys", oracle=_Q11_ORACLE, tags=("setop",))
def q11_intersect_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return intersect_distinct(a, b)


_Q12_ORACLE = """
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
"""


@register("q12_except_custkeys", oracle=_Q12_ORACLE, tags=("setop",))
def q12_except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    open_cust = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return except_distinct(c.select("c_custkey"), open_cust)


# ---------------------------------------------------------------------------
# q13/q14: semi/anti joins (§2.3 extension — "orders without reviews"-style
# dashboard questions).
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
"""


@register("q13_semi_big_spenders", oracle=_Q13_ORACLE, tags=("join", "semi"))
def q13_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return semi_join(c.select("c_custkey", "c_name", "c_mktsegment"), big, on="c_custkey")


_Q14_ORACLE = """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
)
"""


@register("q14_anti_no_orders", oracle=_Q14_ORACLE, tags=("join", "anti"))
def q14_anti_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return anti_join(
        c.select("c_custkey", "c_name"),
        o.select(F.col("o_custkey").alias("c_custkey")),
        on="c_custkey",
    )


# ---------------------------------------------------------------------------
# q15: left outer join with null-aware counts (§2.3 extension).
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
SELECT
  n_name,
  COUNT(c.c_custkey) AS n_customers,
  CAST(SUM(CASE WHEN c.c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_positive_bal
FROM nation
LEFT JOIN customer c ON c.c_nationkey = n_nationkey
GROUP BY n_name
"""


@register("q15_nation_customer_counts", oracle=_Q15_ORACLE, tags=("join", "left"))
def q15_nation_customer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    joined = equi_join(n, c, on=c.c_nationkey == n.n_nationkey, how="left")
    return joined.groupBy("n_name").agg(
        F.count("c_custkey").alias("n_customers"),
        F.sum(F.when(F.col("c_acctbal") > 0, 1).otherwise(0)).alias("n_positive_bal"),
    )


# ---------------------------------------------------------------------------
# q16: distributed date spine + calendar attributes (S5/S8 + dim_date
# semantics, reference reporting.py:56-92 — without the collect()).
# DuckDB dayofweek is 0=Sunday; Spark is 1=Sunday — oracle shifts by +1.
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT
  CAST(gs AS DATE) AS d,
  CAST(strftime(gs, '%Y%m%d') AS INT) AS date_sk,
  year(gs) AS y,
  month(gs) AS m,
  quarter(gs) AS q,
  weekofyear(gs) AS iso_week,
  dayofweek(gs) + 1 AS dow,
  CASE WHEN dayofweek(gs) + 1 IN (1, 7) THEN TRUE ELSE FALSE END AS is_weekend
FROM (SELECT MIN(CAST(o_orderdate AS DATE)) AS mn, MAX(CAST(o_orderdate AS DATE)) AS mx FROM orders) t,
LATERAL (SELECT unnest(generate_series(t.mn::TIMESTAMP, t.mx::TIMESTAMP, INTERVAL 1 DAY)) AS gs) s
"""


@register("q16_date_spine", oracle=_Q16_ORACLE, tags=("spine", "datetime"))
def q16_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    spine = date_spine(o, "o_orderdate", date_alias="d")
    dow = F.dayofweek("d")
    return spine.select(
        F.col("d"),
        F.date_format("d", "yyyyMMdd").cast("int").alias("date_sk"),
        F.year("d").alias("y"),
        F.month("d").alias("m"),
        F.quarter("d").alias("q"),
        F.weekofyear("d").alias("iso_week"),
        dow.alias("dow"),
        dow.isin(1, 7).alias("is_weekend"),
    )


# ---------------------------------------------------------------------------
# q17: scalar string functions (§2.8) — projection-only, no shuffle.
# format_string ↔ printf, split+getItem ↔ split_part.
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
SELECT
  p_partkey,
  upper(p_name) AS name_upper,
  length(p_name) AS name_len,
  p_brand || '-' || lpad(CAST(p_size AS VARCHAR), 3, '0') AS brand_code,
  printf('%03d', p_size) AS size_fmt,
  split_part(p_type, ' ', 1) AS type_head,
  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
  substring(p_name, 1, 8) AS name_prefix
FROM part
"""


@register("q17_scalar_strings", oracle=_Q17_ORACLE, tags=("scalar", "project"))
def q17_scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return rename_select(
        p,
        {
            "p_partkey": "p_partkey",
            "name_upper": F.upper("p_name"),
            "name_len": F.length("p_name"),
            "brand_code": F.concat(
                F.col("p_brand"), F.lit("-"), F.lpad(F.col("p_size").cast("string"), 3, "0")
            ),
            "size_fmt": F.format_string("%03d", "p_size"),
            "type_head": F.split(F.col("p_type"), " ").getItem(0),
            "name_novowels": F.regexp_replace("p_name", "[aeiou]", ""),
            "name_prefix": F.substring("p_name", 1, 8),
        },
    )


# ---------------------------------------------------------------------------
# q18: conditional bucketing (when/otherwise chains — the reference's
# region/weight/score classifiers, reporting.py:103-234) + agg per bucket.
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
SELECT
  CASE WHEN p_size < 10 THEN 'Small' WHEN p_size < 25 THEN 'Medium' ELSE 'Large' END AS size_class,
  CASE WHEN p_retailprice BETWEEN 0 AND 1200 THEN 'Budget'
       WHEN p_retailprice BETWEEN 1200.01 AND 1600 THEN 'Standard'
       ELSE 'Premium' END AS price_band,
  COUNT(*) AS n_parts,
  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS total_retail
FROM part
GROUP BY 1, 2
"""


@register("q18_part_buckets", oracle=_Q18_ORACLE, tags=("bucket", "agg"))
def q18_part_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    size_class = (
        F.when(F.col("p_size") < 10, "Small")
        .when(F.col("p_size") < 25, "Medium")
        .otherwise("Large")
    )
    price_band = (
        F.when(F.col("p_retailprice").between(0, 1200), "Budget")
        .when(F.col("p_retailprice").between(1200.01, 1600), "Standard")
        .otherwise("Premium")
    )
    return (
        p.withColumn("size_class", size_class)
        .withColumn("price_band", price_band)
        .groupBy("size_class", "price_band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum("p_retailprice", "total_retail"),
        )
    )


# ---------------------------------------------------------------------------
# q38: the reference's P5 negated-regex filter with its NULL-semantics
# trap (transformation.py:96-97): ~rlike(NULL) is NULL, so NULL text is
# DROPPED, not kept. The oracle must spell the NULL propagation out
# (SURVEY.md §7.8b) — `text IS NOT NULL AND NOT regexp_matches(...)` —
# because SQL WHERE drops NULL predicates the same way only when written
# explicitly. Also exercises P3 (length equality) and P6 (anchored
# prefix regex) in the same shape the silver cleanser uses.
# ---------------------------------------------------------------------------

_Q38_ORACLE = r"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc_id
FROM documents
WHERE text IS NOT NULL
  AND NOT regexp_matches(text, '[^a-zA-Z0-9\s.,!?]')
  AND length(source) >= 4
GROUP BY lang
"""


@register("q38_negated_rlike_filter", oracle=_Q38_ORACLE, tags=("filter", "regex", "null-semantics"))
def q38_negated_rlike_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(~F.col("text").rlike(r"[^a-zA-Z0-9\s.,!?]"))  # drops NULL text
        .filter(F.length("source") >= 4)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# q39: grouped-map applyInPandas — per-priority top-3 orders. The
# arbitrary-Python-per-group escape hatch (the others are mapInPandas in
# q58 and applyInPandasWithState in q55), on a task that produces only
# sorted/ranked originals — no float arithmetic — so the pandas path is
# value-exact against the window-SQL oracle. Shuffle: one exchange on
# the group key, same as the window version; each pandas group sees
# O(rows/group), so partition memory is bounded by the largest group.
# ---------------------------------------------------------------------------

_Q39_ORACLE = """
SELECT o_orderpriority, o_orderkey, o_totalprice, rank
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
)
WHERE rank <= 3
"""


@register("q39_grouped_map_topk", oracle=_Q39_ORACLE, tags=("grouped-map", "pandas", "topk"))
def q39_grouped_map_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )

    def top3(pdf: "pd.DataFrame") -> "pd.DataFrame":
        out = pdf.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(3)
        out = out.assign(rank=range(1, len(out) + 1))
        return out

    schema = "o_orderpriority string, o_orderkey bigint, o_totalprice double, rank int"
    return o.groupBy("o_orderpriority").applyInPandas(top3, schema=schema)


# ---------------------------------------------------------------------------
# q29: the SQL entry surface. ONE dialect-portable SQL string is both the
# Spark plan (spark.sql over catalog.register_views) and the DuckDB
# oracle, verbatim — pinning that the engine's SQL front door gives the
# same answers as its DataFrame front door (q03 is the DataFrame twin of
# this shape).
# ---------------------------------------------------------------------------

_Q29_PORTABLE_SQL = """
SELECT n.n_name AS nation,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
GROUP BY n.n_name
"""


@register("q29_sql_api", oracle=_Q29_PORTABLE_SQL, tags=("sql-api", "join", "agg"))
def q29_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import register_views

    register_views(spark, sf_dir, names=("orders", "customer", "nation"))
    return spark.sql(_Q29_PORTABLE_SQL)


# ---------------------------------------------------------------------------
# q67: null-safe equality join (<=> / IS NOT DISTINCT FROM) — NULL keys
# match each other instead of vanishing from the join, the semantics
# dim-conformance joins need when the key is genuinely absent. The NULL
# group is synthesized with nullif so the test data exercises it.
# ---------------------------------------------------------------------------

_Q67_ORACLE = """
WITH d AS (SELECT doc_id, nullif(lang, 'en') AS k FROM documents),
g AS (SELECT k, COUNT(*) AS grp_n FROM d GROUP BY k)
SELECT d.k, g.grp_n, COUNT(*) AS n_docs
FROM d JOIN g ON d.k IS NOT DISTINCT FROM g.k
GROUP BY d.k, g.grp_n
"""


@register("q67_null_safe_join", oracle=_Q67_ORACLE, tags=("join", "null-semantics"))
def q67_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.nullif("lang", F.lit("en")).alias("k")
    )
    g = d.groupBy("k").agg(F.count(F.lit(1)).alias("grp_n"))
    return (
        d.alias("d")
        .join(g.alias("g"), F.col("d.k").eqNullSafe(F.col("g.k")))
        .groupBy(F.col("d.k").alias("k"), "grp_n")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# q72: multiset set-ops — EXCEPT ALL / INTERSECT ALL (the bag semantics
# q11/q12's distinct variants don't cover: a customer with 3 urgent and
# 1 low order keeps 2 copies under EXCEPT ALL). Both results tagged into
# one relation.
# ---------------------------------------------------------------------------

_Q72_ORACLE = """
SELECT 'except_all' AS op, o_custkey, COUNT(*) AS n
FROM (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  EXCEPT ALL
  SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
)
GROUP BY 2
UNION ALL
SELECT 'intersect_all' AS op, o_custkey, COUNT(*) AS n
FROM (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT ALL
  SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
)
GROUP BY 2
"""


@register("q72_multiset_setops", oracle=_Q72_ORACLE, tags=("setop", "multiset"))
def q72_multiset_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")

    def counted(df: DataFrame, op: str) -> DataFrame:
        return df.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), "o_custkey", "n"
        )

    return counted(urgent.exceptAll(low), "except_all").unionAll(
        counted(urgent.intersectAll(low), "intersect_all")
    )


# ---------------------------------------------------------------------------
# q78: RFM customer segmentation — the canonical e-commerce customer
# analysis the reference delegates to Power BI (its gold fact_sales/
# dim_customer star exists to feed exactly this). Recency / Frequency /
# Monetary each quartiled with ntile(4); determinism requires a TOTAL
# order under every ntile (metric + c_custkey tiebreaker), or bucket
# boundaries are run-dependent in both engines.
# Scale: one shuffle to the per-customer grain, then three
# distributed_ntile passes (range-shuffle + parallel local row_number +
# broadcast count prefixes, operators/windows.py) — NO unpartitioned
# global window anywhere; each score costs one parallel range exchange
# of the per-customer relation instead of a single-task sort of it.
# The three orderings are on three DIFFERENT keys, so three exchanges
# are inherent to the semantics. Fault tolerance: each pass takes a
# lazy localCheckpoint (executor-local blocks, see
# operators/windows.py:distributed_cumsums docstring) — on a real
# cluster, a lost executor fails-and-resubmits the query; for 100-TB
# production runs switch the operator to reliable checkpointing
# (sc.setCheckpointDir + .checkpoint()) to pay storage instead of
# retry exposure. Availability tradeoff only; correctness unaffected.
# ---------------------------------------------------------------------------

_Q78_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         datediff('day', MAX(CAST(o_orderdate AS DATE)),
                  (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)) AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS monetary
  FROM orders
  GROUP BY o_custkey
)
SELECT o_custkey, recency_days, frequency, monetary,
       ntile(4) OVER (ORDER BY recency_days ASC,  o_custkey) AS r_score,
       ntile(4) OVER (ORDER BY frequency DESC,   o_custkey) AS f_score,
       ntile(4) OVER (ORDER BY monetary  DESC,   o_custkey) AS m_score
FROM per_cust
"""


@register("q78_rfm_segmentation", oracle=_Q78_ORACLE, tags=("bi", "window", "ntile", "agg"))
def q78_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import distributed_ntile

    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    asof = o.agg(F.max(d).alias("__asof"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(d).alias("__last"),
            F.count(F.lit(1)).alias("frequency"),
            dsum("o_totalprice", "monetary"),
        )
        .join(F.broadcast(asof))
        .select(
            "o_custkey",
            F.datediff("__asof", "__last").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    # Three ntile(4) scores WITHOUT three unpartitioned global windows
    # (VERDICT r4: every customer row through one task, three times).
    # distributed_ntile = range-shuffle + parallel local row_number +
    # broadcast count prefixes; each ordering is a total order (custkey
    # tiebreaker), so the buckets are exactly the window ntile's.
    scored = distributed_ntile(
        per_cust, [F.asc("recency_days"), F.col("o_custkey")], 4, "r_score"
    )
    scored = distributed_ntile(
        scored, [F.desc("frequency"), F.col("o_custkey")], 4, "f_score"
    )
    scored = distributed_ntile(
        scored, [F.desc("monetary"), F.col("o_custkey")], 4, "m_score"
    )
    return scored.select(
        "o_custkey", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score",
    )


# ---------------------------------------------------------------------------
# q79: co-purchase pairs (market-basket co-occurrence) — parts bought
# together in the same order, the "frequently bought together" feed.
# (order, part) is deduped FIRST so a part ordered on two lines counts
# once per order; pair explosion is bounded by (items-per-order choose 2)
# per order — the self-join key is l_orderkey, whose fan-out is the
# order's line count (~7), so the blowup is a small constant, not a
# hot-key hazard. Top-k via TakeOrderedAndProject keeps the driver
# result O(k) at any corpus size.
# ---------------------------------------------------------------------------

_Q79_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, n_orders,
       ROW_NUMBER() OVER (ORDER BY n_orders DESC, part_a, part_b) AS rank
FROM pairs
ORDER BY rank
LIMIT 500
"""


@register("q79_copurchase_pairs", oracle=_Q79_ORACLE, tags=("bi", "join", "self-join", "topk"))
def q79_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import top_k

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return top_k(pairs, [F.desc("n_orders"), "part_a", "part_b"], k=500)


# ---------------------------------------------------------------------------
# q80: cohort retention — customers grouped by first-order month, counted
# per months-elapsed, with retention vs the cohort's month-0 size.
# Month arithmetic via (year*12 + month) integers: exact and identical
# in both engines (months_between/datediff('month') have subtly
# different day-of-month semantics across engines — integer month
# indices sidestep that entirely).
# Scale: two shuffles — per-customer first-order (partial-agg friendly),
# then the (cohort, months_since) rollup; the month-0 size joins back
# broadcast (rows = distinct months, tiny forever).
# ---------------------------------------------------------------------------

_Q80_ORACLE = """
WITH om AS (
  SELECT o_custkey,
         year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS mi
  FROM orders
),
firsts AS (SELECT o_custkey, MIN(mi) AS cohort_mi FROM om GROUP BY o_custkey),
activity AS (
  SELECT f.cohort_mi, om.mi - f.cohort_mi AS months_since,
         COUNT(DISTINCT om.o_custkey) AS n_active
  FROM om JOIN firsts f ON om.o_custkey = f.o_custkey
  GROUP BY 1, 2
),
base AS (SELECT cohort_mi, n_active AS cohort_size FROM activity WHERE months_since = 0)
SELECT CAST(a.cohort_mi // 12 AS INT) AS cohort_year,
       a.cohort_mi % 12 + 1 AS cohort_month,
       a.months_since, a.n_active, b.cohort_size,
       ROUND(CAST(a.n_active AS DOUBLE) / b.cohort_size, 6) AS retention
FROM activity a JOIN base b ON a.cohort_mi = b.cohort_mi
"""


@register("q80_cohort_retention", oracle=_Q80_ORACLE, tags=("bi", "window", "agg", "retention"))
def q80_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    om = o.select(
        "o_custkey", (F.year(d) * 12 + F.month(d) - 1).alias("mi")
    )
    # cohort via window min (ONE shuffle on custkey) instead of the
    # textbook agg+self-join, which scans orders twice
    cohort = F.min("mi").over(Window.partitionBy("o_custkey"))
    activity = (
        om.withColumn("cohort_mi", cohort)
        .groupBy("cohort_mi", (F.col("mi") - F.col("cohort_mi")).alias("months_since"))
        .agg(F.countDistinct("o_custkey").alias("n_active"))
    )
    # month-0 size via window over the tiny rollup — no base self-join,
    # no duplicated activity subtree; every cohort has a month-0 row by
    # construction (the first order IS month 0)
    size_w = Window.partitionBy("cohort_mi")
    return (
        activity.withColumn(
            "cohort_size",
            F.max(F.when(F.col("months_since") == 0, F.col("n_active"))).over(size_w),
        )
        .select(
            # floor division on BOTH sides: DuckDB rounds float->int
            # casts while Spark truncates, so "/ 12 then cast" diverges
            F.floor(F.col("cohort_mi") / 12).cast("int").alias("cohort_year"),
            (F.col("cohort_mi") % 12 + 1).alias("cohort_month"),
            "months_since",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active").cast("double") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q90: robust outlier detection — per-segment median + MAD (median
# absolute deviation), flagging orders beyond 3*MAD. The robust twin of
# z-scores: immune to the outliers it hunts. Two exact-percentile
# passes (grouped median, then median of absolute deviations) and a
# count of flagged rows. Both medians are rounded to 6 decimals at the
# source (registry determinism contract) so every downstream quantity —
# adev, the 3*MAD boundary, the output columns — derives from identical
# values on both engines; interpolated percentiles agree only to ~1 ulp
# between Spark and DuckDB. That rounding was necessary but not
# sufficient: the r02 driver red row came from n_outliers typing as
# DuckDB HUGEINT (float64 after arrow), fixed by the BIGINT cast below.
# ---------------------------------------------------------------------------

_Q90_ORACLE = """
WITH seg_orders AS (
  SELECT c.c_mktsegment AS segment, o.o_totalprice AS price
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
med AS (
  SELECT segment, ROUND(quantile_cont(price, 0.5), 6) AS median_price
  FROM seg_orders GROUP BY segment
),
dev AS (
  SELECT s.segment, s.price, m.median_price,
         abs(s.price - m.median_price) AS adev
  FROM seg_orders s JOIN med m USING (segment)
),
mad AS (
  SELECT segment, ROUND(quantile_cont(adev, 0.5), 6) AS mad
  FROM dev GROUP BY segment
)
SELECT d.segment,
       COUNT(*) AS n_orders,
       MIN(d.median_price) AS median_price,
       MIN(m.mad) AS mad,
       -- CAST: DuckDB SUM() over integers is HUGEINT, which the driver's
       -- pandas/arrow path coerces to float64 (hash mismatch vs bigint)
       CAST(SUM(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (segment)
GROUP BY d.segment
"""


@register("q90_mad_outliers", oracle=_Q90_ORACLE, tags=("robust-stats", "quality"))
def q90_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # customer scales with the fact — no broadcast hint (q215's rule:
    # hints promise driver-sized at ANY SF; AQE decides at runtime)
    seg = o.join(
        c.select("c_custkey", "c_mktsegment"),
        o.o_custkey == c.c_custkey,
    ).select(F.col("c_mktsegment").alias("segment"), F.col("o_totalprice").alias("price"))
    med = seg.groupBy("segment").agg(
        F.round(F.percentile("price", F.lit(0.5)), 6).alias("median_price")
    )
    dev = seg.join(F.broadcast(med), "segment").withColumn(
        "adev", F.abs(F.col("price") - F.col("median_price"))
    )
    mad = dev.groupBy("segment").agg(
        F.round(F.percentile("adev", F.lit(0.5)), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "segment")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("median_price").alias("median_price"),
            F.min("mad").alias("mad"),
            F.sum(F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)).alias(
                "n_outliers"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q92: EXISTS-style semi-join aggregate (the TPC-H Q4 shape): count
# orders per priority having ANY lineitem shipped more than 90 days
# after the order date. The semi join carries a residual non-equi
# condition alongside the key equality — each order counted once no
# matter how many late items it has (the trap a plain inner join +
# count falls into).
# ---------------------------------------------------------------------------

_Q92_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
GROUP BY o_orderpriority
"""


@register("q92_late_ship_orders", oracle=_Q92_ORACLE, tags=("semi-join", "classic"))
def q92_late_ship_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# q111: market-basket association metrics — q79's co-occurrence pairs
# upgraded to the full support / confidence / lift triple, the numbers a
# recommender or assortment analysis actually consumes. Per-item order
# counts join onto the top-500 pair relation (the pair side is the
# broadcastable one — item counts scale with |part|, so they are never
# hinted), the total basket count rides a one-row crossJoin, and all
# three ratios are integer-derived doubles rounded to 6 — identical in
# any engine. Same top-500 deterministic cut as q79.
# ---------------------------------------------------------------------------

_Q111_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM op),
item AS (SELECT l_partkey, COUNT(*) AS n_item FROM op GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT part_a, part_b, n_ab,
         ROW_NUMBER() OVER (ORDER BY n_ab DESC, part_a, part_b) AS rank
  FROM pairs
)
SELECT r.rank, r.part_a, r.part_b, r.n_ab,
       ia.n_item AS n_a, ib.n_item AS n_b,
       ROUND(CAST(r.n_ab AS DOUBLE) / t.n_baskets, 6) AS support,
       ROUND(CAST(r.n_ab AS DOUBLE) / ia.n_item, 6) AS confidence,
       ROUND(CAST(r.n_ab AS DOUBLE) * t.n_baskets / (CAST(ia.n_item AS DOUBLE) * ib.n_item), 6) AS lift
FROM ranked r
JOIN item ia ON ia.l_partkey = r.part_a
JOIN item ib ON ib.l_partkey = r.part_b
CROSS JOIN tot t
WHERE r.rank <= 500
"""


@register("q111_basket_lift", oracle=_Q111_ORACLE, tags=("bi", "association", "topk"))
def q111_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import top_k

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    tot = op.agg(F.countDistinct("l_orderkey").alias("n_baskets"))
    item = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    a, b = op.alias("a"), op.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ranked = top_k(pairs, [F.desc("n_ab"), "part_a", "part_b"], k=500)
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b"))
    n_ab = F.col("n_ab").cast("double")
    # ia/ib are NOT hinted: per-part counts scale with |part| (hinting
    # them was a driver-OOM promise at 100x — caught by the derived-
    # marker broadcast lint, r8). The broadcastable side is the top-500
    # `ranked` relation; AQE picks it at runtime from actual sizes.
    return (
        ranked.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "rank",
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(n_ab / F.col("n_baskets"), 6).alias("support"),
            F.round(n_ab / F.col("n_a"), 6).alias("confidence"),
            F.round(
                n_ab * F.col("n_baskets") / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# q123: triangle enumeration on the co-purchase graph — the graph-
# analytics step after pair mining (q79): parts A,B,C that all co-occur
# pairwise (support >= 2 orders) form a merchandising bundle candidate.
# Edges are oriented a<b by part id, so each triangle is enumerated
# exactly once as (a<b<c) with no permutation dedup. The triple join is
# edge⋈edge⋈edge over the MINED edge table (thousands of rows after
# support pruning, broadcast-eligible) — never over raw lineitem.
# Scale refinement when the edge table itself is huge: re-orient edges
# from low- to high-DEGREE endpoint instead of by id (the standard
# triangle-counting trick bounding per-vertex work by sqrt(|E|));
# id-orientation is correct at any scale, degree-orientation only
# changes the join's work distribution.
# ---------------------------------------------------------------------------

_Q123_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT e1.pa AS part_a, e1.pb AS part_b, e2.pb AS part_c
FROM e e1
JOIN e e2 ON e2.pa = e1.pb
JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
"""


@register("q123_copurchase_triangles", oracle=_Q123_ORACLE, tags=("graph", "bi", "self-join"))
def q123_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("pa", "pb")
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    return (
        e1.join(e2, F.col("e2.pa") == F.col("e1.pb"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa")) & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .select(
            F.col("e1.pa").alias("part_a"),
            F.col("e1.pb").alias("part_b"),
            F.col("e2.pb").alias("part_c"),
        )
    )


# ---------------------------------------------------------------------------
# q215: TPC-H Q5 (local supplier volume) — the canonical multi-join
# plan stressor: region⋈nation⋈customer⋈orders⋈lineitem⋈supplier with
# the CORRELATION predicate c_nationkey = s_nationkey (customer and
# supplier must share a nation), a region filter and a two-year date
# window (the testdata's order dates start 1995, so TPC-H's 1994 year
# is shifted to 1995-96 to keep the result non-vacuous at sf0.001). The join graph is what CBO join-ordering papers benchmark;
# on Spark the right shape is: dims (region/nation/supplier-nation)
# broadcast, facts (orders⋈lineitem) shuffled once on orderkey, the
# supplier attach keyed on (suppkey) with the nation-equality applied
# as a post-join filter on two broadcast-provided columns. Revenue is
# the exact decimal Σ l_extendedprice·(1−l_discount).
# ---------------------------------------------------------------------------

_Q215_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1995-01-01'
  AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
"""


@register("q215_tpch_q5_local_supplier", oracle=_Q215_ORACLE, tags=("join", "agg", "tpch"))
def q215_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")

    dims = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    # nation×region is a fixed-cardinality dim (25×5) — broadcast is
    # size-safe at any SF. customer and supplier SCALE WITH the fact, so
    # they get NO explicit broadcast hint (VERDICT r5: a forced
    # broadcast of an SF-scaling relation is a driver OOM at 100×; AQE
    # converts these to broadcast joins at runtime while they're small,
    # and falls back to shuffle joins when they aren't).
    cust = customer.join(
        F.broadcast(dims), customer.c_nationkey == dims.n_nationkey
    ).select("c_custkey", "c_nationkey", "n_name")
    # facts shuffle once on orderkey; the customer attach shuffles on
    # custkey (or broadcasts, AQE's call at runtime)
    fact = lineitem.join(
        orders.select("o_orderkey", "o_custkey"),
        lineitem.l_orderkey == orders.o_orderkey,
    ).join(cust, F.col("o_custkey") == F.col("c_custkey"))
    # supplier attach by suppkey, nation correlation as a post-join
    # filter over two already-present columns
    j = fact.join(
        supplier.select("s_suppkey", "s_nationkey"),
        F.col("l_suppkey") == F.col("s_suppkey"),
    ).filter(F.col("s_nationkey") == F.col("c_nationkey"))
    rev = dmoney("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    return j.groupBy("n_name").agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
    )
