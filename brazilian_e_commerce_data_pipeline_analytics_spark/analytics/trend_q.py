"""Per-group trend estimation: closed-form OLS over monthly revenue.

The reference's reporting layer stops at YoY deltas
(``reporting.py:335-363``); the natural next BI ask is "which segments
are trending up" — a least-squares slope per group. Spark and DuckDB
both ship ``regr_slope``, but their float accumulation order differs
run to run, so this module computes the closed form from EXACT decimal
sums instead (the repo's dsum discipline): slope and intercept become
pure functions of a handful of exact integers/decimals, evaluated in a
pinned order — bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.compat import dmoney
from ..registry import register

# ---------------------------------------------------------------------------
# q146: revenue trend per nation.
#
# Two-level plan: (nation, month) revenue agg -> per-nation closed-form
# OLS over the month series. Both aggs are map-side combinable; the
# second input is |nations| x |months| rows, so the final agg is tiny.
# x = absolute month index, y = monthly revenue (exact decimal sum
# surfaced as double). All five OLS sums (n, Σx, Σy, Σxy, Σx²) are
# exact (integer or decimal), and the slope/intercept doubles are
# derived from them in one pinned expression order.
# ---------------------------------------------------------------------------

_Q146_ORACLE = """
WITH m AS (
  SELECT n.n_name AS nation,
         (year(o.o_orderdate) - 1990) * 12 + month(o.o_orderdate) AS mi,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
s AS (
  SELECT nation,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(mi) AS DOUBLE) AS sx,
         CAST(SUM(CAST(rev AS DECIMAL(28,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(mi * rev AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
         CAST(SUM(mi * mi) AS DOUBLE) AS sxx,
         COUNT(*) AS n_months
  FROM m GROUP BY nation
)
SELECT nation, CAST(n_months AS INT) AS n_months,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS intercept
FROM s
"""


@register("q146_revenue_trend_ols", oracle=_Q146_ORACLE, tags=("bi", "regression", "agg"))
def q146_revenue_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    mi = (F.year("o_orderdate") - 1990) * 12 + F.month("o_orderdate")
    m = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), mi.alias("mi"))
        .agg(F.sum(dmoney("o_totalprice")).cast("double").alias("rev"))
    )
    s = m.groupBy("nation").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("mi").cast("double").alias("sx"),
        F.sum(F.col("rev").cast("decimal(28,6)")).cast("double").alias("sy"),
        F.sum((F.col("mi") * F.col("rev")).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("mi") * F.col("mi")).cast("double").alias("sxx"),
        F.count(F.lit(1)).cast("int").alias("n_months"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "nation",
        "n_months",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


# ---------------------------------------------------------------------------
# q149: longest consecutive-day activity streak per user — the
# gaps-and-islands pattern exposed as a query (q141 uses the same
# machinery internally for BPE run parity). Distinct activity days per
# user; day_index - dense_rank is constant within a consecutive run, so
# one groupBy over (user, island) yields run lengths and a second agg
# picks each user's longest (earliest start breaks ties
# deterministically).
#
# Scale: both windows partition by user_id (no global window); the
# distinct-day relation is the only shuffle producer and is map-side
# combinable. Output is top-20 streak holders (total order: length
# desc, user asc) via TakeOrderedAndProject.
# ---------------------------------------------------------------------------

_Q149_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
runs AS (
  SELECT user_id, d,
         CAST(d - INTERVAL (dense_rank() OVER (PARTITION BY user_id ORDER BY d)) DAY
              AS DATE) AS island
  FROM days
),
streaks AS (
  SELECT user_id, MIN(d) AS streak_start, COUNT(*) AS streak_days
  FROM runs GROUP BY user_id, island
),
best AS (
  SELECT user_id, streak_start, streak_days,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY streak_days DESC, streak_start) AS rn
  FROM streaks
)
SELECT user_id, streak_start, streak_days
FROM best WHERE rn = 1
ORDER BY streak_days DESC, user_id LIMIT 20
"""


@register("q149_longest_streaks", oracle=_Q149_ORACLE, tags=("bi", "window", "islands"))
def q149_longest_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    runs = days.withColumn(
        "island", F.date_sub(F.col("d"), F.dense_rank().over(w))
    )
    streaks = runs.groupBy("user_id", "island").agg(
        F.min("d").alias("streak_start"), F.count(F.lit(1)).alias("streak_days")
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.desc("streak_days"), "streak_start"
    )
    best = (
        streaks.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .drop("rn", "island")
    )
    return best.orderBy(F.desc("streak_days"), "user_id").limit(20)


# ---------------------------------------------------------------------------
# q151: time-series gap filling with forward fill — resample events to
# a dense hourly grid per event_type and carry the last observed value
# across empty hours (the standard prep before any time-series model).
#
# The dense grid is a DISTRIBUTED spine: one 2-row agg finds the time
# range, sequence()+explode generates the hours in-plan (operator S5's
# rule — never a driver-side date loop), and a cross join with the
# tiny event_type dim lands the (type, hour) grid. Observed hours LEFT
# JOIN onto the grid; the carry is last(value, ignorenulls) over a
# per-type window ordered by hour — partitioned by event_type, so no
# global window appears. Leading gaps (before a type's first
# observation) stay NULL by definition in both engines.
# ---------------------------------------------------------------------------

_Q151_ORACLE = """
WITH rng AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
),
hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start FROM rng
),
types AS (SELECT DISTINCT event_type FROM events),
grid AS (SELECT event_type, hour_start FROM types CROSS JOIN hours),
obs AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_start,
         COUNT(*) AS n_events,
         round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 6) AS v
  FROM events GROUP BY 1, 2
)
SELECT g.event_type, g.hour_start,
       COALESCE(o.n_events, 0) AS n_events,
       (o.hour_start IS NULL) AS is_gap,
       last_value(o.v IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.hour_start
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled_value
FROM grid g LEFT JOIN obs o
  ON g.event_type = o.event_type AND g.hour_start = o.hour_start
"""


@register("q151_gap_fill_ffill", oracle=_Q151_ORACLE, tags=("timeseries", "window", "spine"))
def q151_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    rng = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = rng.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(hours)
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_start")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 6
        ).alias("v"),
    )
    joined = grid.join(
        obs.withColumnRenamed("hour_start", "obs_hour"),
        (grid.event_type == obs.event_type)
        & (grid.hour_start == F.col("obs_hour")),
        "left",
    ).select(
        grid.event_type,
        grid.hour_start,
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("obs_hour").isNull().alias("is_gap"),
        "v",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "hour_start",
        "n_events",
        "is_gap",
        F.last("v", ignorenulls=True).over(w).alias("filled_value"),
    )


# ---------------------------------------------------------------------------
# q154: quantile drift monitor — weekly p50/p95 of order totals with
# week-over-week deltas and a drift flag, the standard data-quality
# watch on a continuously-loaded fact table. Exact percentiles ride
# q27's proven cross-engine identity (Spark percentile() and DuckDB
# quantile_cont() interpolate doubles bit-identically); the lag runs
# over the POST-AGGREGATION weekly series (hundreds of rows), so the
# unpartitioned window is a deliberate tiny-input exception to the
# no-global-window rule.
# ---------------------------------------------------------------------------

_DRIFT_THRESHOLD = 5000.0

_Q154_ORACLE = f"""
WITH wk AS (
  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
         COUNT(*) AS n_orders,
         quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS p50,
         quantile_cont(CAST(o_totalprice AS DOUBLE), 0.95) AS p95
  FROM orders GROUP BY 1
)
SELECT week_start, n_orders, p50, p95,
       round(p50 - lag(p50) OVER (ORDER BY week_start), 6) AS p50_drift,
       COALESCE(abs(p50 - lag(p50) OVER (ORDER BY week_start))
                  > {_DRIFT_THRESHOLD}, FALSE) AS drift_flag
FROM wk
"""


@register("q154_quantile_drift", oracle=_Q154_ORACLE, tags=("quality", "percentile", "monitoring"))
def q154_quantile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    wk = o.groupBy(
        F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week_start")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("percentile(CAST(o_totalprice AS DOUBLE), 0.5)").alias("p50"),
        F.expr("percentile(CAST(o_totalprice AS DOUBLE), 0.95)").alias("p95"),
    )
    w = Window.orderBy("week_start")
    lagged = F.lag("p50").over(w)
    return wk.select(
        "week_start",
        "n_orders",
        "p50",
        "p95",
        F.round(F.col("p50") - lagged, 6).alias("p50_drift"),
        F.coalesce(
            F.abs(F.col("p50") - lagged) > _DRIFT_THRESHOLD, F.lit(False)
        ).alias("drift_flag"),
    )


# ---------------------------------------------------------------------------
# q161: ABC / Pareto classification — rank products by revenue and cut
# the cumulative share at 80% (class A) and 95% (class B), the
# standard inventory-concentration analysis. The global running total
# does NOT use an unpartitioned window: it rides distributed_cumsum
# (q88's two-level prefix sum) over a composite DECIMAL(38,0) sort key
# encoding (revenue DESC, partkey ASC) — so the plan survives a
# part dimension of any size. Revenue cumulates as exact cents
# (BIGINT), and the share is rounded before the class cut so the
# boundary comparison is engine-identical. (Cent totals stay
# double-exact below 2^53 ≈ $90 trillion — beyond any catalog.)
# ---------------------------------------------------------------------------

_Q161_ORACLE = """
WITH pp AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS v100
  FROM lineitem GROUP BY 1
),
c AS (
  SELECT l_partkey, v100,
         SUM(v100) OVER (ORDER BY v100 DESC, l_partkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum100,
         SUM(v100) OVER () AS tot
  FROM pp
),
k AS (
  SELECT CASE WHEN round(CAST(cum100 AS DOUBLE) / tot, 6) <= 0.8 THEN 'A'
              WHEN round(CAST(cum100 AS DOUBLE) / tot, 6) <= 0.95 THEN 'B'
              ELSE 'C' END AS abc_class,
         v100
  FROM c
)
SELECT abc_class, COUNT(*) AS n_parts,
       CAST(SUM(v100) AS DOUBLE) / 100 AS class_revenue
FROM k GROUP BY 1
"""


@register("q161_abc_classification", oracle=_Q161_ORACLE, tags=("bi", "pareto", "prefix-sum"))
def q161_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import distributed_cumsum

    li = load_table(spark, sf_dir, "lineitem")
    pp = li.groupBy("l_partkey").agg(
        (F.sum(dmoney("l_extendedprice")) * 100).cast("bigint").alias("v100")
    )
    skey = (
        (F.lit(10**12) - F.col("v100")).cast("decimal(38,0)") * F.lit(10**10)
        + F.col("l_partkey")
    ).alias("skey")
    keyed = pp.select("l_partkey", "v100", skey)
    cum = distributed_cumsum(keyed, "skey", "v100", out="cum100")
    tot = pp.agg(F.sum("v100").alias("tot"))
    share = F.round(F.col("cum100").cast("double") / F.col("tot"), 6)
    k = cum.crossJoin(F.broadcast(tot)).select(
        F.when(share <= 0.8, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "v100",
    )
    return k.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.sum("v100").cast("double") / 100).alias("class_revenue"),
    )


# ---------------------------------------------------------------------------
# q162: event transition matrix — first-order Markov counts over each
# user's event stream (the sequence-mining staple behind "what do
# users do next"). lag() per user ordered by (ts, event_id) — a total
# order, so ties can't flip pairs — then one groupBy over (prev, cur)
# with per-source-state probabilities. Windows partition by user;
# state per user = one previous row.
# ---------------------------------------------------------------------------

_Q162_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS cur_type FROM seq WHERE prev_type IS NOT NULL
)
SELECT prev_type, cur_type, COUNT(*) AS n_transitions,
       round(COUNT(*) / SUM(COUNT(*)) OVER (PARTITION BY prev_type), 6) AS prob
FROM pairs GROUP BY 1, 2
"""


@register("q162_event_transitions", oracle=_Q162_ORACLE, tags=("events", "sequence", "window"))
def q162_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("cur_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "cur_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wsrc = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "cur_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wsrc), 6
        ).alias("prob"),
    )


# ---------------------------------------------------------------------------
# q163: exponential smoothing — per-type daily totals folded through
# s_t = alpha*y_t + (1-alpha)*s_{t-1} (s_0 = first observation), the
# simplest forecasting baseline. The fold is a LEFT fold over the
# time-ordered series in BOTH engines (Spark F.aggregate over the
# sorted tail, DuckDB list_reduce over the same ordered list), so the
# float sequence is bit-identical; only the final smoothed level is
# rounded. Series live per group (one array per event_type) — at scale
# this is groupBy + sorted collect_list bounded by days-per-type, the
# same envelope as the chunker.
# ---------------------------------------------------------------------------

_SMOOTH_ALPHA = 0.3

_Q163_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 6) AS y
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT event_type, list(y ORDER BY d) AS ys, COUNT(*) AS n_days,
         max_by(y, d) AS last_value
  FROM daily GROUP BY 1
)
SELECT event_type, CAST(n_days AS INT) AS n_days, last_value,
       round(list_reduce(ys,
             (acc, x) -> acc * {1 - _SMOOTH_ALPHA} + x * {_SMOOTH_ALPHA}), 6)
         AS smoothed
FROM series
"""


@register("q163_exp_smoothing", oracle=_Q163_ORACLE, tags=("timeseries", "forecast", "fold"))
def q163_exp_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 6
        ).alias("y")
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "y"))), lambda s: s["y"]
        ).alias("ys"),
        F.count(F.lit(1)).cast("int").alias("n_days"),
        F.max_by("y", "d").alias("last_value"),
    )
    smoothed = F.aggregate(
        F.slice("ys", 2, F.size("ys") - 1),
        F.element_at("ys", 1),
        lambda acc, x: acc * (1 - _SMOOTH_ALPHA) + x * _SMOOTH_ALPHA,
    )
    return series.select(
        "event_type",
        "n_days",
        "last_value",
        F.round(smoothed, 6).alias("smoothed"),
    )


# ---------------------------------------------------------------------------
# q164: join-key skew report — the diagnostic you run BEFORE choosing
# between a plain join, AQE skew splitting, and the salted operators
# (q36/q112): per-key row counts summarized as a Gini concentration
# coefficient plus the top-5 key share. The Gini rank index comes from
# distributed_cumsum over a composite (count asc, key asc) decimal
# key — no unpartitioned row_number anywhere — and all sums are exact
# (decimal) before ONE pinned double expression at the end.
# ---------------------------------------------------------------------------

_Q164_ORACLE = """
WITH kc AS (
  SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY 1
),
r AS (
  SELECT c, row_number() OVER (ORDER BY c, k) AS i FROM kc
),
t AS (
  SELECT COUNT(*) AS n, SUM(c) AS s,
         SUM(CAST(i AS DECIMAL(38,0)) * c) AS si
  FROM r
),
top AS (
  SELECT SUM(c) AS t5 FROM (SELECT c FROM kc ORDER BY c DESC, k LIMIT 5)
)
SELECT CAST(n AS BIGINT) AS n_keys,
       CAST(s AS BIGINT) AS n_rows,
       round(CAST(t5 AS DOUBLE) / CAST(s AS DOUBLE), 6) AS top5_share,
       round(2 * CAST(si AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE), 6) AS gini
FROM t, top
"""


@register("q164_skew_report", oracle=_Q164_ORACLE, tags=("diagnostics", "skew", "prefix-sum"))
def q164_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import distributed_cumsum

    o = load_table(spark, sf_dir, "orders")
    kc = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    skey = (
        F.col("c").cast("decimal(38,0)") * F.lit(10**10) + F.col("k")
    ).alias("skey")
    idx = distributed_cumsum(
        kc.select("k", "c", skey, F.lit(1).alias("one")), "skey", "one", out="i"
    )
    t = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("c")).alias("si"),
    )
    top = (
        kc.orderBy(F.desc("c"), "k")
        .limit(5)
        .agg(F.sum("c").alias("t5"))
    )
    n, s = F.col("n").cast("double"), F.col("s").cast("double")
    return t.crossJoin(top).select(
        F.col("n").cast("bigint").alias("n_keys"),
        F.col("s").cast("bigint").alias("n_rows"),
        F.round(F.col("t5").cast("double") / s, 6).alias("top5_share"),
        F.round(
            2 * F.col("si").cast("double") / (n * s) - (n + 1) / n, 6
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# q165: event debounce — drop repeat (user, type) events arriving
# within 5 seconds of the previous event, the standard double-click /
# retry cleanup, with creeping-island semantics (a new island starts
# where the gap from the PREVIOUS event exceeds the threshold —
# identical to session_window gap semantics, one window in both
# engines; only each island's first row is kept).
#
# The natural stream is too sparse to debounce (zero drops at every
# sf — the ADVICE-r1 vacuity trap), so the query simulates the
# at-least-once reality the op exists for: every 7th event also
# arrives as a retry ECHO 2 seconds later (same user/type, echoed
# id). Both engines replay the union, and the echoes are exactly what
# the debounce must drop.
# ---------------------------------------------------------------------------

_DEBOUNCE_S = 5

_Q165_ORACLE = f"""
WITH src AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
  UNION ALL
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) + INTERVAL 2 SECOND,
         event_id + 10000000
  FROM events WHERE event_id % 7 = 0
),
g AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN epoch_us(ts)
                   - epoch_us(lag(ts)
                       OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id)) <= {_DEBOUNCE_S} * 1000000
              THEN 0 ELSE 1 END AS new_island
  FROM src
),
isl AS (
  SELECT user_id, event_type,
         SUM(new_island) OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS island,
         new_island
  FROM g
)
SELECT user_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(new_island) AS BIGINT) AS n_kept
FROM isl GROUP BY 1, 2
"""


@register("q165_event_debounce", oracle=_Q165_ORACLE, tags=("events", "dedup", "islands"))
def q165_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    echoes = ev.filter(F.col("event_id") % 7 == 0).select(
        "user_id",
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 2 SECONDS")).alias("ts"),
        (F.col("event_id") + 10000000).alias("event_id"),
    )
    src = ev.unionByName(echoes)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    # Gap test on microsecond INTEGERS on both engines (unix_micros /
    # epoch_us): unix_timestamp truncates to whole seconds while DuckDB
    # epoch() keeps fractions, so a gap in (G, G+1) would silently
    # diverge on regenerated fixtures (ADVICE r3).
    g = src.withColumn(
        "new_island",
        F.when(
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            <= _DEBOUNCE_S * 1_000_000,
            0,
        ).otherwise(1),
    )
    return g.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("new_island").alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# q166: top session paths — the most frequent 3-step event sequences
# WITHIN a 30-minute-gap session (q162's transition pairs deepened to
# path mining with session boundaries). Session ids come from the
# island cumsum per user; the two lags then partition by
# (user, session) so paths never span a session break. Top-10 by a
# total order via TakeOrderedAndProject.
# ---------------------------------------------------------------------------

_SESSION_GAP_S = 1800

_Q166_ORACLE = f"""
WITH g AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
         CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                   - epoch_us(lag(CAST(ts AS TIMESTAMP))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   <= {_SESSION_GAP_S} * 1000000
              THEN 0 ELSE 1 END AS ns
  FROM events
),
s AS (
  SELECT user_id, event_type, ts, event_id,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
),
p AS (
  SELECT lag(event_type, 2) OVER w AS e1,
         lag(event_type, 1) OVER w AS e2,
         event_type AS e3
  FROM s
  WINDOW w AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
)
SELECT e1, e2, e3, COUNT(*) AS n_paths
FROM p WHERE e1 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n_paths DESC, e1, e2, e3
LIMIT 10
"""


@register("q166_top_session_paths", oracle=_Q166_ORACLE, tags=("events", "sequence", "sessionize"))
def q166_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap test on both engines (see q165 / ADVICE r3)
    s = ev.withColumn(
        "ns",
        F.when(
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wu))
            <= _SESSION_GAP_S * 1_000_000,
            0,
        ).otherwise(1),
    ).withColumn(
        "sid",
        F.sum("ns").over(wu.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    p = s.select(
        F.lag("event_type", 2).over(ws).alias("e1"),
        F.lag("event_type", 1).over(ws).alias("e2"),
        F.col("event_type").alias("e3"),
    ).filter(F.col("e1").isNotNull())
    return (
        p.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), "e1", "e2", "e3")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q167: A/B experiment analysis — assignment by deterministic user
# bucket (user_id % 2), conversion = "did the user make a high-value
# purchase" (value > 95 — plain "any purchase" saturates to a pooled
# rate of 1.0 on this stream, a 0/0 z-statistic), and the
# two-proportion pooled z-statistic with a 1.96 significance gate.
# The rates and z ride exact integer counts through ONE pinned double
# expression (sqrt of products of exact-count ratios — identical IEEE
# sequence in both engines), so even the hypothesis test is
# value-exact. This is the experiment-readout every growth team runs;
# at scale it is two tiny aggregates over a broadcastable assignment.
# ---------------------------------------------------------------------------

_Q167_ORACLE = """
WITH u AS (
  SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
         MAX(CASE WHEN event_type = 'purchase' AND value > 95 THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY 1, 2
),
v AS (
  SELECT variant, COUNT(*) AS n_users, SUM(converted) AS n_conv
  FROM u GROUP BY 1
),
w AS (
  SELECT MAX(CASE WHEN variant = 0 THEN n_users END) AS n0,
         MAX(CASE WHEN variant = 0 THEN n_conv END) AS c0,
         MAX(CASE WHEN variant = 1 THEN n_users END) AS n1,
         MAX(CASE WHEN variant = 1 THEN n_conv END) AS c1
  FROM v
)
SELECT CAST(n0 AS BIGINT) AS n_control, CAST(c0 AS BIGINT) AS conv_control,
       CAST(n1 AS BIGINT) AS n_treat, CAST(c1 AS BIGINT) AS conv_treat,
       round(CAST(c0 AS DOUBLE) / n0, 6) AS rate_control,
       round(CAST(c1 AS DOUBLE) / n1, 6) AS rate_treat,
       round((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
             / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1)), 6) AS z_score,
       abs((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
           / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                  * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                  * (1.0 / n0 + 1.0 / n1))) > 1.96 AS significant
FROM w
"""


@register("q167_ab_test_analysis", oracle=_Q167_ORACLE, tags=("experiment", "stats", "events"))
def q167_ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy(
        "user_id", (F.col("user_id") % 2).cast("int").alias("variant")
    ).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 95), 1
            ).otherwise(0)
        ).alias("converted")
    )
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("converted").alias("n_conv")
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_conv"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_conv"))).alias("c1"),
    )
    n0, c0 = F.col("n0").cast("double"), F.col("c0").cast("double")
    n1, c1 = F.col("n1").cast("double"), F.col("c1").cast("double")
    pooled = (c0 + c1) / (F.col("n0") + F.col("n1"))
    z = (c1 / n1 - c0 / n0) / F.sqrt(
        pooled * (1 - pooled) * (1.0 / n0 + 1.0 / n1)
    )
    return w.select(
        F.col("n0").cast("bigint").alias("n_control"),
        F.col("c0").cast("bigint").alias("conv_control"),
        F.col("n1").cast("bigint").alias("n_treat"),
        F.col("c1").cast("bigint").alias("conv_treat"),
        F.round(c0 / n0, 6).alias("rate_control"),
        F.round(c1 / n1, 6).alias("rate_treat"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > 1.96).alias("significant"),
    )


# ---------------------------------------------------------------------------
# q169: funnel conversion latency — how long from a session's first
# view to its first subsequent purchase (q113 counts funnel DEPTH;
# this measures its SPEED, the metric latency SLAs are written
# against). Sessions reuse the 30-min island machinery; per session,
# the first view and the first purchase AFTER it come from
# conditional MIN aggregates — no self-join. Exact latency
# percentiles ride the percentile()/quantile_cont identity (q27).
# ---------------------------------------------------------------------------

_Q169_ORACLE = f"""
WITH g AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
         CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                   - epoch_us(lag(CAST(ts AS TIMESTAMP))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   <= {_SESSION_GAP_S} * 1000000
              THEN 0 ELSE 1 END AS ns
  FROM events
),
s AS (
  SELECT user_id, event_type, ts,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
),
f AS (
  SELECT user_id, sid,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
  FROM s GROUP BY 1, 2
),
conv AS (
  SELECT f.user_id, f.sid,
         epoch_us(MIN(CASE WHEN s.event_type = 'purchase'
                            AND s.ts >= f.first_view THEN s.ts END))
           - epoch_us(f.first_view) AS latency_us
  FROM f JOIN s ON f.user_id = s.user_id AND f.sid = s.sid
  WHERE f.first_view IS NOT NULL
  GROUP BY f.user_id, f.sid, f.first_view
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_view_sessions,
       CAST(COUNT(latency_us) AS BIGINT) AS n_converted,
       quantile_cont(CAST(latency_us AS DOUBLE), 0.5) AS p50_us,
       quantile_cont(CAST(latency_us AS DOUBLE), 0.9) AS p90_us
FROM conv
"""


@register("q169_funnel_latency", oracle=_Q169_ORACLE, tags=("events", "funnel", "percentile"))
def q169_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap test on both engines (see q165 / ADVICE r3)
    s = ev.withColumn(
        "ns",
        F.when(
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wu))
            <= _SESSION_GAP_S * 1_000_000,
            0,
        ).otherwise(1),
    ).withColumn(
        "sid", F.sum("ns").over(wu.rowsBetween(Window.unboundedPreceding, 0))
    )
    fv = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(
        Window.partitionBy("user_id", "sid")
    )
    with_fv = s.withColumn("first_view", fv).filter(
        F.col("first_view").isNotNull()
    )
    # microsecond integers on BOTH sides: Spark unix_timestamp truncates
    # to seconds while DuckDB epoch() keeps fractions — unix_micros /
    # epoch_us are the exact, engine-identical clock
    conv = with_fv.groupBy("user_id", "sid", "first_view").agg(
        (
            F.unix_micros(
                F.min(
                    F.when(
                        (F.col("event_type") == "purchase")
                        & (F.col("ts") >= F.col("first_view")),
                        F.col("ts"),
                    )
                )
            )
            - F.unix_micros("first_view")
        ).alias("latency_us")
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_view_sessions"),
        F.count("latency_us").alias("n_converted"),
        # exact interpolated microseconds: integer-or-x.5 values are
        # exactly representable, so no rounding (a /1e6 + round(,6) form
        # lands on half-up boundaries that the two engines can tip
        # differently by one ulp)
        F.expr("percentile(CAST(latency_us AS DOUBLE), 0.5)").alias("p50_us"),
        F.expr("percentile(CAST(latency_us AS DOUBLE), 0.9)").alias("p90_us"),
    )


# ---------------------------------------------------------------------------
# q171: mergeable statistics — the algebra that makes every partial
# aggregation in this repo scale: per-shard (n, Σx, Σx²) partials
# merge by plain addition, and mean/variance come off the MERGED sums
# only at the end. The query computes partials per (event_type,
# shard), merges them relationally, and the oracle computes the same
# statistics DIRECTLY — equality proves merge-then-finalize ==
# compute-globally, which is exactly the property a 1000-executor
# map-side combine relies on. Sums are exact decimals (value has 2dp,
# its square 4dp — both exactly representable), so the proof is
# bit-level, not approximate.
# ---------------------------------------------------------------------------

_Q171_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6)
         AS mean_value,
       round((CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
              - CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                * CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*))
             / COUNT(*), 6) AS var_value
FROM events GROUP BY 1
"""


@register("q171_mergeable_stats", oracle=_Q171_ORACLE, tags=("agg", "algebra", "events"))
def q171_mergeable_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    partials = ev.groupBy(
        "event_type", (F.col("event_id") % 4).alias("shard")
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("psx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,6)")).alias(
            "psxx"
        ),
    )
    merged = partials.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.sum("psx").alias("sx"),
        F.sum("psxx").alias("sxx"),
    )
    sx, sxx = F.col("sx").cast("double"), F.col("sxx").cast("double")
    n = F.col("n")
    return merged.select(
        "event_type",
        "n",
        F.round(sx / n, 6).alias("mean_value"),
        F.round((sxx - sx * sx / n) / n, 6).alias("var_value"),
    )


# ---------------------------------------------------------------------------
# q178: exact correlation matrix — pairwise Pearson correlation between
# lineitem measures (quantity, extendedprice, discount) per returnflag.
# ``corr()`` built-ins accumulate running doubles whose value depends on
# partition merge order, so instead the moments are summed as EXACT
# decimals (inputs are 2dp values; decimal products are exact) and the
# closed form corr = (n·Σxy − ΣxΣy)/√((n·Σx²−Σx²)(n·Σy²−Σy²)) is
# evaluated once on the merged sums — the same merge-then-finalize
# algebra q171 proves, applied to second moments. One map-side-combined
# aggregation, no second pass.
# ---------------------------------------------------------------------------

_Q178_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp,
         SUM(CAST(l_discount AS DECIMAL(18,2))) AS sd,
         SUM(CAST(l_quantity AS DECIMAL(18,2))
             * CAST(l_quantity AS DECIMAL(18,2))) AS sqq,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_extendedprice AS DECIMAL(18,2))) AS spp,
         SUM(CAST(l_discount AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(18,2))) AS sdd,
         SUM(CAST(l_quantity AS DECIMAL(18,2))
             * CAST(l_extendedprice AS DECIMAL(18,2))) AS sqp,
         SUM(CAST(l_quantity AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(18,2))) AS sqd,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(18,2))) AS spd
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_items,
       round((n * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
             / sqrt((n * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                    * (n * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))),
             6) AS corr_qty_price,
       round((n * CAST(sqd AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE))
             / sqrt((n * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                    * (n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))),
             6) AS corr_qty_disc,
       round((n * CAST(spd AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sd AS DOUBLE))
             / sqrt((n * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
                    * (n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))),
             6) AS corr_price_disc
FROM s
"""


@register("q178_corr_matrix", oracle=_Q178_ORACLE, tags=("stats", "agg", "exact"))
def q178_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(18,2)").alias("q"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("p"),
        F.col("l_discount").cast("decimal(18,2)").alias("d"),
    )
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum("p").alias("sp"),
        F.sum("d").alias("sd"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum(F.col("p") * F.col("p")).alias("spp"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("q") * F.col("p")).alias("sqp"),
        F.sum(F.col("q") * F.col("d")).alias("sqd"),
        F.sum(F.col("p") * F.col("d")).alias("spd"),
    )

    def _corr(sxy: str, sx: str, sy: str, sxx: str, syy: str):
        n = F.col("n").cast("double")
        xy = F.col(sxy).cast("double")
        x, y = F.col(sx).cast("double"), F.col(sy).cast("double")
        xx, yy = F.col(sxx).cast("double"), F.col(syy).cast("double")
        return F.round(
            (n * xy - x * y) / F.sqrt((n * xx - x * x) * (n * yy - y * y)), 6
        )

    return s.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n_items"),
        _corr("sqp", "sq", "sp", "sqq", "spp").alias("corr_qty_price"),
        _corr("sqd", "sq", "sd", "sqq", "sdd").alias("corr_qty_disc"),
        _corr("spd", "sp", "sd", "spp", "sdd").alias("corr_price_disc"),
    )


# ---------------------------------------------------------------------------
# q189: winsorized statistics — per-segment p05/p95 clipping of order
# totals, the standard outlier-robust normalization before training on
# monetary features. Clip boundaries are the exact interpolated
# percentiles (q27 identity) rounded to 2dp and cast back to DECIMAL so
# the clipped column stays EXACT: interior values keep their 2dp
# decimals, clipped values take the 2dp boundary — the final mean is a
# decimal sum, order-independent. Two aggregation passes with the 5-row
# boundary relation broadcast back; no window over segment-sized
# partitions (that would funnel each segment through one task).
# ---------------------------------------------------------------------------

_Q189_ORACLE = """
WITH j AS (
  SELECT c.c_mktsegment AS segment, CAST(o.o_totalprice AS DECIMAL(18,2)) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
b AS (
  SELECT segment,
         CAST(round(quantile_cont(CAST(x AS DOUBLE), 0.05), 2) AS DECIMAL(18,2)) AS lo,
         CAST(round(quantile_cont(CAST(x AS DOUBLE), 0.95), 2) AS DECIMAL(18,2)) AS hi
  FROM j GROUP BY 1
)
SELECT j.segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN j.x < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
       CAST(SUM(CASE WHEN j.x > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
       round(CAST(SUM(CASE WHEN j.x < b.lo THEN b.lo
                           WHEN j.x > b.hi THEN b.hi
                           ELSE j.x END) AS DOUBLE) / COUNT(*), 6)
         AS winsorized_mean
FROM j JOIN b USING (segment)
GROUP BY 1
"""


@register("q189_winsorized_stats", oracle=_Q189_ORACLE, tags=("stats", "percentile", "robust"))
def q189_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
    )
    b = j.groupBy("segment").agg(
        F.round(F.percentile(F.col("x").cast("double"), F.lit(0.05)), 2)
        .cast("decimal(18,2)")
        .alias("lo"),
        F.round(F.percentile(F.col("x").cast("double"), F.lit(0.95)), 2)
        .cast("decimal(18,2)")
        .alias("hi"),
    )
    clipped = (
        j.join(F.broadcast(b), "segment")
        .withColumn(
            "xw",
            F.when(F.col("x") < F.col("lo"), F.col("lo"))
            .when(F.col("x") > F.col("hi"), F.col("hi"))
            .otherwise(F.col("x")),
        )
    )
    return clipped.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("x") < F.col("lo"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clip_lo"),
        F.sum(F.when(F.col("x") > F.col("hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clip_hi"),
        F.round(
            F.sum("xw").cast("double") / F.count(F.lit(1)), 6
        ).alias("winsorized_mean"),
    )


# ---------------------------------------------------------------------------
# q191: PSI drift monitor — Population Stability Index between two feed
# generations (1995 vs 1996 order totals), the standard "has my feature
# distribution shifted" gate run before retraining. q154 flags drift
# per-quantile; PSI collapses the whole distribution into one audited
# number: Σ (p_i − q_i)·ln(p_i / q_i) over FIXED-WIDTH bins (data-
# independent binning keeps the bins engine-identical; Laplace add-one
# smoothing keeps empty bins finite). Counts are exact integers; the
# smoothed ratios are pinned-order doubles; ln's 1-ulp skew is absorbed
# by round-6 on the final sum. One scan, one map-side-combined agg per
# generation, a 12-row join — nothing here scales with data volume
# except the scan.
# ---------------------------------------------------------------------------

_PSI_BIN_W = 50_000
_PSI_MAX_BIN = 9  # bins 0..9, top bin open-ended


_Q191_ORACLE = f"""
WITH binned AS (
  SELECT year(o_orderdate) AS yr,
         least(CAST(floor(CAST(o_totalprice AS DOUBLE) / {_PSI_BIN_W}) AS INT),
               {_PSI_MAX_BIN}) AS bin
  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
),
c AS (
  SELECT bin,
         SUM(CASE WHEN yr = 1995 THEN 1 ELSE 0 END) AS c_ref,
         SUM(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS c_new
  FROM binned GROUP BY 1
),
tot AS (SELECT SUM(c_ref) AS n_ref, SUM(c_new) AS n_new FROM c),
terms AS (
  SELECT c.bin,
         (c.c_ref + 1) / CAST(tot.n_ref + {_PSI_MAX_BIN + 1} AS DOUBLE) AS p,
         (c.c_new + 1) / CAST(tot.n_new + {_PSI_MAX_BIN + 1} AS DOUBLE) AS q
  FROM c CROSS JOIN tot
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
       round(SUM((p - q) * ln(p / q)), 6) AS psi,
       round(SUM((p - q) * ln(p / q)), 6) >= 0.1 AS drift_flag
FROM terms
"""


@register("q191_psi_drift", oracle=_Q191_ORACLE, tags=("stats", "drift", "monitoring"))
def q191_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    binned = o.select(
        F.year("o_orderdate").alias("yr"),
        F.least(
            F.floor(F.col("o_totalprice").cast("double") / _PSI_BIN_W).cast("int"),
            F.lit(_PSI_MAX_BIN),
        ).alias("bin"),
    )
    c = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("yr") == 1995, 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("yr") == 1996, 1).otherwise(0)).alias("c_new"),
    )
    tot = c.agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_new").alias("n_new")
    )
    k = _PSI_MAX_BIN + 1
    terms = c.crossJoin(F.broadcast(tot)).select(
        ((F.col("c_ref") + 1) / (F.col("n_ref") + k).cast("double")).alias("p"),
        ((F.col("c_new") + 1) / (F.col("n_new") + k).cast("double")).alias("q"),
    )
    psi = F.round(F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 6)
    return terms.agg(
        F.count(F.lit(1)).alias("n_bins"),
        psi.alias("psi"),
        (psi >= 0.1).alias("drift_flag"),
    )


# ---------------------------------------------------------------------------
# q193: session Markov entropy rate — how predictable each user's next
# event is, computed from the q162 transition machinery: for each source
# state s, H(s) = −Σ_t p(t|s)·ln p(t|s), plus the stationary-weighted
# corpus rate Σ_s w(s)·H(s). The behavioral-complexity summary used to
# segment bots (near-zero entropy) from organic users. Transition counts
# are exact integers over a total event order; probabilities and
# entropies are pinned-order doubles rounded once.
# ---------------------------------------------------------------------------

_Q193_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
tr AS (
  SELECT event_type AS src, nxt AS dst, COUNT(*) AS c
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
),
srcs AS (SELECT src, SUM(c) AS n FROM tr GROUP BY 1),
tot AS (SELECT SUM(c) AS n_all FROM tr),
h AS (
  SELECT tr.src, srcs.n,
         -SUM((tr.c / CAST(srcs.n AS DOUBLE))
              * ln(tr.c / CAST(srcs.n AS DOUBLE))) AS h_src
  FROM tr JOIN srcs USING (src) GROUP BY 1, 2
)
SELECT h.src,
       CAST(h.n AS BIGINT) AS n_transitions,
       round(h.h_src, 6) AS entropy,
       round(h.h_src * (h.n / CAST(tot.n_all AS DOUBLE)), 6) AS weighted_entropy
FROM h CROSS JOIN tot
"""


@register("q193_markov_entropy", oracle=_Q193_ORACLE, tags=("events", "stats", "sequence"))
def q193_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("nxt", F.lead("event_type").over(w)).filter(
        F.col("nxt").isNotNull()
    )
    tr = seq.groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst")).agg(
        F.count(F.lit(1)).alias("c")
    )
    srcs = tr.groupBy("src").agg(F.sum("c").alias("n"))
    tot = tr.agg(F.sum("c").alias("n_all"))
    p = F.col("c") / F.col("n").cast("double")
    h = (
        tr.join(F.broadcast(srcs), "src")
        .groupBy("src", "n")
        .agg((-F.sum(p * F.log(p))).alias("h_src"))
    )
    return h.crossJoin(F.broadcast(tot)).select(
        "src",
        F.col("n").cast("bigint").alias("n_transitions"),
        F.round("h_src", 6).alias("entropy"),
        F.round(
            F.col("h_src") * (F.col("n") / F.col("n_all").cast("double")), 6
        ).alias("weighted_entropy"),
    )


# ---------------------------------------------------------------------------
# q201: KL-divergence segment drift — the companion to q191's PSI:
# instead of one global drift number between two generations, measure
# how far EACH segment's (order-priority's) price distribution sits
# from the corpus-wide distribution, as forward KL(seg ‖ global),
# reverse KL(global ‖ seg), and their sum (Jeffreys divergence — the
# symmetric form monitoring dashboards alert on). Same fixed-width
# data-independent bins as q191 (engine-identical binning), and the
# same Laplace add-one smoothing so empty bins stay finite — which
# requires the DENSE bin spine: a zero-count bin still contributes
# ~(1/(n+10))·ln(...) to the sum, so both engines materialize all 10
# bins per segment via a generated spine, never just observed bins.
#
# Scale: one scan → map-side-combined (segment, bin) counts; the spine
# cross join is |segments|×|bins| rows (tiny, data-independent); global
# bin counts derive from the segment counts (no second scan). Doubles
# appear only in the final pinned KL expressions, rounded once.
# ---------------------------------------------------------------------------

_Q201_BIN_W = 50_000
_Q201_NBINS = 10  # bins 0..9, top bin open-ended

_Q201_ORACLE = f"""
WITH binned AS (
  SELECT o_orderpriority AS seg,
         least(CAST(floor(CAST(o_totalprice AS DOUBLE) / {_Q201_BIN_W}) AS INT),
               {_Q201_NBINS - 1}) AS bin
  FROM orders
),
c AS (SELECT seg, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2),
spine AS (
  SELECT seg, b.bin
  FROM (SELECT DISTINCT seg FROM c)
  CROSS JOIN (SELECT unnest(range({_Q201_NBINS})) AS bin) b
),
dense AS (
  SELECT spine.seg, spine.bin, COALESCE(c.c, 0) AS c
  FROM spine LEFT JOIN c ON spine.seg = c.seg AND spine.bin = c.bin
),
g AS (SELECT bin, SUM(c) AS gc FROM dense GROUP BY 1),
nseg AS (SELECT seg, SUM(c) AS n FROM dense GROUP BY 1),
tot AS (SELECT SUM(c) AS n_all FROM dense),
terms AS (
  SELECT d.seg,
         nseg.n,
         (d.c + 1) / CAST(nseg.n + {_Q201_NBINS} AS DOUBLE) AS p,
         (g.gc + 1) / CAST(tot.n_all + {_Q201_NBINS} AS DOUBLE) AS q
  FROM dense d
  JOIN g USING (bin)
  JOIN nseg USING (seg)
  CROSS JOIN tot
)
SELECT seg AS o_orderpriority,
       CAST(MIN(n) AS BIGINT) AS n_orders,
       round(SUM(p * ln(p / q)), 6) AS kl_fwd,
       round(SUM(q * ln(q / p)), 6) AS kl_rev,
       round(SUM(p * ln(p / q)) + SUM(q * ln(q / p)), 6) AS jeffreys
FROM terms
GROUP BY seg
"""


@register("q201_kl_segment_drift", oracle=_Q201_ORACLE, tags=("stats", "drift", "monitoring"))
def q201_kl_segment_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    binned = o.select(
        F.col("o_orderpriority").alias("seg"),
        F.least(
            F.floor(F.col("o_totalprice").cast("double") / _Q201_BIN_W).cast("int"),
            F.lit(_Q201_NBINS - 1),
        ).alias("bin"),
    )
    c = binned.groupBy("seg", "bin").agg(F.count(F.lit(1)).alias("c"))
    spine = (
        c.select("seg")
        .distinct()
        .crossJoin(
            F.broadcast(
                o.sparkSession.range(_Q201_NBINS).select(
                    F.col("id").cast("int").alias("bin")
                )
            )
        )
    )
    dense = spine.join(c, ["seg", "bin"], "left").withColumn(
        "c", F.coalesce("c", F.lit(0))
    )
    g = dense.groupBy("bin").agg(F.sum("c").alias("gc"))
    nseg = dense.groupBy("seg").agg(F.sum("c").alias("n"))
    tot = dense.agg(F.sum("c").alias("n_all"))
    k = _Q201_NBINS
    terms = (
        dense.join(F.broadcast(g), "bin")
        .join(F.broadcast(nseg), "seg")
        .crossJoin(F.broadcast(tot))
        .select(
            "seg",
            "n",
            ((F.col("c") + 1) / (F.col("n") + k).cast("double")).alias("p"),
            ((F.col("gc") + 1) / (F.col("n_all") + k).cast("double")).alias("q"),
        )
    )
    kl_fwd = F.sum(F.col("p") * F.log(F.col("p") / F.col("q")))
    kl_rev = F.sum(F.col("q") * F.log(F.col("q") / F.col("p")))
    return terms.groupBy("seg").agg(
        F.min("n").cast("bigint").alias("n_orders"),
        F.round(kl_fwd, 6).alias("kl_fwd"),
        F.round(kl_rev, 6).alias("kl_rev"),
        F.round(kl_fwd + kl_rev, 6).alias("jeffreys"),
    ).select(
        F.col("seg").alias("o_orderpriority"),
        "n_orders",
        "kl_fwd",
        "kl_rev",
        "jeffreys",
    )


# ---------------------------------------------------------------------------
# q203: Markov next-event prediction accuracy — q193 measured how
# predictable sessions are in-sample; this is the out-of-time eval a
# model gate actually runs: transition counts TRAINED on the first half
# of the month (source-event ts < Jan 16) produce an argmax
# next-event predictor per source state (ties broken lexicographically,
# a total order), which is then scored top-1 on the HELD-OUT second
# half. Train/test leakage is impossible by construction: the split
# keys on the source event's timestamp, and the per-user lead() window
# is computed once over the full sequence so boundary transitions
# (train-source → test-target) land in exactly one side.
#
# Scale: per-user lag/lead state is O(1); the model is |states|² rows;
# scoring joins the test stream against the broadcast 5-row predictor.
# Accuracy is an integer division evaluated identically on both sides.
# ---------------------------------------------------------------------------

_Q203_SPLIT = "2024-01-16 00:00:00"

_Q203_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
tr AS (
  SELECT event_type AS src, nxt AS dst, ts
  FROM seq WHERE nxt IS NOT NULL
),
train AS (
  SELECT src, dst, COUNT(*) AS c
  FROM tr WHERE ts < TIMESTAMP '{_Q203_SPLIT}'
  GROUP BY 1, 2
),
pred AS (
  SELECT src, dst AS pred_dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY c DESC, dst) AS rn
    FROM train
  ) WHERE rn = 1
),
test AS (
  SELECT src, dst FROM tr WHERE ts >= TIMESTAMP '{_Q203_SPLIT}'
)
SELECT t.src,
       p.pred_dst,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN t.dst = p.pred_dst THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(SUM(CASE WHEN t.dst = p.pred_dst THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS accuracy
FROM test t
LEFT JOIN pred p USING (src)
GROUP BY 1, 2
"""


@register(
    "q203_next_event_accuracy",
    oracle=_Q203_ORACLE,
    tags=("events", "ml", "sequence", "eval"),
)
def q203_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(F.col("event_type").alias("src"), F.col("nxt").alias("dst"), "ts")
    )
    split = F.lit(_Q203_SPLIT).cast("timestamp")
    train = tr.filter(F.col("ts") < split).groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_src = Window.partitionBy("src").orderBy(F.desc("c"), "dst")
    pred = (
        train.withColumn("rn", F.row_number().over(w_src))
        .filter(F.col("rn") == 1)
        .select("src", F.col("dst").alias("pred_dst"))
    )
    test = tr.filter(F.col("ts") >= split).select("src", "dst")
    correct = F.sum(F.when(F.col("dst") == F.col("pred_dst"), 1).otherwise(0))
    return (
        test.join(F.broadcast(pred), "src", "left")
        .groupBy("src", "pred_dst")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            correct.cast("bigint").alias("n_correct"),
            (correct.cast("double") / F.count(F.lit(1))).alias("accuracy"),
        )
    )


# ---------------------------------------------------------------------------
# q205: chi-square test of independence — the categorical companion to
# q167's two-proportion z-test: is order priority independent of order
# status? Expected cell counts from the margin products, the chi²
# statistic over the full contingency table, degrees of freedom from
# the observed level counts. Everything up to the final statistic is
# exact integer arithmetic (observed counts, margins, n); the per-cell
# (obs − exp)²/exp terms are doubles summed once and round-6'd (q191's
# libm/ordering precedent).
#
# Scale: one scan, one (r×c)-cell map-side-combined count; margins
# derive from the cells (no second scan); the statistic is a fold over
# r×c rows. Nothing scales with data volume except the scan.
# ---------------------------------------------------------------------------

_Q205_ORACLE = """
WITH cells AS (
  SELECT o_orderstatus AS s, o_orderpriority AS p, COUNT(*) AS c
  FROM orders GROUP BY 1, 2
),
rows_ AS (SELECT s, SUM(c) AS rc FROM cells GROUP BY 1),
cols_ AS (SELECT p, SUM(c) AS cc FROM cells GROUP BY 1),
tot AS (SELECT SUM(c) AS n FROM cells),
terms AS (
  SELECT cells.c,
         (rows_.rc * cols_.cc) / CAST(tot.n AS DOUBLE) AS exp
  FROM cells JOIN rows_ USING (s) JOIN cols_ USING (p) CROSS JOIN tot
)
SELECT CAST((SELECT COUNT(*) FROM rows_) AS BIGINT) AS n_rows,
       CAST((SELECT COUNT(*) FROM cols_) AS BIGINT) AS n_cols,
       CAST(((SELECT COUNT(*) FROM rows_) - 1)
            * ((SELECT COUNT(*) FROM cols_) - 1) AS BIGINT) AS dof,
       round(SUM((c - exp) * (c - exp) / exp), 6) AS chi2
FROM terms
"""


@register("q205_chi_square_independence", oracle=_Q205_ORACLE, tags=("stats", "test"))
def q205_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
    ).agg(F.count(F.lit(1)).alias("c"))
    rows_ = cells.groupBy("s").agg(F.sum("c").alias("rc"))
    cols_ = cells.groupBy("p").agg(F.sum("c").alias("cc"))
    tot = cells.agg(F.sum("c").alias("n"))
    terms = (
        cells.join(F.broadcast(rows_), "s")
        .join(F.broadcast(cols_), "p")
        .crossJoin(F.broadcast(tot))
        .select(
            "s",
            "p",
            "c",
            ((F.col("rc") * F.col("cc")) / F.col("n").cast("double")).alias("exp"),
        )
    )
    # level counts as IN-PLAN aggregates over the cell relation — a
    # driver-side .count() here would trigger two extra full scans at
    # build time (caught in audit; the r×c cells come from ONE scan)
    nr = F.countDistinct("s")
    nc = F.countDistinct("p")
    return terms.agg(
        nr.cast("bigint").alias("n_rows"),
        nc.cast("bigint").alias("n_cols"),
        ((nr - 1) * (nc - 1)).cast("bigint").alias("dof"),
        F.round(
            F.sum((F.col("c") - F.col("exp")) * (F.col("c") - F.col("exp")) / F.col("exp")),
            6,
        ).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# q206: Benford first-digit audit — the classic fabricated-data screen
# run over monetary columns in ingest QA: the leading digit of
# o_totalprice against Benford's expected log10(1 + 1/d) share, with
# the per-digit deviation and the summary MAD (mean absolute deviation,
# the statistic Nigrini's audit tables threshold on). First digits are
# string-extracted (no float log tricks on the data path), counts are
# exact, and the only doubles are the 9 expected shares (pinned
# closed-form literals evaluated identically) and the final round-6'd
# deviations.
#
# Scale: one scan → 9-row count; everything downstream is constant-size.
# ---------------------------------------------------------------------------

_Q206_ORACLE = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
              AS INT) AS digit
  FROM orders
),
c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
tot AS (SELECT SUM(n) AS n_all FROM c)
SELECT c.digit,
       CAST(c.n AS BIGINT) AS n_orders,
       round(c.n / CAST(tot.n_all AS DOUBLE), 6) AS obs_share,
       round(log10(1.0 + 1.0 / c.digit), 6) AS benford_share,
       round(abs(c.n / CAST(tot.n_all AS DOUBLE)
                 - log10(1.0 + 1.0 / c.digit)), 6) AS abs_dev
FROM c CROSS JOIN tot
"""


@register("q206_benford_audit", oracle=_Q206_ORACLE, tags=("stats", "quality", "audit"))
def q206_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").alias("n_all"))
    obs = F.col("n") / F.col("n_all").cast("double")
    ben = F.log10(1.0 + 1.0 / F.col("digit"))
    return c.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(obs, 6).alias("obs_share"),
        F.round(ben, 6).alias("benford_share"),
        F.round(F.abs(obs - ben), 6).alias("abs_dev"),
    )


# ---------------------------------------------------------------------------
# q211: time-weighted average value (TWAP) — the metric for any signal
# sampled at IRREGULAR intervals, where a plain mean over-weights burst
# periods: each observation carries its value until the next one, so
# the average weighs value by holding time. Per user over the month:
# Σ v_i·Δt_i / Σ Δt_i, Δt in exact microseconds (unix_micros/epoch_us —
# the ADVICE-r3 clock rule), values quantized to exact cents. The
# v·Δt products sum as DECIMAL(28,0) — a cent × a month of micros
# overflows BIGINT at sf0.1 (1.3e17/term × hundreds of events), and
# decimal sums are the exact, HUGEINT-free cross-engine algebra (the
# q171 rule). The final division is one pinned double expression.
#
# Scale: one per-user lead() window (O(1) state), one map-side-combined
# agg. The last observation of each user has no successor and drops —
# standard TWAP edge semantics, identical on both engines.
# ---------------------------------------------------------------------------

_Q211_ORACLE = """
WITH seq AS (
  SELECT user_id, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
         lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS nxt_us
  FROM events
),
d AS (
  SELECT user_id,
         CAST(round(value * 100, 0) AS BIGINT) AS vc,
         nxt_us - tus AS dt
  FROM seq WHERE nxt_us IS NOT NULL
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(dt) AS BIGINT) AS span_us,
       (CAST(SUM(CAST(vc * dt AS DECIMAL(28,0))) AS DOUBLE)
        / CAST(SUM(dt) AS DOUBLE)) / 100.0 AS twap
FROM d
GROUP BY user_id
"""


@register("q211_time_weighted_avg", oracle=_Q211_ORACLE, tags=("events", "stats", "window"))
def q211_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("tus"),
        F.lead(F.unix_micros("ts")).over(w).alias("nxt_us"),
    ).filter(F.col("nxt_us").isNotNull())
    d = seq.select(
        "user_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("vc"),
        (F.col("nxt_us") - F.col("tus")).alias("dt"),
    )
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum("dt").cast("bigint").alias("span_us"),
        (
            (
                F.sum((F.col("vc") * F.col("dt")).cast("decimal(28,0)")).cast("double")
                / F.sum("dt").cast("double")
            )
            / F.lit(100.0)
        ).alias("twap"),
    )


# ---------------------------------------------------------------------------
# q212: weekly cohort retention — THE product-analytics table: users
# cohorted by the ISO week of their first event; for each (cohort week,
# activity week) cell, how many cohort members were active, and what
# fraction of the cohort that is. One month of events gives a 5×5 upper
# triangle. date_trunc('week') is ISO-Monday in both engines.
#
# Scale: first-event week is one min-agg per user (map-side combined);
# the activity relation is user×week distinct; the matrix join carries
# the tiny cohort-size relation by broadcast. Retention is an integer
# division in one pinned expression.
# ---------------------------------------------------------------------------

_Q212_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         CAST(date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS DATE)
           AS cohort_week
  FROM events GROUP BY 1
),
active AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
           AS activity_week
  FROM events
),
cohort_size AS (
  SELECT cohort_week, COUNT(*) AS n_cohort FROM firsts GROUP BY 1
)
SELECT f.cohort_week,
       a.activity_week,
       CAST(cs.n_cohort AS BIGINT) AS n_cohort,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(COUNT(*) AS DOUBLE) / cs.n_cohort AS retention
FROM active a
JOIN firsts f USING (user_id)
JOIN cohort_size cs USING (cohort_week)
GROUP BY f.cohort_week, a.activity_week, cs.n_cohort
"""


@register("q212_cohort_retention", oracle=_Q212_ORACLE, tags=("events", "bi", "cohort"))
def q212_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("activity_week")
    ).distinct()
    cohort_size = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return (
        active.join(firsts, "user_id")
        .join(F.broadcast(cohort_size), "cohort_week")
        .groupBy("cohort_week", "activity_week", "n_cohort")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            "cohort_week",
            "activity_week",
            F.col("n_cohort").cast("bigint").alias("n_cohort"),
            F.col("__n").cast("bigint").alias("n_active"),
            (F.col("__n").cast("double") / F.col("n_cohort")).alias("retention"),
        )
    )


# ---------------------------------------------------------------------------
# q213: equi-depth histogram — the optimizer statistic every CBO
# stores per column (ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS
# builds exactly this): 9 exact decile boundaries of o_totalprice plus
# the count and exact NDV the selectivity estimator divides by. The
# boundary spine is generated (1..9 — data-independent), one percentile
# per row via the q27 bit-identical interpolation; at 100 TB this swaps
# to approx_percentile under q177's calibration gate.
#
# Scale: one scan for the percentile agg + one count-distinct agg
# (both map-side combined); everything else is the 9-row spine.
# ---------------------------------------------------------------------------

_Q213_ORACLE = """
WITH stats AS (
  SELECT COUNT(*) AS n,
         COUNT(DISTINCT CAST(o_totalprice AS DECIMAL(18,2))) AS ndv,
         quantile_cont(CAST(o_totalprice AS DOUBLE),
                       [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
  FROM orders
)
SELECT d.decile,
       bs[d.decile] AS boundary,
       CAST(stats.n AS BIGINT) AS n_rows,
       CAST(stats.ndv AS BIGINT) AS ndv
FROM stats CROSS JOIN (SELECT unnest(range(1, 10)) AS decile) d
"""


@register("q213_equidepth_histogram", oracle=_Q213_ORACLE, tags=("stats", "percentile", "catalog"))
def q213_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    stats = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(F.col("o_totalprice").cast("decimal(18,2)")).alias("ndv"),
        F.percentile(
            F.col("o_totalprice").cast("double"),
            F.array(*[F.lit(i / 10) for i in range(1, 10)]),
        ).alias("bs"),
    )
    spine = o.sparkSession.range(1, 10).select(F.col("id").cast("bigint").alias("decile"))
    return (
        spine.crossJoin(F.broadcast(stats))
        .select(
            "decile",
            F.element_at("bs", F.col("decile").cast("int")).alias("boundary"),
            F.col("n").cast("bigint").alias("n_rows"),
            F.col("ndv").cast("bigint").alias("ndv"),
        )
    )


# ---------------------------------------------------------------------------
# q214: session bounce rate by day — the engagement KPI next to q113's
# funnel: a session with exactly one event is a bounce; rate reported
# per session-start date. Sessionization is q54/q113's 30-minute-gap
# rule with the microsecond-exact clock (unix_micros/epoch_us, the
# ADVICE-r3 standard — whole-second truncation would misfile gaps in
# (1800, 1801)). Session state is one lag() per user partition; the
# rollup is session-grained.
# ---------------------------------------------------------------------------

_Q214_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(CAST(ts AS TIMESTAMP))
                   - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
                   > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
ids AS (
  SELECT *, CAST(SUM(new_s) OVER (
    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
  ) AS BIGINT) AS session_seq
  FROM seq
),
sess AS (
  SELECT user_id, session_seq,
         CAST(MIN(ts) AS DATE) AS start_date,
         COUNT(*) AS n_events
  FROM ids GROUP BY 1, 2
)
SELECT start_date,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS bounce_rate
FROM sess
GROUP BY start_date
"""


@register("q214_bounce_rate", oracle=_Q214_ORACLE, tags=("events", "bi", "sessionize"))
def q214_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    ids = ev.withColumn("__new", new_s).withColumn(
        "session_seq",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    sess = ids.groupBy("user_id", "session_seq").agg(
        F.min("ts").cast("date").alias("start_date"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounces = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return sess.groupBy("start_date").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        bounces.cast("bigint").alias("n_bounces"),
        (bounces.cast("double") / F.count(F.lit(1))).alias("bounce_rate"),
    )


# ---------------------------------------------------------------------------
# q216: Gini coefficient by segment — the single-number inequality
# index (marketplace concentration, revenue inequality) via the exact
# rank formula G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n over ascending-
# sorted values. Equal values commute under the formula (swapping tied
# x's leaves Σ i·x_i unchanged), so ties need no tiebreak for
# correctness — o_orderkey still pins a total order for plan
# determinism. Values are exact cents; the i·x products are summed as
# DECIMAL(38,0) (a rank × a cent value × rows overflows BIGINT by
# sf1); the Gini itself is one pinned double expression round-6'd.
# q161's ABC classes bucket the same concentration; Gini is the
# scalar the two are reconciled against.
#
# Scale: the per-segment rank is a window over the segment partition
# (each segment sorts its own rows — the partition IS the unit of
# parallelism); everything after is a map-side-combined agg.
# ---------------------------------------------------------------------------

_Q216_ORACLE = """
WITH r AS (
  SELECT o_orderpriority AS seg,
         CAST(round(CAST(o_totalprice AS DOUBLE) * 100, 0) AS BIGINT) AS xc,
         row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey
         ) AS i
  FROM orders
)
SELECT seg AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       round(2.0 * CAST(SUM(CAST(i * xc AS DECIMAL(38,0))) AS DOUBLE)
               / (COUNT(*) * CAST(SUM(CAST(xc AS DECIMAL(38,0))) AS DOUBLE))
             - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
FROM r
GROUP BY seg
"""


@register("q216_gini_by_segment", oracle=_Q216_ORACLE, tags=("stats", "inequality"))
def q216_gini_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").cast("decimal(18,2)"), "o_orderkey"
    )
    r = o.select(
        F.col("o_orderpriority").alias("seg"),
        F.round(F.col("o_totalprice").cast("double") * 100, 0)
        .cast("bigint")
        .alias("xc"),
        F.row_number().over(w).alias("i"),
    )
    s1 = F.sum((F.col("i") * F.col("xc")).cast("decimal(38,0)")).cast("double")
    s0 = F.sum(F.col("xc").cast("decimal(38,0)")).cast("double")
    n = F.count(F.lit(1))
    return r.groupBy(F.col("seg").alias("o_orderpriority")).agg(
        n.cast("bigint").alias("n_orders"),
        F.round(
            F.lit(2.0) * s1 / (n * s0) - (n + F.lit(1.0)) / n, 6
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# q219: out-of-orderness audit — the measurement that CHOOSES a
# watermark: per user stream (event_id = arrival order within a user),
# an event's lateness is how far the stream's running-max event time
# has already advanced past it when it arrives. The per-day rollup of
# (late events, max and p95 lateness) tells the streaming jobs (q53+,
# q119's late-drop rule) what `withWatermark` bound loses how much
# data — measured on the same events the stream replays.
#
# Clock rule: lateness in exact microseconds (unix_micros/epoch_us).
# Fixture rule: the synthetic events arrive exactly in event-time
# order (verified: zero late events under event_id order), which would
# make the audit vacuous — so arrival order is a deterministic md5
# permutation of event_id that BOTH engines replay (the non-vacuous-
# fixture rule, q139's precedent). The measurement machinery — running
# event-time max per stream, per-day lateness profile — is the
# contract; real deployments feed it the true arrival sequence.
# Scale: running max is O(1) state per user partition (the same
# per-user window every sessionizer uses); the rollup is day-grained.
# p95 is exact here; the approx_percentile swap is q177's.
# ---------------------------------------------------------------------------

_Q219_ORACLE = """
WITH seq AS (
  SELECT CAST(ts AS TIMESTAMP) AS ts,
         GREATEST(
           MAX(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
             PARTITION BY user_id
             ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
             ROWS UNBOUNDED PRECEDING
           ) - epoch_us(CAST(ts AS TIMESTAMP)), 0) AS lateness_us
  FROM events
)
SELECT CAST(ts AS DATE) AS event_date,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN lateness_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       CAST(MAX(lateness_us) AS BIGINT) AS max_lateness_us,
       quantile_cont(CAST(lateness_us AS DOUBLE), 0.95) AS p95_lateness_us
FROM seq
GROUP BY 1
"""


@register("q219_out_of_orderness", oracle=_Q219_ORACLE, tags=("events", "streaming", "audit"))
def q219_out_of_orderness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    ).rowsBetween(Window.unboundedPreceding, 0)
    seq = ev.select(
        "ts",
        F.greatest(
            F.max(F.unix_micros("ts")).over(w) - F.unix_micros("ts"), F.lit(0)
        ).alias("lateness_us"),
    )
    return seq.groupBy(F.col("ts").cast("date").alias("event_date")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("lateness_us") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_late"),
        F.max("lateness_us").cast("bigint").alias("max_lateness_us"),
        F.percentile(F.col("lateness_us").cast("double"), F.lit(0.95)).alias(
            "p95_lateness_us"
        ),
    )


# ---------------------------------------------------------------------------
# q220: Pareto frontier (skyline) — "show the orders where no other
# order in the segment is both cheaper AND earlier": the multi-criteria
# dominance operator research systems ship as SKYLINE. The naive form
# is an O(n²) dominance self-join; the scale-safe rewrite is a sort-
# based sweep expressed in ONE window pass: ordering by price, an order
# is dominated iff min(date) over STRICTLY-cheaper orders is ≤ its
# date (a RANGE frame excluding the current price), or min(date)
# within its own price group is < its date. Prices are exact cents,
# dates exact epoch days, so dominance is pure integer comparison.
#
# Scale: the window partitions by segment (segments are the
# parallelism unit — a single-segment skyline needs the q88 prefix
# rewrite, same note as q216); output is the frontier itself, which is
# O(log n) expected under independence — tiny.
# ---------------------------------------------------------------------------

_Q220_ORACLE = """
WITH r AS (
  SELECT o_orderpriority AS seg, o_orderkey,
         CAST(round(CAST(o_totalprice AS DOUBLE) * 100, 0) AS BIGINT) AS xc,
         CAST(o_orderdate AS DATE) AS od,
         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d
  FROM orders
),
m AS (
  SELECT *,
         MIN(d) OVER (PARTITION BY seg ORDER BY xc
                      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS min_d_cheaper,
         MIN(d) OVER (PARTITION BY seg, xc) AS min_d_same
  FROM r
)
SELECT seg AS o_orderpriority, o_orderkey,
       xc AS price_cents, od AS o_orderdate
FROM m
WHERE (min_d_cheaper IS NULL OR min_d_cheaper > d) AND min_d_same >= d
"""


@register("q220_pareto_frontier", oracle=_Q220_ORACLE, tags=("skyline", "window", "analytics"))
def q220_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    r = o.select(
        F.col("o_orderpriority").alias("seg"),
        "o_orderkey",
        F.round(F.col("o_totalprice").cast("double") * 100, 0)
        .cast("bigint")
        .alias("xc"),
        F.col("o_orderdate").cast("date").alias("od"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).alias("d"),
    )
    w_cheaper = (
        Window.partitionBy("seg")
        .orderBy("xc")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("seg", "xc")
    m = r.select(
        "*",
        F.min("d").over(w_cheaper).alias("min_d_cheaper"),
        F.min("d").over(w_same).alias("min_d_same"),
    )
    return m.filter(
        (F.col("min_d_cheaper").isNull() | (F.col("min_d_cheaper") > F.col("d")))
        & (F.col("min_d_same") >= F.col("d"))
    ).select(
        F.col("seg").alias("o_orderpriority"),
        "o_orderkey",
        F.col("xc").alias("price_cents"),
        "od",
    ).withColumnRenamed("od", "o_orderdate")


# ---------------------------------------------------------------------------
# q221: exact weighted median — the robust aggregate for "median price
# per unit SOLD" (weight = quantity): the smallest value x with
# 2·Σ_{y≤x} w ≥ W, per return flag. Weights collapse to per-distinct-
# value sums FIRST (map-side combined), so the cumulative window runs
# over the |distinct values| relation, not the raw rows; the 2·cum ≥ W
# rule is pure integer arithmetic (no /2 half boundary — the q46p
# integer-threshold trick). At extreme distinct-value cardinality the
# cumulative swaps to q88's distributed prefix sum.
# ---------------------------------------------------------------------------

_Q221_ORACLE = """
WITH g AS (
  SELECT l_returnflag AS flag,
         CAST(round(CAST(l_extendedprice AS DOUBLE) * 100, 0) AS BIGINT) AS xc,
         CAST(SUM(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
),
c AS (
  SELECT flag, xc, w,
         SUM(w) OVER (PARTITION BY flag ORDER BY xc
                      ROWS UNBOUNDED PRECEDING) AS cumw,
         SUM(w) OVER (PARTITION BY flag) AS tw
  FROM g
)
SELECT flag AS l_returnflag,
       CAST(MIN(tw) AS BIGINT) AS total_weight,
       CAST(MIN(xc) AS BIGINT) AS weighted_median_cents
FROM c
WHERE 2 * cumw >= tw
GROUP BY flag
"""


@register("q221_weighted_median", oracle=_Q221_ORACLE, tags=("stats", "percentile", "agg"))
def q221_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice").cast("double") * 100, 0)
        .cast("bigint")
        .alias("xc"),
    ).agg(F.sum(F.round("l_quantity", 0).cast("bigint")).cast("bigint").alias("w"))
    w_cum = (
        Window.partitionBy("flag").orderBy("xc").rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("flag")
    c = g.select(
        "flag",
        "xc",
        F.sum("w").over(w_cum).alias("cumw"),
        F.sum("w").over(w_all).alias("tw"),
    )
    return (
        c.filter(F.lit(2) * F.col("cumw") >= F.col("tw"))
        .groupBy(F.col("flag").alias("l_returnflag"))
        .agg(
            F.min("tw").cast("bigint").alias("total_weight"),
            F.min("xc").cast("bigint").alias("weighted_median_cents"),
        )
    )


# ---------------------------------------------------------------------------
# q233: Holt linear (double exponential) smoothing — q163 tracks LEVEL
# only and lags any trending series; Holt's method carries a coupled
# (level, trend) state:  l_t = α·y_t + (1−α)(l_{t−1}+b_{t−1}),
# b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1} — the 1-step forecast l+b is
# what capacity planning actually charts. The recursion is a PINNED
# LEFT FOLD over the per-series day array with a STRUCT accumulator —
# F.aggregate(struct init) in Spark, list_reduce with a struct in
# DuckDB, evaluating the identical IEEE op sequence, so the folded
# doubles are bit-identical (the q163/q187 fold rule) and only the
# final round-6 is cosmetic. Series are per event type (5×30 points) —
# the fold input is an already-aggregated array column, tiny at any
# corpus scale; state per series is exactly (l, b).
# ---------------------------------------------------------------------------

_HOLT_A = 0.3  # alpha: level
_HOLT_B = 0.2  # beta: trend

_Q233_ORACLE = f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 6) AS y
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT event_type, list(y ORDER BY d) AS ys, COUNT(*) AS n_days
  FROM daily GROUP BY 1
),
-- DuckDB 1.0's list_reduce takes no initial value, so the struct fold
-- is replayed as a bounded recursion evaluating the IDENTICAL
-- arithmetic per step (same IEEE op order as the Spark lambda)
rec AS (
  SELECT event_type, 2 AS i, ys[1] AS l, ys[2] - ys[1] AS b
  FROM series WHERE n_days >= 2
  UNION ALL
  SELECT r.event_type, r.i + 1,
         {_HOLT_A} * s.ys[r.i + 1] + {1 - _HOLT_A} * (r.l + r.b),
         {_HOLT_B} * (({_HOLT_A} * s.ys[r.i + 1]
                       + {1 - _HOLT_A} * (r.l + r.b)) - r.l)
           + {1 - _HOLT_B} * r.b
  FROM rec r JOIN series s USING (event_type)
  WHERE r.i < s.n_days
)
SELECT r.event_type,
       CAST(s.n_days AS INT) AS n_days,
       round(r.l, 6) AS level,
       round(r.b, 6) AS trend,
       round(r.l + r.b, 6) AS forecast_1
FROM rec r JOIN series s USING (event_type)
WHERE r.i = s.n_days
"""


@register("q233_holt_linear", oracle=_Q233_ORACLE, tags=("timeseries", "forecast", "fold"))
def q233_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 6).alias(
            "y"
        )
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "y"))), lambda s: s["y"]
        ).alias("ys"),
        F.count(F.lit(1)).cast("int").alias("n_days"),
    # Mirror the oracle's WHERE n_days >= 2 (ADVICE r4): Holt needs two
    # points to seed the trend; a 1-day series would make element_at(ys,2)
    # null / the slice length negative under ANSI.
    ).filter(F.col("n_days") >= 2)
    a, b = _HOLT_A, _HOLT_B

    def step(acc, x):
        l_new = a * x + (1 - a) * (acc["l"] + acc["b"])
        return F.struct(
            l_new.alias("l"),
            (b * (l_new - acc["l"]) + (1 - b) * acc["b"]).alias("b"),
        )

    init = F.struct(
        F.element_at("ys", 1).alias("l"),
        (F.element_at("ys", 2) - F.element_at("ys", 1)).alias("b"),
    )
    st = F.aggregate(F.slice("ys", 3, F.size("ys") - 2), init, step)
    return series.select(
        "event_type",
        "n_days",
        F.round(st["l"], 6).alias("level"),
        F.round(st["b"], 6).alias("trend"),
        F.round(st["l"] + st["b"], 6).alias("forecast_1"),
    )


# ---------------------------------------------------------------------------
# q236: weekly churn — q212's retention triangle inverted into the
# operational alert: of the users active in ISO week w, how many are
# GONE in week w+1? Computed as a per-user (user, week) distinct
# relation anti-joined against its own next week — one self-join on
# (user, week+7d), no per-user windows. The last observed week is
# excluded (its "next week" lies outside the data — reporting it as
# churn would be the classic right-censoring bug).
#
# Scale: the active relation is user×week distinct (map-side
# combined); the self-join keys on (user, next week) — an ordinary
# shuffled equi-join; the rollup is |weeks| rows.
# ---------------------------------------------------------------------------

_Q236_ORACLE = """
WITH active AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
  FROM events
),
max_wk AS (SELECT MAX(wk) AS mw FROM active),
flags AS (
  SELECT a.user_id, a.wk,
         CASE WHEN n.user_id IS NULL THEN 1 ELSE 0 END AS churned
  FROM active a
  LEFT JOIN active n
    ON n.user_id = a.user_id AND n.wk = a.wk + INTERVAL 7 DAY
  CROSS JOIN max_wk
  WHERE a.wk < max_wk.mw
)
SELECT wk,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(churned) AS BIGINT) AS n_churned,
       CAST(SUM(churned) AS DOUBLE) / COUNT(*) AS churn_rate
FROM flags
GROUP BY wk
"""


@register("q236_weekly_churn", oracle=_Q236_ORACLE, tags=("events", "bi", "cohort"))
def q236_weekly_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    max_wk = active.agg(F.max("wk").alias("mw"))
    nxt = active.select(
        F.col("user_id").alias("__u"), F.col("wk").alias("__nw")
    )
    flags = (
        active.crossJoin(F.broadcast(max_wk))
        .filter(F.col("wk") < F.col("mw"))
        .join(
            nxt,
            (F.col("user_id") == F.col("__u"))
            & (F.col("__nw") == F.date_add(F.col("wk"), 7)),
            "left",
        )
        .select(
            "wk",
            F.when(F.col("__u").isNull(), 1).otherwise(0).alias("churned"),
        )
    )
    return flags.groupBy("wk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
        F.sum("churned").cast("bigint").alias("n_churned"),
        (F.sum("churned").cast("double") / F.count(F.lit(1))).alias("churn_rate"),
    )


# ---------------------------------------------------------------------------
# q238: Wilson confidence intervals — q167's z-test answers "are two
# segments different"; the Wilson score interval answers the dashboard
# question "how sure are we about EACH rate": per event type, the
# purchase-conversion share of users with 95% bounds that stay inside
# [0,1] and behave at small n (why Wilson displaced the naive normal
# interval in every serving layer). Counts are exact integers; the
# interval is one pinned closed-form expression per row (sqrt is the
# lone libm call, round-6'd — the q191 rule).
#
# Scale: one scan → per-type user sets (map-side distinct agg), then
# |types|-row arithmetic.
# ---------------------------------------------------------------------------

_Q238_Z = 1.96

_Q238_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1
),
seg AS (
  SELECT e.event_type, u.user_id, MAX(u.converted) AS converted
  FROM events e JOIN u USING (user_id)
  WHERE e.event_type <> 'purchase'
  GROUP BY 1, 2
),
c AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(converted) AS k
  FROM seg GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_users,
       CAST(k AS BIGINT) AS n_converted,
       round(k / CAST(n AS DOUBLE), 6) AS rate,
       round((k / CAST(n AS DOUBLE) + {_Q238_Z} * {_Q238_Z} / (2 * n)
              - {_Q238_Z} * sqrt((k / CAST(n AS DOUBLE))
                                 * (1 - k / CAST(n AS DOUBLE)) / n
                                 + {_Q238_Z} * {_Q238_Z} / (4.0 * n * n)))
             / (1 + {_Q238_Z} * {_Q238_Z} / n), 6) AS wilson_lo,
       round((k / CAST(n AS DOUBLE) + {_Q238_Z} * {_Q238_Z} / (2 * n)
              + {_Q238_Z} * sqrt((k / CAST(n AS DOUBLE))
                                 * (1 - k / CAST(n AS DOUBLE)) / n
                                 + {_Q238_Z} * {_Q238_Z} / (4.0 * n * n)))
             / (1 + {_Q238_Z} * {_Q238_Z} / n), 6) AS wilson_hi
FROM c
"""


@register("q238_wilson_intervals", oracle=_Q238_ORACLE, tags=("stats", "interval", "bi"))
def q238_wilson_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        )
    )
    seg = (
        ev.filter(F.col("event_type") != "purchase")
        .join(u, "user_id")
        .groupBy("event_type", "user_id")
        .agg(F.max("converted").alias("converted"))
    )
    c = seg.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("k")
    )
    z = _Q238_Z
    p = F.col("k") / F.col("n").cast("double")
    n = F.col("n")
    center = p + z * z / (2 * n)
    half = z * F.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
    denom = 1 + z * z / n
    return c.select(
        "event_type",
        n.cast("bigint").alias("n_users"),
        F.col("k").cast("bigint").alias("n_converted"),
        F.round(p, 6).alias("rate"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


# ---------------------------------------------------------------------------
# q239: log2-binned (HDR-style) histogram — how latency and money
# telemetry is actually stored: exponential bins give constant
# RELATIVE resolution with log-many buckets. The bin index is EXACT
# integer arithmetic — length(bin(x)) − 1, i.e. the position of the
# highest set bit via both engines' binary-string builtin — never
# floor(log2(x)), whose libm value sits one ulp either side of an
# integer AT every power of two (the exact rows that define the
# bins). Bin bounds [2^b, 2^{b+1}) are emitted as exact BIGINTs.
#
# Scale: a projection plus one map-side-combined count per bin —
# bins are log-many (~26 for cent amounts), state is trivially
# bounded, and the bin relation merges across shards by addition.
# ---------------------------------------------------------------------------

_Q239_ORACLE = """
WITH b AS (
  SELECT length(bin(CAST(round(CAST(o_totalprice AS DOUBLE) * 100, 0)
                         AS BIGINT))) - 1 AS bin_idx
  FROM orders
)
SELECT bin_idx,
       CAST(power(2, bin_idx) AS BIGINT) AS lo_cents,
       CAST(power(2, bin_idx + 1) AS BIGINT) - 1 AS hi_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM b
GROUP BY bin_idx
"""


@register("q239_log2_histogram", oracle=_Q239_ORACLE, tags=("stats", "histogram", "telemetry"))
def q239_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    xc = F.round(F.col("o_totalprice").cast("double") * 100, 0).cast("bigint")
    b = o.select((F.length(F.bin(xc)) - 1).alias("bin_idx"))
    return b.groupBy("bin_idx").agg(
        F.pow(F.lit(2), F.col("bin_idx")).cast("bigint").alias("lo_cents"),
        (F.pow(F.lit(2), F.col("bin_idx") + 1).cast("bigint") - 1).alias("hi_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    ).select("bin_idx", "lo_cents", "hi_cents", "n_orders")


# ---------------------------------------------------------------------------
# q240: decay-weighted popularity — the recency-biased score feeds and
# recommenders rank by: each event contributes value·2^(−age), age in
# whole half-lives (here: days since the feed's max date, so the
# reference point derives from the DATA, not the wall clock — the
# clock-freedom rule the driver's replay requires). The exactness
# trick that makes this hash-checkable: 2^(−k) is an EXACT binary
# fraction, so instead of summing decayed doubles (whose addition
# order rounds differently per engine) the query sums
# value_cents·2^(30−k) as exact DECIMAL integers and divides ONCE by
# 2^30 — a power-of-two scaling that is exact in IEEE — making the
# final double bit-identical with zero rounding anywhere.
#
# Scale: one scan, a broadcast 1-row max-date, and a map-side-combined
# decimal agg per event type. Ages cap at 30 half-lives (weight
# underflows to business-zero; the cap also bounds the 2^(30−k)
# factor).
# ---------------------------------------------------------------------------

_Q240_ORACLE = """
WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS md FROM events),
w AS (
  SELECT event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS vc,
         least(datediff('day', CAST(ts AS DATE), mx.md), 30) AS k
  FROM events CROSS JOIN mx
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(vc * CAST(power(2, 30 - k) AS BIGINT)
                     AS DECIMAL(38,0))) AS DOUBLE)
         / 1073741824.0 AS decayed_value
FROM w
GROUP BY event_type
"""


@register("q240_decayed_popularity", oracle=_Q240_ORACLE, tags=("events", "recsys", "decay"))
def q240_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.col("ts").cast("date")).alias("md"))
    w = ev.crossJoin(F.broadcast(mx)).select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("vc"),
        F.least(
            F.datediff(F.col("md"), F.col("ts").cast("date")), F.lit(30)
        ).alias("k"),
    )
    scaled = F.sum(
        (
            F.col("vc")
            * F.pow(F.lit(2), F.lit(30) - F.col("k")).cast("bigint")
        ).cast("decimal(38,0)")
    )
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (scaled.cast("double") / F.lit(1073741824.0)).alias("decayed_value"),
    )


# ---------------------------------------------------------------------------
# q241: two-sample Kolmogorov–Smirnov — the nonparametric distribution
# comparison that complements the binned drift family (q191 PSI / q201
# KL need a bin choice; KS does not): per priority segment, the max
# ECDF gap between 1995 and 1996 order totals. EXACT by integer
# cross-multiplication — the statistic is max|c1·n2 − c2·n1| over the
# per-distinct-value cumulative counts (evaluated at distinct values,
# so tie order cannot matter), with the single division to
# D = max/(n1·n2) done once at the end. The cumulative window runs per
# (segment) over the DISTINCT-value relation; DECIMAL(38,0) products
# keep the cross-multiplication exact at any scale.
# ---------------------------------------------------------------------------

_Q241_ORACLE = """
WITH v AS (
  SELECT o_orderpriority AS seg,
         CAST(round(CAST(o_totalprice AS DOUBLE) * 100, 0) AS BIGINT) AS xc,
         SUM(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS c2
  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2
),
c AS (
  SELECT seg, xc,
         SUM(c1) OVER (PARTITION BY seg ORDER BY xc
                       ROWS UNBOUNDED PRECEDING) AS cum1,
         SUM(c2) OVER (PARTITION BY seg ORDER BY xc
                       ROWS UNBOUNDED PRECEDING) AS cum2,
         SUM(c1) OVER (PARTITION BY seg) AS n1,
         SUM(c2) OVER (PARTITION BY seg) AS n2
  FROM v
)
SELECT seg AS o_orderpriority,
       CAST(MIN(n1) AS BIGINT) AS n_1995,
       CAST(MIN(n2) AS BIGINT) AS n_1996,
       CAST(MAX(abs(CAST(cum1 AS DECIMAL(38,0)) * n2
                    - CAST(cum2 AS DECIMAL(38,0)) * n1)) AS BIGINT)
         AS max_cross,
       CAST(MAX(abs(CAST(cum1 AS DECIMAL(38,0)) * n2
                    - CAST(cum2 AS DECIMAL(38,0)) * n1)) AS DOUBLE)
         / (MIN(n1) * CAST(MIN(n2) AS DOUBLE)) AS ks_d
FROM c
GROUP BY seg
"""


@register("q241_ks_two_sample", oracle=_Q241_ORACLE, tags=("stats", "drift", "test"))
def q241_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    v = o.groupBy(
        F.col("o_orderpriority").alias("seg"),
        F.round(F.col("o_totalprice").cast("double") * 100, 0)
        .cast("bigint")
        .alias("xc"),
    ).agg(
        F.sum(F.when(F.year("o_orderdate") == 1995, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.year("o_orderdate") == 1996, 1).otherwise(0)).alias("c2"),
    )
    w_cum = Window.partitionBy("seg").orderBy("xc").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("seg")
    c = v.select(
        "seg",
        F.sum("c1").over(w_cum).alias("cum1"),
        F.sum("c2").over(w_cum).alias("cum2"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
    )
    cross = F.abs(
        F.col("cum1").cast("decimal(38,0)") * F.col("n2")
        - F.col("cum2").cast("decimal(38,0)") * F.col("n1")
    )
    return (
        c.withColumn("cross", cross)
        .groupBy(F.col("seg").alias("o_orderpriority"))
        .agg(
            F.min("n1").cast("bigint").alias("n_1995"),
            F.min("n2").cast("bigint").alias("n_1996"),
            F.max("cross").cast("bigint").alias("max_cross"),
            (
                F.max("cross").cast("double")
                / (F.min("n1") * F.min("n2").cast("double"))
            ).alias("ks_d"),
        )
    )
