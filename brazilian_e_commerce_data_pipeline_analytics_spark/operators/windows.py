"""Window-function operators (SURVEY.md §2.5).

The reference imports ``Window`` and never uses it (``reporting.py:5``) —
its dashboards delegate YoY/top-k/%-of-total to Power BI. Here they are
first-class operators.

Scale notes:
- ``top_k`` (global top-k) deliberately avoids a single-partition window:
  ``orderBy(...).limit(k)`` lets Spark run TakeOrderedAndProject — per-
  partition top-k then a k-row merge on the driver, no global sort, no
  one-task window. We then re-rank the k survivors locally (k rows).
- ``top_k_per_group`` is the rank-over-partition form; the shuffle is on
  the group key, which is the same shuffle the metric aggregation already
  produced — Catalyst reuses the partitioning, no extra exchange.
- ``pct_of_total`` uses a scalar subquery-style cross join against a
  1-row aggregate rather than ``sum() OVER ()`` — an empty-frame window
  collapses every row into ONE partition (a 100-TB anti-pattern); the
  1-row broadcast join keeps the big side fully parallel.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cols(cs: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cs]


def top_k(df: DataFrame, order_by: Sequence[Column | str], k: int, rank_col: str = "rank") -> DataFrame:
    """Global deterministic top-k. ``order_by`` must be a total order
    (include a unique tiebreaker) for oracle reproducibility."""
    order = _cols(order_by)
    pruned = df.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return pruned.withColumn(rank_col, F.row_number().over(w))


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*_cols(order_by))
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def yoy(
    df: DataFrame,
    entity_cols: Sequence[str],
    period_col: str,
    metric_col: str,
    prev_alias: str = "prev_value",
    pct_alias: str = "yoy_pct",
) -> DataFrame:
    """Year-over-year: lag(metric) over (partition by entity order by
    period) + percent change. NULL for the first period, and NULL pct when
    the previous value is 0 (division yields NULL via nullif-style guard).
    """
    w = Window.partitionBy(*entity_cols).orderBy(F.col(period_col))
    prev = F.lag(F.col(metric_col), 1).over(w)
    pct = F.when(prev != 0, (F.col(metric_col) - prev) / prev * F.lit(100.0))
    return df.withColumn(prev_alias, prev).withColumn(pct_alias, pct)


def pct_of_total(
    df: DataFrame,
    metric_col: str,
    alias: str = "pct_of_total",
) -> DataFrame:
    """metric / sum(metric) * 100, computed via a broadcast 1-row total."""
    total = df.agg(F.sum(F.col(metric_col)).alias("__total"))
    out = df.crossJoin(F.broadcast(total))
    return out.withColumn(
        alias, F.col(metric_col) / F.col("__total") * F.lit(100.0)
    ).drop("__total")


def moving_sum_avg(
    df: DataFrame,
    order_col: str,
    metric_col: str,
    n: int,
    partition_by: Sequence[str] = (),
    sum_alias: str = "moving_sum",
    avg_alias: str = "moving_avg",
) -> DataFrame:
    """Trailing n-row moving sum/avg (rowsBetween -(n-1)..0).

    The metric is summed through DECIMAL so the sliding-frame arithmetic
    is exact and order-independent (Spark computes sliding sums
    incrementally with retractions; float retraction is not associative —
    decimal is). See functions/compat.py.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(F.col(order_col))
        .rowsBetween(-(n - 1), 0)
    )
    dec = F.col(metric_col).cast("decimal(28,8)")
    msum = F.sum(dec).over(w).cast("double")
    mcount = F.count(dec).over(w)
    return df.withColumn(sum_alias, msum).withColumn(
        avg_alias, F.col(sum_alias) / mcount
    )
