"""Distributed date spine (SURVEY.md §2.1 S5/S8).

The reference builds its date dimension by ``collect()``-ing min/max to
the driver and then ``spark.range(days)`` (``reporting.py:56-66``) — an
eager action mid-plan. Here the spine stays fully lazy and distributed:
a 1-row min/max aggregate feeds ``sequence(min, max, interval 1 day)``
which is exploded into one row per day. No driver round-trip, works for a
century-long range, and the 1-row aggregate is a trivially cheap job at
any data size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def date_spine(df: DataFrame, ts_col: str | Column, date_alias: str = "d") -> DataFrame:
    """One row per calendar day between min and max of ``ts_col``."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    bounds = df.agg(
        F.min(c.cast("date")).alias("__mn"), F.max(c.cast("date")).alias("__mx")
    )
    return bounds.select(
        F.explode(F.sequence("__mn", "__mx", F.expr("interval 1 day"))).alias(date_alias)
    )


def gap_fill_ffill(
    daily: DataFrame,
    keys: list[str],
    date_col: str,
    value_cols: list[str],
    running_total_cols: list[str] | None = None,
    observed_flag: str = "was_observed",
) -> DataFrame:
    """Densify a sparse per-key daily relation and forward-fill values.

    ``daily`` must be at (keys, date) grain (one row per key per observed
    day). Output has one row per key per day from that key's FIRST
    observation through the GLOBAL max date, with each value column
    carried forward over gap days (last observation carried forward) and
    ``observed_flag`` marking real vs filled rows. The reference has no
    dense-calendar semantics at all (its dim_date join leaves gap days
    absent, ``reporting.py:56-92``); every BI "revenue to date" /
    "current state per day" visual needs this densification.

    Scale shape: runs AFTER aggregation to daily grain, so the relation
    is |keys| x |days| — tiny relative to the fact table that produced
    it. Three narrow shuffles on that reduced relation: per-key min
    (partial agg), the spine/left join on (keys, d), and the
    forward-fill window on keys. The global max date is a 1-row
    broadcast. Spine rows are generated distributed via
    ``sequence``+``explode`` per key — no driver collect, no cross join
    against a materialized calendar.
    """
    d = F.col(date_col)
    bounds = daily.groupBy(*keys).agg(F.min(d).alias("__mn"))
    gmax = daily.agg(F.max(d).alias("__mx"))
    spine = (
        bounds.join(F.broadcast(gmax))
        .select(
            *keys,
            F.explode(
                F.sequence("__mn", "__mx", F.expr("interval 1 day"))
            ).alias(date_col),
        )
    )
    joined = spine.join(daily, on=[*keys, date_col], how="left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = [F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols]
    # gap days contribute 0 to running totals (vs LOCF's "carry state");
    # both read off the SAME window spec, so Spark computes them in one
    # window pass
    running = [
        F.sum(F.coalesce(F.col(c), F.lit(0))).over(w).alias(f"{c}_cum")
        for c in (running_total_cols or [])
    ]
    flag = F.col(value_cols[0]).isNotNull().alias(observed_flag)
    return joined.select(*keys, date_col, *filled, *running, flag)
