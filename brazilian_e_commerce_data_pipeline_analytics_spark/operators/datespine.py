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


def date_spine(df: DataFrame, ts_col: str | Column, date_alias: str = "d") -> DataFrame:
    """One row per calendar day between min and max of ``ts_col``."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    bounds = df.agg(
        F.min(c.cast("date")).alias("__mn"), F.max(c.cast("date")).alias("__mx")
    )
    return bounds.select(
        F.explode(F.sequence("__mn", "__mx", F.expr("interval 1 day"))).alias(date_alias)
    )
