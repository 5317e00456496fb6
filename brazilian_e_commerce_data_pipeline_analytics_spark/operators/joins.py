"""Join builders (SURVEY.md §2.3).

The reference performs only USING-style inner equi-joins on ``Ord_ID``
(``reporting.py:266-268,324-326,374-375``) and leaves fact<->dim joins to
the BI tool. Here one builder covers inner/left/semi/anti with an explicit
broadcast knob.

Scale strategy:
- dimension side < broadcast threshold -> ``F.broadcast`` hint: no shuffle
  of the fact side at all, the single most important join optimization at
  100 TB (reference raises the auto threshold to 50 MB, ``reporting.py:16``;
  we keep that *and* hint explicitly so the plan does not depend on stats).
- big-big joins: leave to sort-merge + AQE skew splitting; co-locate
  repeated joins by bucketing the fact tables on the join key at write
  time (sources/writers.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    if broadcast_right:
        right = F.broadcast(right)
    return left.join(right, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Rows of ``left`` with a match in ``right`` — no right columns, no
    duplication; Spark never materializes the right payload."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` (NOT EXISTS)."""
    return left.join(right, on=on, how="left_anti")
