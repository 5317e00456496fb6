"""As-of (most-recent-state) join — an operator Spark's join zoo lacks.

``asof_join(left, right)`` attaches to each left row the payload of the
LATEST right row whose ordering value is <= the left's, per key — the
canonical "enrich event with most recent state" operation (price at
order time, last login before purchase, sensor state at reading).

Implementation is a composition of existing DataFrame ops (SURVEY.md
custom-operator path (a)): union the two sides tagged by origin, then a
per-key window ordered by (ts, origin) carries the right payload forward
with ``last(..., ignorenulls=True)``. ONE shuffle on the key — the same
exchange a plain equi-join would pay — instead of the naive
inequality-join crossproduct, and zero Python.

Tie semantics: a right row at exactly the left ordering value IS
eligible (<=), matching DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` (the
oracle for q34). Duplicate right rows on (key, ts) are resolved by
payload order (max wins) to stay deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
) -> DataFrame:
    """Left rows (all columns preserved) + latest-right ``payload``
    columns as of ``left_ts``; NULL payload when no right row precedes.

    ``left_ts``/``right_ts`` may be any orderable type (timestamp, epoch
    millis, version number). ``payload`` names must not collide with left
    column names.
    """
    on = list(on)
    rtypes = dict(right.dtypes)
    l_tagged = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    for c in payload:
        l_tagged = l_tagged.withColumn(f"__p_{c}", F.lit(None).cast(rtypes[c]))
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__is_left", *[f"__p_{c}" for c in payload])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload
        ],
    )
    return carried.filter(F.col("__is_left") == 1).drop(
        "__ts", "__is_left", *[f"__p_{c}" for c in payload]
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
) -> DataFrame:
    """The FORWARD direction (pandas merge_asof direction='forward'):
    each left row gets the payload of the EARLIEST right row whose
    ordering value is >= the left's, per key — "next state at or after"
    (next purchase after a view, next deploy after an alert). Same
    union+window composition as :func:`asof_join`, with the carry
    running over DESCENDING order so ``last(ignorenulls)`` holds the
    minimal eligible right row; a right row at exactly the left value
    IS eligible, and duplicate right rows on (key, ts) resolve to the
    max payload (the backward join's determinism rule)."""
    on = list(on)
    rtypes = dict(right.dtypes)
    l_tagged = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    for c in payload:
        l_tagged = l_tagged.withColumn(f"__p_{c}", F.lit(None).cast(rtypes[c]))
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("__ts").desc(),
            F.col("__is_left").asc(),
            *[F.col(f"__p_{c}").asc() for c in payload],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload
        ],
    )
    return carried.filter(F.col("__is_left") == 1).drop(
        "__ts", "__is_left", *[f"__p_{c}" for c in payload]
    )
