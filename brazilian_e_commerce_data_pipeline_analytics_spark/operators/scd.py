"""Slowly-changing dimension (type 2) maintenance.

The reference rebuilds every dimension from scratch each run
(``reporting.py`` overwrite mode) — history is lost. ``scd2_merge``
maintains versioned dimension rows instead: each natural key carries a
``valid_from``/``valid_to`` interval and an ``is_current`` flag; an
incoming batch of updates closes changed rows and appends new versions.

Pure DataFrame composition (joins + unions), deterministic, and
idempotent: re-applying a batch whose values already match the open
version changes nothing. On a lakehouse table format the final
write-back becomes MERGE INTO; on plain parquet, overwrite the dimension
path with the returned frame (dimensions are small next to facts).

Scale shape: one shuffle on the natural key (the join), a broadcast if
the update batch is small — never a scan of history beyond the open
rows if the dimension is stored partitioned by ``is_current``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _attrs_differ(attrs: Sequence[str], left: str, right: str) -> Column:
    """NULL-safe 'any attribute changed' predicate."""
    cond = F.lit(False)
    for a in attrs:
        cond = cond | ~F.col(f"{left}.{a}").eqNullSafe(F.col(f"{right}.{a}"))
    return cond


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: Sequence[str],
    effective_col: str,
    start_col: str = "valid_from",
    end_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Return the new full dimension state after applying ``updates``.

    ``dim`` columns: key, attrs, start/end/current bookkeeping.
    ``updates`` columns: key, attrs, ``effective_col`` timestamp.
    Multiple updates per key in one batch are reduced to the latest by
    (effective, attrs) — a total order, so the pick is deterministic.
    """
    latest = (
        updates.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(key).orderBy(
                    F.col(effective_col).desc(),
                    *[F.col(a).desc_nulls_last() for a in attrs],
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    closed_history = dim.filter(~F.col(current_col))
    open_rows = dim.filter(F.col(current_col))

    o = open_rows.alias("o")
    u = latest.alias("u")
    changed = _attrs_differ(attrs, "o", "u")
    joined = o.join(u, on=key, how="full_outer")

    # open rows without a differing update survive untouched
    unchanged = joined.filter(
        F.col(f"o.{start_col}").isNotNull()
        & (F.col(f"u.{effective_col}").isNull() | ~changed)
    ).select([F.col(f"o.{c}").alias(c) for c in open_rows.columns if c != key] + [F.col(key)])

    # open rows with a differing update get closed at the update's time
    closed_now = (
        joined.filter(
            F.col(f"o.{start_col}").isNotNull()
            & F.col(f"u.{effective_col}").isNotNull()
            & changed
        )
        .select(
            F.col(key),
            *[F.col(f"o.{a}").alias(a) for a in attrs],
            F.col(f"o.{start_col}").alias(start_col),
            F.col(f"u.{effective_col}").alias(end_col),
            F.lit(False).alias(current_col),
        )
    )

    # new versions: differing updates + brand-new keys
    inserted = (
        joined.filter(
            F.col(f"u.{effective_col}").isNotNull()
            & (F.col(f"o.{start_col}").isNull() | changed)
        )
        .select(
            F.col(key),
            *[F.col(f"u.{a}").alias(a) for a in attrs],
            F.col(f"u.{effective_col}").alias(start_col),
            F.lit(None).cast(dict(dim.dtypes)[end_col]).alias(end_col),
            F.lit(True).alias(current_col),
        )
    )

    cols = dim.columns
    return (
        closed_history.select(cols)
        .unionByName(unchanged.select(cols))
        .unionByName(closed_now.select(cols))
        .unionByName(inserted.select(cols))
    )
