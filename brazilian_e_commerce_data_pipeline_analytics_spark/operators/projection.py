"""Rename/projection operator (SURVEY.md §2.2 P1).

The reference hard-codes a ``select(col(x).alias(y), ...)`` block per table
(``transformation.py:28-120``); here the same operation is a single
parameterized operator driven by a column-spec mapping. Projections are
narrow (no shuffle) and Catalyst collapses adjacent ones, so composing this
freely is free at any scale; column pruning pushes the projection into the
parquet scan (check: ``ReadSchema`` in the formatted plan).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rename_select(df: DataFrame, spec: Mapping[str, str | Column]) -> DataFrame:
    """Project to exactly the columns in ``spec``: out_name -> source.

    ``source`` may be an input column name or an arbitrary Column
    expression. Order of ``spec`` defines output column order.
    """
    cols = []
    for out_name, src in spec.items():
        c = F.col(src) if isinstance(src, str) else src
        cols.append(c.alias(out_name))
    return df.select(*cols)
