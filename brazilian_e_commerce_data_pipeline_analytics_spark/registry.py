"""Query registry: every operator capability exposed as a named query.

Each entry pairs a PySpark builder ``(spark, sf_dir) -> DataFrame`` with an
equivalent DuckDB oracle SQL string (or ``None`` for genuinely
non-SQL-expressible ops, which get a weaker rows-only check). The driver
harness and the local differential tests (tests/test_oracle_parity.py) both
consume this table, so a query that passes locally passes the driver.

Determinism contract for every registered query:
- no ``first()`` / bare ``dropDuplicates`` / nondeterministic picks;
- money sums via decimal (functions/compat.py), computed doubles rounded
  before aggregation/comparison;
- ranks use a total order (metric + unique-key tiebreaker);
- output column names identical between builder and oracle.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

# Modules whose import populates the registry.
_QUERY_MODULES = (
    "brazilian_e_commerce_data_pipeline_analytics_spark.analytics.core",
    "brazilian_e_commerce_data_pipeline_analytics_spark.analytics.windows_q",
    "brazilian_e_commerce_data_pipeline_analytics_spark.analytics.events_q",
    "brazilian_e_commerce_data_pipeline_analytics_spark.llm.text_q",
    "brazilian_e_commerce_data_pipeline_analytics_spark.llm.dedup_q",
    "brazilian_e_commerce_data_pipeline_analytics_spark.llm.similarity_q",
    "brazilian_e_commerce_data_pipeline_analytics_spark.llm.multimodal",
    "brazilian_e_commerce_data_pipeline_analytics_spark.streaming.jobs",
)


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)


def spark_queries() -> dict[str, Builder]:
    return {q.name: q.builder for q in all_queries().values()}


def oracle_queries() -> dict[str, str]:
    return {q.name: q.oracle for q in all_queries().values() if q.oracle is not None}
