"""Bronze layer: CSV ingest to parquet (SURVEY.md §3 EP1).

One shared SparkSession for all nine tables (the reference builds a new
session per table, ``ingestion.py:5-9``), explicit schemas (no inference
pass), parquet at rest instead of JDBC row-store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import read_csv
from ..sources.writers import write_parquet
from .schemas import BRONZE_SCHEMAS


def ingest_csv_dir(
    spark: SparkSession,
    csv_dir: str,
    bronze_dir: str,
    tables: dict[str, str] | None = None,
) -> dict[str, DataFrame]:
    """Ingest ``{table: csv_filename}`` (defaults to ``<table>.csv``)."""
    tables = tables or {name: f"{name}.csv" for name in BRONZE_SCHEMAS}
    out = {}
    for name, fname in tables.items():
        df = read_csv(spark, f"{csv_dir}/{fname}", schema=BRONZE_SCHEMAS[name])
        write_parquet(df, f"{bronze_dir}/{name}")
        out[name] = df
    return out
