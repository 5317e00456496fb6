"""Local differential harness mirroring the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle at
sf0.001 and compares row count, column names and (order-insensitively)
every value with STRICT equality. A query that passes here should pass
any reasonable driver-side hash comparison; floating-point slop is a
bug in the query's determinism strategy, not tolerance to be added here.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from brazilian_e_commerce_data_pipeline_analytics_spark.catalog import TABLES, table_path
from brazilian_e_commerce_data_pipeline_analytics_spark.registry import all_queries

from .conftest import SF_SMALL

QUERIES = all_queries()
ORACLE_NAMES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
NO_ORACLE_NAMES = sorted(n for n, q in QUERIES.items() if q.oracle is None)


def _duck_result(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _canon(v):
    """Canonicalize a value for strict cross-engine comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    return f"s:{v}"


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, name):
    q = QUERIES[name]
    sdf = q.builder(spark, SF_SMALL)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = _duck_result(q.oracle, SF_SMALL)

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} (spark) != {len(d_rows)} (duckdb)"
    )
    sc, s_norm = _normalize(s_cols, s_rows)
    dc, d_norm = _normalize(d_cols, d_rows)
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(s_norm)} rows differ; "
        f"first: spark={mismatches[0][0]} duck={mismatches[0][1]} cols={sc}"
    )


@pytest.mark.parametrize("name", NO_ORACLE_NAMES)
def test_rows_only_queries_run(spark, name):
    q = QUERIES[name]
    sdf = q.builder(spark, SF_SMALL)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_no_oracle_emits_hugeint():
    """DuckDB types SUM()/'//' over integers as HUGEINT (INT128); the
    driver materializes oracles via arrow, which has no int128, so such
    columns degrade to float64 and hash-mismatch Spark's bigint even
    when every value agrees (the r02 q88/q90/q98 red rows). Every
    integer aggregate in an oracle must be CAST(... AS BIGINT)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF_SMALL, t)}'"
        )
    bad = {}
    for name in ORACLE_NAMES:
        try:
            types = [str(t).upper() for t in con.sql(QUERIES[name].oracle).types]
        except Exception:  # noqa: BLE001 — execution errors belong to the parity test
            continue
        huge = [t for t in types if "HUGEINT" in t or "INT128" in t]
        if huge:
            bad[name] = huge
    con.close()
    assert not bad, f"oracles emitting INT128 columns (cast to BIGINT): {bad}"
