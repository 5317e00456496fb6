"""Simulate the driver's verify pass against __spark_entry__.py.

Runs, in a fresh SparkSession:
1. entry(spark) smoke check (rows > 0, stable schema),
2. every queries() entry at the given sf dir,
3. the matching oracle_sql() through DuckDB,
and compares row count + sorted column names + order-insensitive
values, printing one status line per query and a summary.

Oracle results are materialized through DuckDB's ARROW export, NOT
``fetchall()``: the driver compares dataframe materializations, and
arrow has no int128, so DuckDB HUGEINT (any SUM() over integers)
degrades to float64 on that path — ``i:1`` hashes against ``f:1.0``.
``fetchall()`` (HUGEINT → Python int) silently masks that class; round
2 shipped 3 red rows (q88/q90/q98) this sim called green for exactly
that reason. Decimal128/date32 survive arrow intact, so everything
else stays an exact compare. A schema-level sweep additionally
hard-fails any oracle whose output type list contains HUGEINT at all.

Usage: python tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    return f"s:{v}"


def oracle_rows_arrow_path(con, sql):
    """Materialize an oracle the way the driver does: via arrow.

    Returns (colnames, sorted canonical row tuples). Arrow preserves
    decimal128/date32/timestamps exactly but has no int128, so HUGEINT
    columns arrive as float64 — the same degradation the driver's
    comparison sees.
    """
    tbl = con.sql(sql).arrow()
    cols = list(tbl.column_names)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        tuple(canon(rec[cols[i]]) for i in order) for rec in tbl.to_pylist()
    )
    return cols, rows


_HUGE = ("HUGEINT", "INT128", "UHUGEINT")


def hugeint_sweep(con, oracles) -> list[str]:
    """Return oracle names whose output schema contains an INT128 type.

    DuckDB types SUM()/product()/'//' over integers as HUGEINT; the
    driver's arrow materialization degrades that to float64 and the
    value hash diverges from Spark's bigint. Every oracle must cast
    such columns to BIGINT explicitly.
    """
    bad = []
    for name, sql in sorted(oracles.items()):
        try:
            types = [str(t).upper() for t in con.sql(sql).types]
        except Exception:  # noqa: BLE001 — execution errors surface later
            continue
        if any(h in t for t in types for h in _HUGE):
            bad.append(name)
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from brazilian_e_commerce_data_pipeline_analytics_spark.catalog import TABLES, table_path
    from brazilian_e_commerce_data_pipeline_analytics_spark.session import get_spark

    spark = get_spark(app_name="driver-sim")

    t0 = time.time()
    entry_df = e.entry(spark)
    n = entry_df.count()
    print(f"entry(): {n} rows, schema={[f.name for f in entry_df.schema.fields]}, "
          f"{time.time() - t0:.1f}s")
    assert n > 0

    qs = e.queries()
    oracles = e.oracle_sql()
    print(f"{len(qs)} queries, {len(oracles)} with oracle, sf_dir={sf_dir}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")

    n_pass = n_fail = 0
    huge = hugeint_sweep(con, oracles)
    if huge:
        n_fail += len(huge)
        for name in huge:
            print(f"  {name:32s} HUGEINT: oracle emits INT128 columns — "
                  f"cast them to BIGINT (driver arrow path → float64)")
    for name in sorted(qs):
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            s_cols = sorted(sdf.columns)
            s_rows = sorted(
                tuple(canon(r[c]) for c in s_cols) for r in sdf.collect()
            )
            if name not in oracles:
                print(f"  {name:32s} rows-only: {len(s_rows)} rows "
                      f"[{time.time() - t0:.1f}s]")
                n_pass += 1
                continue
            d_colnames, d_rows = oracle_rows_arrow_path(con, oracles[name])
            ok_cols = s_cols == sorted(d_colnames)
            ok = ok_cols and s_rows == d_rows
            if ok:
                n_pass += 1
                print(f"  {name:32s} OK: {len(s_rows)} rows match "
                      f"[{time.time() - t0:.1f}s]")
            else:
                n_fail += 1
                diff = [
                    (a, b) for a, b in zip(s_rows, d_rows) if a != b
                ][:1] if ok_cols and len(s_rows) == len(d_rows) else []
                print(f"  {name:32s} MISMATCH cols_ok={ok_cols} "
                      f"spark={len(s_rows)} duck={len(d_rows)} first_diff={diff}")
        except Exception as ex:  # noqa: BLE001
            n_fail += 1
            print(f"  {name:32s} ERROR: {type(ex).__name__}: {str(ex)[:140]}")
    print(f"SUMMARY: {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
