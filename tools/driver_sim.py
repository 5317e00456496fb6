"""Simulate the driver's verify pass against __spark_entry__.py.

Runs, in a fresh SparkSession:
1. entry(spark) smoke check (rows > 0, stable schema),
2. every queries() entry at the given sf dir,
3. the matching oracle_sql() through DuckDB,
and compares row count + sorted column names + order-insensitive
values, printing one status line per query and a summary.

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
            cur = con.execute(oracles[name])
            d_colnames = [d[0] for d in cur.description]
            d_order = sorted(range(len(d_colnames)), key=lambda i: d_colnames[i])
            d_rows = sorted(
                tuple(canon(r[i]) for i in d_order) for r in cur.fetchall()
            )
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
