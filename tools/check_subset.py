"""Compare a SUBSET of registered queries against their DuckDB oracles
using exactly the driver_sim comparison semantics (arrow oracle path,
bit-exact float canon). Fast iteration tool for new queries.

    python tools/check_subset.py q125_heavy_hitters q126_weighted_sample [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys

import duckdb

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from driver_sim import canon, hugeint_sweep, oracle_rows_arrow_path  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]

    import __spark_entry__ as e
    from brazilian_e_commerce_data_pipeline_analytics_spark.catalog import TABLES, table_path
    from brazilian_e_commerce_data_pipeline_analytics_spark.session import get_spark

    spark = get_spark(app_name="check-subset")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")

    subset = {n: oracles[n] for n in args if n in oracles}
    bad = hugeint_sweep(con, subset)
    n_fail = 0
    for name in bad:
        print(f"{name}: HUGEINT in oracle output — cast to BIGINT")
        n_fail += 1
    for name in args:
        if name not in qs:
            print(f"{name}: UNKNOWN")
            n_fail += 1
            continue
        sdf = qs[name](spark, sf_dir)
        s_cols = sorted(sdf.columns)
        s_rows = sorted(tuple(canon(r[c]) for c in s_cols) for r in sdf.collect())
        if name not in oracles:
            print(f"{name}: rows-only, {len(s_rows)} rows")
            continue
        d_cols, d_rows = oracle_rows_arrow_path(con, oracles[name])
        if s_cols != sorted(d_cols):
            print(f"{name}: COLS MISMATCH spark={s_cols} duck={sorted(d_cols)}")
            n_fail += 1
        elif s_rows != d_rows:
            n_fail += 1
            print(f"{name}: VALUES MISMATCH n_spark={len(s_rows)} n_duck={len(d_rows)}")
            for a, b in list(zip(s_rows, d_rows))[:200]:
                if a != b:
                    print(f"  spark={a}\n  duck ={b}")
                    break
            only_s = [r for r in s_rows if r not in set(d_rows)][:2]
            only_d = [r for r in d_rows if r not in set(s_rows)][:2]
            if only_s:
                print(f"  only-spark: {only_s}")
            if only_d:
                print(f"  only-duck : {only_d}")
        else:
            print(f"{name}: OK, {len(s_rows)} rows")
    return n_fail


if __name__ == "__main__":
    sys.exit(main())
