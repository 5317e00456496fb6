"""Ad-hoc query runner: execute one registered query and show its
result and physical plan.

    python tools/run_query.py q20_monthly_revenue_yoy [sf_dir] [--plan]

Lists all query names when called without arguments.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from brazilian_e_commerce_data_pipeline_analytics_spark.registry import all_queries

    queries = all_queries()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    show_plan = "--plan" in sys.argv
    if not args:
        print("registered queries:")
        for name, q in sorted(queries.items()):
            oracle = "oracle" if q.oracle else "rows-only"
            print(f"  {name:34s} [{oracle}] tags={','.join(q.tags)}")
        return
    name = args[0]
    if name not in queries:
        sys.exit(f"unknown query {name!r}; run with no args to list")
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"

    from brazilian_e_commerce_data_pipeline_analytics_spark.session import get_spark

    spark = get_spark(app_name=f"run-{name}", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    df = queries[name].builder(spark, sf_dir)
    df.show(20, truncate=False)
    print(f"({df.count()} rows total)")
    if show_plan:
        from brazilian_e_commerce_data_pipeline_analytics_spark.plans.explain import formatted_plan

        print(formatted_plan(df))


if __name__ == "__main__":
    main()
