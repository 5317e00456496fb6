"""Registered query exercising the EXECUTABLE JDBC path (SURVEY §2.1
S2/S4) against embedded Derby.

The reference's entire storage layer is JDBC (``ingestion.py:15-22``
write, ``transformation.py:15-21`` read, ``reporting.py:411-424`` tuned
batched write). Round 1 could only ship the surface — "no database in
the container" — but Spark's own distribution bundles the Derby jars
(for the Hive metastore), so an in-memory Derby database exercises the
real code path with zero installs: tuned batched write, then a
partitioned JDBC scan (never the 1-task trap), then an aggregate whose
oracle reads the same rows straight from parquet. If Spark's JDBC
read or write dropped, duplicated, or mangled a row, the value-exact
comparison would catch it.

The partition bounds come from a driver-side min/max of the key — the
canonical JDBC pattern (2 longs through the driver, metadata not data;
the reference hard-codes its bounds instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.compat import dsum
from ..registry import register
from .readers import read_jdbc
from .writers import write_jdbc

_URL = "jdbc:derby:memory:q104db;create=true"
_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

_Q104_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderstatus
"""


@register("q104_jdbc_roundtrip", oracle=_Q104_ORACLE, tags=("source", "jdbc"))
def q104_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    write_jdbc(o, _URL, "orders_rt", batch_size=1000, driver=_DRIVER)
    bounds = o.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).collect()[0]
    back = read_jdbc(
        spark,
        _URL,
        "orders_rt",
        partition_column="o_orderkey",
        lower_bound=int(bounds["lo"]),
        upper_bound=int(bounds["hi"]) + 1,
        num_partitions=8,
        driver=_DRIVER,
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_price"),
    )
