"""SparkSession factory tuned for the engine.

The reference hand-tunes a session per job (``spark_jobs/reporting.py:7-25``:
AQE, coalesce, skew join, 50 MB broadcast threshold, Arrow). We keep those
ideas but size shuffle partitions from the available cores and leave AQE to
re-plan at runtime — the same config scales from local[32] tests to a
1000-executor cluster where ``spark.sql.shuffle.partitions`` would be set
to ~2-3x total cores by the deployer.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

BROADCAST_THRESHOLD = 50 * 1024 * 1024  # 50 MB, mirrors reference reporting.py:16


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "bedpa-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-ready defaults.

    - AQE on (runtime coalesce + skew-join splitting) so the static
      shuffle-partition count only needs to be an upper bound.
    - UTC session timezone so timestamp semantics match the DuckDB oracle.
    - Arrow enabled for the Pandas-UDF paths (llm/ + multimodal).
    """
    cpus = cpus or default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 8)))
        .config("spark.sql.autoBroadcastJoinThreshold", str(BROADCAST_THRESHOLD))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    active = SparkSession.getActiveSession()
    if active is None:
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
