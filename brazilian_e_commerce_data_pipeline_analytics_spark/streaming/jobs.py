"""Structured Streaming variants (SURVEY.md §2.9).

The reference's cadence is a 30-min full batch recompute
(``Dag/E-commerce_dag.py:88``); the streaming-native generalization is a
micro-batch pipeline: file source → event-time windowed aggregation →
sink, with watermarks bounding state. Batch parity is the correctness
bar: ``q53_stream_hourly`` runs a real streaming query (availableNow
trigger, complete mode, memory sink) and must produce exactly the batch
answer — which the DuckDB oracle then verifies value-for-value.

``sessionize_stateful`` is the custom stateful operator path
(``applyInPandasWithState``): event-time session windows with a gap
timeout, the canonical thing tumbling windows can't express.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..catalog import table_path
from ..functions.compat import dmoney
from ..registry import register

_COUNTER = itertools.count()


def hourly_agg(df: DataFrame) -> DataFrame:
    """The shared batch/stream aggregation: tumbling 1-hour event-time
    windows per event type (no distinct aggs — streaming-compatible)."""
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dmoney("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_stream_to_memory(
    spark: SparkSession, stream_df: DataFrame, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into a
    memory sink; returns the final result as a batch DataFrame."""
    name = f"stream_result_{next(_COUNTER)}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


_Q53_ORACLE = """
SELECT date_trunc('hour', ts) AS hour_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("q53_stream_hourly", oracle=_Q53_ORACLE, tags=("streaming",))
def q53_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Structured Streaming micro-batch run with batch-parity output."""
    stream = _events_stream(spark, sf_dir)
    return run_stream_to_memory(spark, hourly_agg(stream))


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table.

    Spark's file stream source requires a *directory*, and the test data
    is a single parquet file — expose it through a repo-local symlink dir.
    Also applies the TIMESTAMP(NANOS) -> microsecond conversion (see
    catalog._load_events).
    """
    import os

    path = table_path(sf_dir, "events")
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    stream_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                              ".tmp", "stream", f"events_{sf_name}")
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(path, link)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    if dict(stream.dtypes)["ts"] == "bigint":  # TIMESTAMP(NANOS) read as long
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def hourly_agg_watermarked(df: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Append-mode variant: watermark bounds state so late events beyond
    the horizon are dropped and closed windows are emitted exactly once.
    This is the 100-TB-stream shape — state size is O(open windows), not
    O(history)."""
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events")
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", TimestampType(), True),
        StructField("session_end", TimestampType(), True),
        StructField("n_events", LongType(), True),
        StructField("event_types", StringType(), True),
    ]
)


def sessionize_batch(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization via gap detection (window lag + cumulative
    session ids) — the deterministic reference semantics for the stateful
    streaming twin, and a useful operator in its own right."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    with_ids = df.withColumn("__new", new_session).withColumn(
        "session_seq", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_ids.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias(
                "event_types"
            ),
        )
    )


def sessionize_stateful(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization with ``applyInPandasWithState``.

    Custom per-user session state with an event-time gap timeout; emits a
    row per closed session. Works on a streaming DataFrame grouped by
    user; state is one (start, end, count, types) tuple per open session.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = gap_minutes * 60

    state_schema = StructType(
        [
            StructField("start_s", LongType()),
            StructField("end_s", LongType()),
            StructField("n", LongType()),
            StructField("types", StringType()),
        ]
    )

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        rows = []
        events = pd.concat(list(pdf_iter)).sort_values("ts")
        if state.exists:
            start_s, end_s, n, types = state.get
            types = set(types.split(",")) if types else set()
        else:
            start_s, end_s, n, types = None, None, 0, set()
        for _, r in events.iterrows():
            ts_s = int(r["ts"].timestamp())
            if end_s is not None and ts_s - end_s > gap_s:
                rows.append((user_id, pd.Timestamp(start_s, unit="s"),
                             pd.Timestamp(end_s, unit="s"), n, ",".join(sorted(types))))
                start_s, end_s, n, types = ts_s, ts_s, 0, set()
            if start_s is None:
                start_s = ts_s
            end_s = max(end_s or ts_s, ts_s)
            n += 1
            types.add(str(r["event_type"]))
        state.update((start_s, end_s, n, ",".join(sorted(types))))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["user_id", "session_start", "session_end", "n_events", "event_types"],
            )

    return (
        df.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
