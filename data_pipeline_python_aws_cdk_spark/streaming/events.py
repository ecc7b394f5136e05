"""Structured Streaming over the events table.

The reference's "streaming" is a daily batch cadence (EventBridge cron ->
Lambda; SURVEY.md §2.4) — the engine keeps that batch path (sources/ingest)
and adds true streaming equivalents for the event analytics:

- ``hourly_event_counts``   tumbling-window counts with a watermark (late
                            data bounded at 2 h; state pruned continuously)
- ``sessionize_stream``     native ``session_window`` (30-min gap), the
                            streaming twin of operators/analytics.events_sessionize
- ``user_running_stats``    custom stateful operator via
                            ``applyInPandasWithState`` — running per-user
                            totals across triggers with explicit GroupState

Scale notes: all state is keyed (window x type, session x user, user), so it
shards across executors; watermarks bound state size; ``availableNow``
triggers give replayable batch-equivalent runs (used in tests and backfills).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over a directory of event parquet files.

    New files appearing under ``events_dir`` become micro-batch input — the
    streaming mirror of the ingest path's append-only daily drops.

    The driver testdata stores ts as parquet TIMESTAMP(NANOS) (surfaced as
    epoch-nanos int64 under spark.sql.legacy.parquet.nanosAsLong); detect
    that from the batch footer and convert exactly like tables.load_table.
    """
    batch_dtypes = dict(spark.read.parquet(events_dir).dtypes)
    if batch_dtypes.get("ts") == "bigint":
        raw_schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.LongType())
                for f in EVENT_SCHEMA.fields
            ]
        )
        stream = spark.readStream.schema(raw_schema).parquet(events_dir)
        return stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)


def hourly_event_counts(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windowed counts per event type with late-data bound.

    Watermark prunes window state beyond ``watermark`` behind the max seen
    event time — state stays O(active windows x types) regardless of stream
    length. Output schema matches the batch twin
    (operators/analytics.events_hourly_windows).
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "events",
            "total_value",
        )
    )


def sessionize_stream(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: events within ``gap`` of each other merge
    into one session. Streaming twin of the batch lag-based sessionizer."""
    return (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("events"))
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.col("session_window.end"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "events",
        )
    )


STATE_SCHEMA = "events long, total_value double"
OUTPUT_SCHEMA = "user_id long, events long, total_value double"


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """GroupState update: accumulate per-user counts/sums across triggers."""
    (user_id,) = key
    events, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        events += len(pdf)
        total += float(pdf["value"].sum())
    state.update((events, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "events": [events], "total_value": [total]}
    )


def user_running_stats(stream: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user event count + value sum via
    ``applyInPandasWithState``.

    This is the escape hatch for stateful semantics Spark's built-in
    windows can't express (per-key counters, ML feature state, CDC merge).
    State is an explicit typed tuple per user; Arrow batches keep the
    Python crossing vectorized.
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(stream: DataFrame, query_name: str, output_mode: str = "complete") -> list:
    """Drain the stream with an availableNow trigger into a memory sink and
    return the materialized rows (test/backfill harness).

    ``output_mode``: "complete" for full-rewrite aggregations, "update" for
    stateful operators, "append" for finalized-only window emission.
    """
    spark = stream.sparkSession
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}").collect()
