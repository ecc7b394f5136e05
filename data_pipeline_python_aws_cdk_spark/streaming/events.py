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
- ``enrich_with_segment``   stream-static broadcast dimension join (static
                            side re-resolved per micro-batch)
- sinks: memory drain (``run_available_now``), durable checkpointed file
  sink (``run_to_files``), foreachBatch MERGE (``run_upsert_sink``);
  observability: ``stream_health`` / ``run_available_now_with_health``
  (rows/sec, batch timing, watermark position, keyed-state size)

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

    The driver testdata has stored ts two ways across rounds: parquet
    TIMESTAMP(NANOS) (surfaced as epoch-nanos int64 under
    spark.sql.legacy.parquet.nanosAsLong, converted below) and
    TIMESTAMP(MICROS, isAdjustedToUTC=false) (which ensure_session_confs'
    NTZ-inference-off conf surfaces as session-zoned TIMESTAMP at the scan
    — no branch needed). Detect the layout from the batch footer and
    normalize exactly like tables.load_table.
    """
    from data_pipeline_python_aws_cdk_spark.tables import ensure_session_confs

    ensure_session_confs(spark)
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
    into one session. Streaming twin of the batch lag-based sessionizer.

    Boundary convention: ``session_window`` extends a session over the
    half-open interval ``[ts, ts + gap)``, so an event landing *exactly*
    ``gap`` after the previous one starts a NEW session. The batch
    sessionizer (operators/analytics.events_sessionize) uses the opposite
    closed convention (``lag > gap`` splits, exact tie stays). Each twin's
    DuckDB oracle matches its own convention (``>=`` here, ``>`` there);
    the two only disagree on exact-tie events, which the synthetic
    microsecond-resolution timestamps make practically unreachable — and
    each differential check is self-consistent regardless.
    """
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
    The memory sink cannot recover from a checkpoint; for resumable
    multi-batch runs use ``run_to_files`` (durable file sink).
    """
    spark = stream.sparkSession
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    q = q.start()
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}").collect()


def run_to_files(
    stream: DataFrame, output_dir: str, checkpoint_dir: str, fmt: str = "parquet"
) -> None:
    """Drain the stream into a durable file sink with a checkpoint.

    The checkpoint persists source offsets, the watermark, and window state,
    so a later call with the same ``checkpoint_dir`` RESUMES: already-seen
    files are skipped, the restored watermark drops late data, and newly
    finalized windows append to ``output_dir``. This is the production
    shape (stream -> partitioned files) and what multi-batch semantics
    tests drive.
    """
    q = (
        stream.writeStream.format(fmt)
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_upsert_sink(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    version_col: str,
    partition_cols: list[str] | None = None,
) -> None:
    """Incremental materialization: drain the stream through ``foreachBatch``
    into a keyed warehouse table with MERGE semantics (last writer wins by
    ``version_col``) — the sink side the plain file sink cannot provide,
    because append-only emission can never *revise* a row.

    Each micro-batch reuses ``maintenance.upsert``: existing rows not in the
    batch survive, key collisions resolve by highest version. The checkpoint
    makes delivery effectively-once end-to-end: a replayed batch re-merges
    the same keys at the same versions, which is idempotent by construction
    — the exactly-once-sink recipe for engines without transactional
    streaming tables. Pass ``partition_cols`` so each merge rewrites only
    the partitions the batch touches (without them every batch is a
    full-table rewrite — fine for small materializations, wrong at scale).
    """
    from pyspark.sql import Window as W

    from ..maintenance import upsert

    def _table_exists(spark: SparkSession) -> bool:
        # Scheme-agnostic existence probe via the Hadoop FileSystem API:
        # os.path only understands bare local paths (every file:///s3a://
        # table would look absent), and a schema-read probe that swallows
        # ALL exceptions turns a transient read failure (S3 throttle,
        # credential hiccup, listing error) on an EXISTING table into the
        # bootstrap mode('overwrite') branch — destroying merged data.
        # fs.exists only raises on real IO trouble, which we propagate.
        from ..sources.objectstore import hadoop_fs

        fs, path = hadoop_fs(spark, table_path)
        if not fs.exists(path):
            return False
        # Present but empty (a bare directory, e.g. from a died bootstrap
        # write) counts as absent: the overwrite branch is then safe and the
        # upsert branch would fail its read anyway.
        it = fs.listFiles(path, True)
        while it.hasNext():
            f = it.next()
            name = f.getPath().getName()
            if f.getLen() > 0 and not name.startswith(("_", ".")):
                return True
        return False

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            spark = batch_df.sparkSession
            if _table_exists(spark):
                upsert(
                    spark,
                    table_path,
                    batch_df,
                    key_cols=key_cols,
                    version_col=version_col,
                    partition_cols=partition_cols,
                )
            else:
                # Bootstrap write must apply the same last-writer-wins
                # reduction as the merge path: a cold start over a backlog
                # delivers several versions of one key in a single batch.
                w = W.partitionBy(*key_cols).orderBy(F.col(version_col).desc())
                winners = (
                    batch_df.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                )
                writer = winners.write.mode("overwrite")
                if partition_cols:
                    writer = writer.partitionBy(*partition_cols)
                writer.parquet(table_path)

    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# --- driver-registry entries ----------------------------------------------
# Each runs the REAL Structured Streaming query (readStream -> watermarked
# aggregation -> availableNow drain) and returns the drained result as a
# DataFrame. With availableNow over the static events file the runs are
# replayable, so each entry carries a full SQL oracle — streaming results
# are differentially checked against DuckDB like every batch operator.

QUERIES = {}
ORACLES = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _drain(spark: SparkSession, result_df: DataFrame, output_mode: str) -> DataFrame:
    import uuid

    name = f"stream_{uuid.uuid4().hex[:12]}"
    rows = run_available_now(result_df, name, output_mode)
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, result_df.schema)


def _stream_dir(sf_dir: str) -> str:
    """Spark's file streaming source wants a *directory* of files; the driver
    testdata is one parquet per table (read-only). Stage a per-sf_dir temp
    directory holding a symlink to events.parquet — zero copy, and repeated
    calls reuse it."""
    import hashlib
    import os
    import tempfile

    src = os.path.abspath(f"{sf_dir}/events.parquet")
    tag = hashlib.md5(src.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"spark-graft-stream-{tag}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    return d


@_register(
    "streaming_hourly_counts",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts, drained with availableNow.

    The streaming twin of analytics.events_hourly_windows — same oracle
    shape; the watermark bounds state at 2 h behind max event time."""
    stream = read_event_stream(spark, _stream_dir(sf_dir))
    return _drain(spark, hourly_event_counts(stream), "complete")


@_register(
    "streaming_sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS sessions, COUNT(*) AS events
    FROM g GROUP BY user_id
    """,
)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window sessions, folded to per-user (sessions, events)
    so the result is comparable to the batch lag-gap sessionizer's oracle —
    the two formulations must agree on every session boundary."""
    stream = read_event_stream(spark, _stream_dir(sf_dir))
    sessions = _drain(spark, sessionize_stream(stream), "complete")
    return sessions.groupBy("user_id").agg(
        F.count("*").alias("sessions"), F.sum("events").alias("events")
    )


@_register(
    "streaming_user_stats",
    oracle="""
    SELECT user_id, COUNT(*) AS events, ROUND(SUM(value), 4) AS total_value
    FROM events GROUP BY user_id
    """,
)
def streaming_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running totals, drained with availableNow.

    One trigger over the static file -> the final state per user is the
    last update row; rounded to 4 dp to absorb float-sum order."""
    stream = read_event_stream(spark, _stream_dir(sf_dir))
    stats = _drain(spark, user_running_stats(stream), "update")
    return stats.select(
        "user_id", "events", F.round("total_value", 4).alias("total_value")
    )


def distinct_pairs_stream(stream: DataFrame) -> DataFrame:
    """Streaming dedup: first occurrence of each (user_id, event_type).

    ``dropDuplicates`` keeps exact, unbounded per-key state — correct for
    bounded key domains (here: users x event types). For unbounded domains
    at 100 TB use ``dropDuplicatesWithinWatermark`` instead (state pruned
    behind the watermark, exactness traded for bounded memory); that
    variant's semantics are pinned by tests/test_streaming.py on
    constructed late duplicates.
    """
    return (
        stream.withWatermark("ts", "2 hours")
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
    )


def click_purchase_join_stream(stream: DataFrame, horizon_s: int = 300) -> DataFrame:
    """Watermarked stream-stream inner join: each purchase matched to the
    same user's clicks in the preceding ``horizon_s`` seconds.

    Both sides carry watermarks and the join predicate bounds event-time
    distance, so each side's buffered state is prunable: a click older than
    watermark + horizon can never match a future purchase and is dropped.
    An unbounded (equi-only) stream-stream join would grow state forever —
    the time bound is what makes this viable on infinite streams.
    """
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
    )
    buys = (
        stream.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = clicks.join(
        buys,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {horizon_s} SECOND")),
        "inner",
    )
    return joined.select(
        F.col("c_user").alias("user_id"), "click_id", "purchase_id"
    )


@_register(
    "streaming_distinct_pairs",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    ORDER BY user_id, event_type
    """,
)
def streaming_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup drained with availableNow; the emitted set equals
    batch DISTINCT regardless of which physical row arrived first."""
    stream = read_event_stream(spark, _stream_dir(sf_dir))
    out = _drain(spark, distinct_pairs_stream(stream), "append")
    return out.orderBy("user_id", "event_type")


@_register(
    "streaming_click_purchase_join",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 300 SECOND
    ORDER BY click_id, purchase_id
    """,
)
def streaming_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join drained with availableNow; pair set is
    exactly the batch interval join's (same data, one trigger)."""
    stream = read_event_stream(spark, _stream_dir(sf_dir))
    out = _drain(spark, click_purchase_join_stream(stream), "append")
    return out.orderBy("click_id", "purchase_id")


def enrich_with_segment(stream: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static broadcast join + per-segment aggregation.

    The canonical enrichment topology: when the static dimension
    (customer segment) fits the broadcast threshold, each micro-batch
    joins map-side with no stream-side shuffle; the only stateful
    operator is the small per-segment aggregation. No hard broadcast
    hint — customer is SF-scaled and a user hint is honored
    unconditionally, so the size threshold makes the call (at true
    dimension sizes it broadcasts; past the threshold each micro-batch
    shuffle-joins). The static side is re-resolved per micro-batch — on
    a real deployment that makes slowly-changing dimension updates
    visible to the stream without a restart.
    """
    dim = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return (
        stream.join(dim, "user_id")
        .groupBy("segment")
        .agg(
            F.count("*").alias("events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@_register(
    "streaming_static_enrich",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS events,
           ROUND(SUM(e.value), 4) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension join drained with availableNow.

    Streaming twin of the batch join+agg over the same inputs: every event
    is enriched with its user's market segment from the static customer
    table, then counted per segment. Distinct aggregates are unsupported
    in streaming, so the rollup sticks to COUNT/SUM.
    """
    from data_pipeline_python_aws_cdk_spark.tables import load_table

    stream = read_event_stream(spark, _stream_dir(sf_dir))
    customer = load_table(spark, sf_dir, "customer")
    out = _drain(spark, enrich_with_segment(stream, customer), "complete")
    return out.orderBy("segment")


@_register(
    "streaming_hourly_final",
    oracle="""
    WITH wm AS (SELECT MAX(ts) - INTERVAL 2 HOUR AS w FROM events)
    SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           e.event_type,
           COUNT(*) AS events,
           ROUND(SUM(e.value), 4) AS total_value
    FROM events e, wm
    GROUP BY 1, 2, wm.w
    HAVING date_trunc('hour', MIN(e.ts)) + INTERVAL 1 HOUR <= wm.w
    ORDER BY 1, 2
    """,
)
def streaming_hourly_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode windowed aggregation: only FINALIZED windows are emitted.

    The semantics none of the complete-mode twins exercise: a window row
    appears exactly once, when the watermark (max event time - 2 h)
    passes its end — the contract downstream consumers rely on for
    exactly-once incremental loads. The oracle replays the same rule in
    SQL: emit hourly windows whose end is at or before max(ts) - 2 h; the
    last ~2 h of windows are open state, not results. State size stays
    O(open windows x types) because emission deletes the row from the
    store.
    """
    stream = read_event_stream(spark, _stream_dir(sf_dir))
    out = _drain(spark, hourly_event_counts(stream), "append")
    return out.orderBy("window_start", "event_type")


def _doc_stream_dir(sf_dir: str) -> str:
    """Stage a streaming-source directory for documents.parquet (same
    zero-copy symlink trick as _stream_dir)."""
    import hashlib
    import os
    import tempfile

    src = os.path.abspath(f"{sf_dir}/documents.parquet")
    tag = hashlib.md5(src.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"spark-graft-docstream-{tag}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    return d


@_register(
    "streaming_dedup_exact",
    oracle=(
        "WITH fp AS (SELECT doc_id,\n"
        "  ('0x' || substr(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), 1, 15))::BIGINT AS fp60\n"
        "  FROM documents)\n"
        "SELECT fp60, MIN(doc_id) AS keep_doc_id, COUNT(*) AS copies\n"
        "FROM fp GROUP BY fp60"
    ),
)
def streaming_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest dedup: the exact-dedup operator as a streaming
    aggregation over a document stream — each micro-batch of newly
    ingested documents folds into the per-fingerprint (keep_doc_id,
    copies) state, so the dedup table is continuously current instead of
    recomputed per batch job. Complete-mode drain over the static file;
    the oracle is batch dedup_exact's.

    Deliberately a groupBy-min aggregation, NOT dropDuplicates: streaming
    dropDuplicates keeps the first ARRIVAL, which is partition-order
    dependent (non-deterministic under reshuffling); min(doc_id) is the
    same canonical-survivor rule the batch ladder uses. State is one
    (fp60, min, count) row per distinct fingerprint — the streaming twin
    of the map-side-combined batch shuffle. At 100 TB the unbounded key
    domain would move this to update mode + a TTL'd state store or an
    upsert sink (run_upsert_sink) keyed on fp60.
    """
    from data_pipeline_python_aws_cdk_spark.functions.hashing import hash60
    from data_pipeline_python_aws_cdk_spark.tables import ensure_session_confs

    ensure_session_confs(spark)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(_doc_stream_dir(sf_dir))
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), "\\s+", " "))
    agg = (
        stream.select("doc_id", hash60(normalized).alias("fp60"))
        .groupBy("fp60")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("copies"))
    )
    return _drain(spark, agg, "complete")


@_register(
    "streaming_sliding_counts",
    oracle="""
    WITH covers AS (
      SELECT strftime(
               to_timestamp(
                 (CAST(FLOOR(epoch(ts)) AS BIGINT) // 1800) * 1800 - k * 1800
               ),
               '%Y-%m-%d %H:%M:%S'
             ) AS window_start,
             event_type, value
      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
      WHERE ts IS NOT NULL
    )
    SELECT window_start, event_type, COUNT(*) AS events,
           ROUND(SUM(value), 4) AS total_value
    FROM covers
    GROUP BY window_start, event_type
    """,
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window streaming counts: 1-hour windows every 30 minutes, so
    each event lands in exactly two overlapping windows — the smoothed
    rate/alerting view (tumbling windows jitter at boundaries; dashboards
    and threshold alarms read the overlapped series).

    Streaming shape: ``F.window(ts, '1 hour', '30 minutes')`` replicates
    each event into its covering windows BEFORE the keyed state update, so
    state is O(active windows x types) exactly like the tumbling query —
    the watermark closes both overlapping windows the same way. The oracle
    replays the replication arithmetic: window starts are the two 30-min
    grid points in (ts - 1h, ts], computed on integer epoch-seconds
    (floor-divide, no float), grid-aligned identically in both engines.
    """
    stream = read_event_stream(spark, _stream_dir(sf_dir))
    agg = (
        stream.filter(F.col("ts").isNotNull())
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count("*").alias("events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "events",
            "total_value",
        )
    )
    return _drain(spark, agg, "complete")


def stream_health(query) -> dict:
    """Operational health of a (finished or running) streaming query, from
    its recent progress events: rows/sec, batch durations, watermark
    position, and keyed-state size — the workgroup-metrics surface for
    streams (the batch executor records the same class of numbers in its
    result sidecars).

    Reads the progress the query already emitted; no extra Spark work.
    State metrics exist only for stateful queries (windows/dedup/
    sessionization) — stateless passthroughs report state_rows 0.
    """
    progresses = [p for p in query.recentProgress if p is not None]
    rows_in = sum(int(p.get("numInputRows", 0)) for p in progresses)
    batch_ms = [
        int(p["durationMs"]["triggerExecution"])
        for p in progresses
        if "durationMs" in p and "triggerExecution" in p["durationMs"]
    ]
    state_rows = 0
    state_bytes = 0
    watermark = None
    for p in progresses:
        for so in p.get("stateOperators", []) or []:
            state_rows = max(state_rows, int(so.get("numRowsTotal", 0)))
            state_bytes = max(state_bytes, int(so.get("memoryUsedBytes", 0)))
        em = p.get("eventTime", {}) or {}
        if em.get("watermark"):
            watermark = em["watermark"]
    return {
        "batches": len(progresses),
        "input_rows": rows_in,
        "max_batch_ms": max(batch_ms) if batch_ms else 0,
        "state_rows": state_rows,
        "state_bytes": state_bytes,
        "watermark": watermark,
    }


def run_available_now_with_health(
    stream_result: DataFrame, query_name: str, output_mode: str = "complete"
) -> tuple[list, dict]:
    """``run_available_now`` + the drained query's ``stream_health`` —
    one call for harnesses that assert on both results and state size."""
    spark = stream_result.sparkSession
    q = (
        stream_result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    health = stream_health(q)
    rows = spark.sql(f"SELECT * FROM {query_name}").collect()
    spark.catalog.dropTempView(query_name)
    return rows, health


def run_stream_screen(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    verdict_path: str,
    checkpoint_dir: str,
) -> None:
    """Continuous ingest dedup screen: every micro-batch of arriving
    documents probes the PERSISTED LSH signature index and appends its
    collision verdicts — ``jobs screen`` as a standing stream instead of a
    cron tick, the shape a real curation queue runs (documents land all
    day; each lands in the verdict table seconds later, at O(batch) cost
    against the write-once index).

    foreachBatch composes the batch probe core
    (``dedup.screen_docs_against_index``: batch band signatures, a
    bounded (band, bucket) hit-list collect, partition-pruned index read,
    collision rollup) with checkpointed availableNow/continuous delivery.
    Each batch OVERWRITES its own ``batch_id`` partition (dynamic
    partition overwrite), so a batch replayed after a mid-write crash
    replaces its partial output instead of appending a second copy —
    effectively-once verdicts, the same idempotence discipline as
    run_upsert_sink (a plain append sink would duplicate exactly the
    crashed batch).
    """
    static_schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(static_schema).parquet(docs_dir)

    def _screen(batch_df, batch_id: int) -> None:
        from ..operators.dedup import screen_docs_against_index

        verdicts = screen_docs_against_index(
            batch_df.sparkSession, batch_df, index_dir
        ).withColumn("batch_id", F.lit(int(batch_id)))
        (
            verdicts.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(verdict_path)
        )

    q = (
        stream.writeStream.foreachBatch(_screen)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_quality_screen(
    spark: SparkSession,
    docs_dir: str,
    verdict_path: str,
    checkpoint_dir: str,
) -> None:
    """Continuous ingest quality triage: every micro-batch of arriving
    documents gets the fused quality+artifact verdict
    (operators.text.quality_verdicts — the SAME frame batch backfills
    use, so the stream and a backfill cannot disagree) and lands in the
    verdict table seconds after arrival. The keep/review/drop routes are
    what the downstream pipeline reads to admit documents, queue human
    review, or discard.

    Same effectively-once discipline as run_stream_screen: each batch
    OVERWRITES its own batch_id partition (dynamic partition overwrite),
    so a batch replayed after a mid-write crash replaces its partial
    output instead of appending a duplicate copy.
    """
    static_schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(static_schema).parquet(docs_dir)

    def _screen(batch_df, batch_id: int) -> None:
        from ..operators.text import quality_verdicts

        verdicts = quality_verdicts(batch_df).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        (
            verdicts.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(verdict_path)
        )

    q = (
        stream.writeStream.foreachBatch(_screen)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# --- streaming SCD2 interval build (round 8) ---------------------------------

SCD2_STATE_SCHEMA = (
    "run_id long, cmp_type string, run_min string, valid_from string, "
    "run_events long"
)
SCD2_OUTPUT_SCHEMA = (
    "user_id long, run_id long, state string, valid_from string, "
    "valid_to string, run_events long, is_current boolean"
)


def _update_scd2(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """GroupState update: fold this trigger's events (sorted by event time)
    into the user's open run, emitting every run that CLOSES plus the open
    tail. Replicates the batch operator's NULL semantics exactly: the
    run-head test is `prev IS NULL OR prev <> cur` (so a NULL-typed event
    joins the current run but forces the NEXT event to start a new one),
    and the reported state is the run's MIN over non-NULL types.
    """
    (user_id,) = key
    if state.exists:
        run_id, cmp_type, run_min, valid_from, run_events = state.get
    else:
        run_id, cmp_type, run_min, valid_from, run_events = 0, None, None, None, 0

    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"])
    out: list[tuple] = []
    for r in rows.itertuples(index=False):
        et = None if pd.isna(r.event_type) else r.event_type
        ts_str = r.ts.strftime("%Y-%m-%d %H:%M:%S")
        head = run_id == 0 or cmp_type is None or (et is not None and et != cmp_type)
        if head:
            if run_id > 0:
                out.append(
                    (user_id, run_id, run_min, valid_from, ts_str, run_events, False)
                )
            run_id += 1
            run_min, valid_from, run_events = et, ts_str, 1
        else:
            run_events += 1
            if et is not None and (run_min is None or et < run_min):
                run_min = et
        cmp_type = et
    state.update((run_id, cmp_type, run_min, valid_from, run_events))
    if run_id > 0:
        out.append((user_id, run_id, run_min, valid_from, None, run_events, True))
    yield pd.DataFrame(
        out,
        columns=[
            "user_id", "run_id", "state", "valid_from", "valid_to",
            "run_events", "is_current",
        ],
    )


def scd2_stream(stream: DataFrame) -> DataFrame:
    """Streaming SCD2 interval builder: the CDC dimension-history table
    maintained INCREMENTALLY — each trigger appends the runs it closes and
    re-emits the open tail, instead of rebuilding history from scratch.
    State per user is one open run (five scalars), not the user's history.
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_scd2,
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _scd2_oracle() -> str:
    from ..operators.analytics import ORACLES as _batch_oracles

    return _batch_oracles["events_scd2_user_state"]


@_register("streaming_scd2_state", oracle=_scd2_oracle())
def streaming_scd2_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_scd2_user_state, drained with availableNow:
    applyInPandasWithState folds the event stream into [valid_from,
    valid_to) same-state runs per user, emitting intervals as they close —
    shares the BATCH operator's DuckDB oracle verbatim, so the incremental
    and rebuild formulations are pinned equal (the availableNow single
    drain covers all events; on a live stream later triggers extend the
    history without touching closed rows).

    Per-user state is the open run only — five scalars regardless of
    history length — the property that makes incremental SCD2 viable at
    100 TB where the batch rebuild re-sorts every user's full history.
    Event-time order within a trigger is restored by an in-function sort;
    cross-trigger order is the CDC-log delivery contract (same assumption
    every incremental SCD2 loader makes).
    """
    stream = read_event_stream(spark, _stream_dir(sf_dir))
    out = _drain(spark, scd2_stream(stream), "update")
    return out.orderBy("user_id", "run_id")


def run_stream_substring_screen(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    verdict_path: str,
    checkpoint_dir: str,
) -> None:
    """Continuous exact-substring dedup screening: every micro-batch of
    arriving documents is screened against the PERSISTED standing-corpus
    fingerprint index (operators.dedup.substring_index_build) and routed
    dup / partial_dup / new seconds after arrival — the incremental entry
    point of the exact-substring family, mirroring run_stream_quality_
    screen's shape. The standing corpus is never rescanned: its text was
    tokenized once at index build; each batch joins its own window hashes
    against the int stream.

    Shared-frame discipline: the per-batch verdict IS
    operators.dedup.substring_screen_against_index — the same frame a
    batch backfill calls, so stream and backfill cannot disagree. Same
    effectively-once discipline as the other screens: each batch
    OVERWRITES its own batch_id partition (dynamic partition overwrite),
    so a replayed batch replaces its partial output.
    """
    from ..functions.hashing import assert_hash_mode_meta
    from ..operators.dedup import substring_screen_against_index

    # Window hashes are hash60-derived: a screen under a different hash
    # family than the build would match nothing and route every document
    # 'new' with no error — assert the index's pinned mode up front.
    assert_hash_mode_meta(spark, index_dir)
    static_schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(static_schema).parquet(docs_dir)
    index = spark.read.parquet(index_dir)

    def _screen(batch_df, batch_id: int) -> None:
        verdicts = substring_screen_against_index(batch_df, index).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        (
            verdicts.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(verdict_path)
        )

    q = (
        stream.writeStream.foreachBatch(_screen)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_winnow_screen(
    spark,
    docs_dir: str,
    index_dir: str,
    verdict_path: str,
    checkpoint_dir: str,
) -> None:
    """Continuous winnowing near-dup screening: every micro-batch of
    arriving documents is winnow-fingerprinted and screened against the
    PERSISTED standing-corpus fingerprint index
    (operators.dedup.winnow_index_build), routing each doc
    near_dup_candidate / new seconds after arrival — the MOSS rung's
    incremental entry point, the third member of the screen family
    (LSH bands, exact-substring windows, now winnowed fingerprints).
    The standing corpus is never re-tokenized: its selection ran once at
    index build; each batch joins its own sampled fingerprints against
    the int stream, at ~2/(W+1) of the shingle volume the substring
    screen would touch for the same text.

    Shared-frame discipline: the per-batch verdict IS
    operators.dedup.winnow_screen_against_index — the same frame a batch
    backfill calls, so stream and backfill cannot disagree. Same
    effectively-once discipline as the other screens: each batch
    OVERWRITES its own batch_id partition, so a replayed batch replaces
    its partial output.
    """
    from ..functions.hashing import assert_hash_mode_meta
    from ..operators.dedup import winnow_screen_against_index

    # Fingerprints are hash60-derived: a screen under a different hash
    # family than the build would match nothing and route everything
    # 'new' with no error — assert the index's pinned mode up front.
    assert_hash_mode_meta(spark, index_dir)
    static_schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(static_schema).parquet(docs_dir)
    index = spark.read.parquet(index_dir)

    def _screen(batch_df, batch_id: int) -> None:
        verdicts = winnow_screen_against_index(batch_df, index).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        (
            verdicts.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(verdict_path)
        )

    q = (
        stream.writeStream.foreachBatch(_screen)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_ann_screen(
    spark,
    vecs_dir: str,
    index_dir: str,
    verdict_path: str,
    checkpoint_dir: str,
    append: bool = False,
) -> None:
    """Continuous embedding near-dup screening: every micro-batch of
    arriving (vec_id, embedding) rows probes the PERSISTED IVF index
    (operators.similarity.ivf_build_index) and is routed
    near_dup_candidate / new by its exact top-1 standing-corpus cosine —
    the embedding-space member of the screen family (LSH bands,
    substring windows, winnowed fingerprints), screening vectors the way
    those screen text.

    ``append=True`` closes the ingest loop into SELF-MAINTAINING index
    serving: after each batch's verdicts commit, the batch's ``new``
    vectors are ivf_append_index'ed into the standing index (assigned
    against the frozen ``_centroids`` sidecar, touched lists rewritten),
    so the NEXT batch screens against a corpus that already contains
    them — build once, then screen+append forever, never rebuild.

    Replay discipline: verdicts overwrite their own batch_id partition
    (the family's effectively-once rule), and the append is convergent —
    a replayed batch's vectors are already in the index under their own
    vec_ids, which the screen's BATCH-WIDE candidate exclusion ignores
    (the whole batch id set is anti-joined out, not just each query's
    own id — otherwise a replayed batch containing intra-batch near-dups
    would match its own already-appended members and flip 'new' ->
    'near_dup_candidate' on the second pass), so the verdicts reproduce
    bit-identically and the re-append no-ops (anti-join idempotence).
    Both halves of the replayed batch run with ``resume=True``: the
    append because inside the checkpointed replay loop a batch re-run IS
    the documented torn-append recovery, and the SCREEN because that
    recovery must be reachable — a crash mid-append leaves the marker
    cleared, and a screen that asserted completeness first would raise
    on every replay and wedge the stream (the torn lists still hold
    every standing-corpus row, and batch rows are excluded, so the
    replayed verdicts are unaffected). The screen's resume gate is
    SCOPED, not blanket (the round-12 advice finding): it accepts only a
    complete artifact or one carrying ivf_append_index's
    ``_torn_by_append`` breadcrumb — an index torn by a crashed build or
    compact (which can lose whole lists) still fails loudly on the next
    batch instead of being screened silently.

    Shared-frame discipline: the per-batch verdict IS
    operators.similarity.ann_screen_against_index — the same frame the
    registered ``similarity_ann_screen`` query holds against its SQL
    oracle, so stream, backfill, and driver verification cannot
    disagree.
    """
    from ..operators.similarity import (
        ann_screen_against_index,
        ivf_append_index,
    )

    static_schema = spark.read.parquet(vecs_dir).schema
    stream = spark.readStream.schema(static_schema).parquet(vecs_dir)

    def _screen(batch_df, batch_id: int) -> None:
        verdicts = ann_screen_against_index(
            spark, batch_df, index_dir, resume=append
        ).withColumn("batch_id", F.lit(int(batch_id)))
        (
            verdicts.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(verdict_path)
        )
        if append:
            fresh = (
                spark.read.parquet(verdict_path)
                .filter(
                    (F.col("batch_id") == int(batch_id))
                    & (F.col("verdict") == "new")
                )
                .select("vec_id")
            )
            new_vecs = batch_df.select("vec_id", "embedding").join(
                fresh, "vec_id", "semi"
            )
            ivf_append_index(spark, index_dir, new_vecs, resume=True)

    q = (
        stream.writeStream.foreachBatch(_screen)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
