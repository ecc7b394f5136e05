"""Streaming twins must agree with their batch counterparts.

Each stream reads the same events parquet via a file source with an
availableNow trigger, so results are deterministic and directly comparable
to the batch operators the oracle harness already validates.
"""

from __future__ import annotations

import shutil

import pytest

from data_pipeline_python_aws_cdk_spark import streaming
from data_pipeline_python_aws_cdk_spark.operators import analytics
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events-stream")
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "batch-000.parquet")
    return str(d)


def test_hourly_counts_match_batch(spark, events_dir):
    stream = streaming.read_event_stream(spark, events_dir)
    rows = streaming.run_available_now(
        streaming.hourly_event_counts(stream), "hourly_counts"
    )
    got = {(r.window_start, r.event_type): (r.events, r.total_value) for r in rows}
    batch = {
        (r.window_start, r.event_type): (r.events, r.total_value)
        for r in analytics.events_hourly_windows(spark, SF_SMOKE).collect()
    }
    assert got == batch


def test_session_windows_emit(spark, events_dir):
    stream = streaming.read_event_stream(spark, events_dir)
    rows = streaming.run_available_now(
        streaming.sessionize_stream(stream), "sessions", output_mode="append"
    )
    # Append mode only emits sessions finalized behind the watermark; the
    # last 2h of event time stays open, so compare against batch as a lower
    # bound and spot-check a user's session count.
    assert len(rows) > 0
    batch_sessions = {
        r.user_id: r.sessions
        for r in analytics.events_sessionize(spark, SF_SMOKE).collect()
    }
    from collections import Counter

    emitted = Counter(r.user_id for r in rows)
    for user, n in emitted.items():
        assert n <= batch_sessions[user]


def test_watermark_drops_late_data_across_batches(spark, tmp_path):
    """True late-data semantics, observable only across micro-batches:
    a checkpointed restart restores the watermark, and an event older than
    it never reaches the aggregation state.

    Batch 1: events at 10:05 and 13:00 -> watermark lands at 11:00 (2h
    behind max event time); the 10:00 window finalizes and is emitted.
    Batch 2: a LATE event at 09:30 (behind the restored watermark - must be
    dropped) plus an on-time event at 16:00 (watermark -> 14:00, so the
    13:00 window finalizes). The 09:00 window must never appear.
    """
    import pyspark.sql.functions as F

    src = tmp_path / "wm-src"
    src.mkdir()
    ckpt = str(tmp_path / "wm-ckpt")

    def write_batch(rows):
        df = spark.createDataFrame(
            rows,
            "event_id long, ts_s string, user_id long, event_type string,"
            " value double, props string",
        ).select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id", "event_type", "value", "props",
        )
        df.coalesce(1).write.mode("append").parquet(str(src))

    out = str(tmp_path / "wm-out")
    write_batch(
        [(1, "2026-01-01 10:05:00", 1, "click", 1.0, "{}"),
         (2, "2026-01-01 13:00:00", 1, "click", 1.0, "{}")]
    )
    stream = streaming.read_event_stream(spark, str(src))
    streaming.run_to_files(streaming.hourly_event_counts(stream), out, ckpt)
    starts1 = {r.window_start for r in spark.read.parquet(out).collect()}
    assert starts1 == {"2026-01-01 10:00:00"}  # only the finalized window

    write_batch(
        [(3, "2026-01-01 09:30:00", 1, "click", 1.0, "{}"),   # LATE: dropped
         (4, "2026-01-01 16:00:00", 1, "click", 1.0, "{}")]
    )
    stream2 = streaming.read_event_stream(spark, str(src))
    streaming.run_to_files(streaming.hourly_event_counts(stream2), out, ckpt)
    rows = spark.read.parquet(out).collect()
    starts2 = {r.window_start for r in rows}
    assert "2026-01-01 09:00:00" not in starts2  # late event never surfaced
    assert "2026-01-01 13:00:00" in starts2  # finalized by advanced watermark
    counts = {r.window_start: r.events for r in rows}
    assert counts["2026-01-01 13:00:00"] == 1  # late row didn't leak in


def test_stateful_running_stats(spark, events_dir):
    stream = streaming.read_event_stream(spark, events_dir)
    rows = streaming.run_available_now(
        streaming.user_running_stats(stream), "user_stats", output_mode="update"
    )
    import pyspark.sql.functions as F

    from data_pipeline_python_aws_cdk_spark.tables import load_table

    batch = {
        r.user_id: (r.events, round(r.total_value, 4))
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("events"), F.sum("value").alias("total_value"))
        .collect()
    }
    got = {r.user_id: (r.events, round(r.total_value, 4)) for r in rows}
    assert got == batch


def test_distinct_pairs_matches_batch(spark, events_dir):
    stream = streaming.read_event_stream(spark, events_dir)
    rows = streaming.run_available_now(
        streaming.distinct_pairs_stream(stream), "distinct_pairs", "append"
    )
    got = {(r.user_id, r.event_type) for r in rows}
    import pyspark.sql.functions as F  # noqa: F401
    from data_pipeline_python_aws_cdk_spark.tables import load_table

    want = {
        (r.user_id, r.event_type)
        for r in load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert got == want
    assert len(rows) == len(got)  # no key emitted twice


def test_dedup_within_watermark_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates inside the watermark
    horizon are suppressed; once a key's state ages out past the watermark,
    a much-later duplicate is treated as new — the documented
    exactness-for-bounded-state trade that makes streaming dedup viable on
    unbounded key domains.
    """
    import pyspark.sql.functions as F

    src = tmp_path / "dd-src"
    src.mkdir()
    ckpt = str(tmp_path / "dd-ckpt")
    out = str(tmp_path / "dd-out")

    def write_batch(rows):
        df = spark.createDataFrame(
            rows,
            "event_id long, ts_s string, user_id long, event_type string,"
            " value double, props string",
        ).select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id", "event_type", "value", "props",
        )
        df.coalesce(1).write.mode("append").parquet(str(src))

    def dedup(stream):
        return (
            stream.withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["event_id"])
            .select("event_id", "ts")
        )

    # Batch 1: id=2 appears twice within the horizon -> one emission.
    # id=9 at 13:00 pushes the watermark to 12:00, expiring id=1/2 state
    # (event time + 1 h delay < 12:00).
    write_batch(
        [(1, "2026-01-01 10:00:00", 1, "click", 1.0, "{}"),
         (2, "2026-01-01 10:00:00", 1, "click", 1.0, "{}"),
         (2, "2026-01-01 10:10:00", 1, "click", 1.0, "{}"),
         (9, "2026-01-01 13:00:00", 1, "click", 1.0, "{}")]
    )
    stream = streaming.read_event_stream(spark, str(src))
    streaming.run_to_files(dedup(stream), out, ckpt)
    ids1 = [r.event_id for r in spark.read.parquet(out).collect()]
    assert sorted(ids1) == [1, 2, 9]  # in-horizon duplicate suppressed

    # Batch 2: id=1 reappears far ahead of its expired state -> re-emitted.
    write_batch([(1, "2026-01-01 13:30:00", 1, "click", 1.0, "{}")])
    stream2 = streaming.read_event_stream(spark, str(src))
    streaming.run_to_files(dedup(stream2), out, ckpt)
    ids2 = [r.event_id for r in spark.read.parquet(out).collect()]
    assert sorted(ids2) == [1, 1, 2, 9]  # aged-out key counted as new


def test_stream_stream_join_matches_batch(spark, events_dir):
    stream = streaming.read_event_stream(spark, events_dir)
    rows = streaming.run_available_now(
        streaming.click_purchase_join_stream(stream), "ssjoin", "append"
    )
    got = {(r.click_id, r.purchase_id) for r in rows}

    from data_pipeline_python_aws_cdk_spark.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    import pyspark.sql.functions as F

    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    want = {
        (r.click_id, r.purchase_id)
        for r in c.join(
            p,
            (F.col("cu") == F.col("pu"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 300 SECOND")),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_foreachbatch_upsert_sink_revises_rows(spark, tmp_path):
    """The foreachBatch MERGE sink must let a later batch REVISE a row the
    file sink could only append: same key, higher version, one survivor —
    across two separately-triggered availableNow runs sharing a checkpoint."""
    from data_pipeline_python_aws_cdk_spark.streaming.events import run_upsert_sink

    src = tmp_path / "src"
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, version long, score double"
    src.mkdir()

    def batch(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / name))

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "10")
            .parquet(f"{src}/*")
        )
        run_upsert_sink(stream, table, ckpt, key_cols=["user_id"], version_col="version")

    batch([(1, 1, 0.1), (2, 1, 0.2), (3, 1, 0.3)], "b1")
    run()
    batch([(2, 2, 9.9), (4, 1, 0.4)], "b2")
    run()

    rows = {r.user_id: r for r in spark.read.parquet(table).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2].version == 2 and rows[2].score == 9.9  # revised, not appended
    assert rows[1].version == 1 and rows[3].version == 1 and rows[4].version == 1

    # replaying the same inputs with the same checkpoint is a no-op
    run()
    again = {r.user_id: (r.version, r.score) for r in spark.read.parquet(table).collect()}
    assert again == {u: (r.version, r.score) for u, r in rows.items()}


def test_upsert_sink_bootstrap_dedups_backlog(spark, tmp_path):
    """Cold start over a backlog: both files are present BEFORE the first
    run, so one micro-batch delivers two versions of the same key — the
    bootstrap write must apply the same last-writer-wins reduction as the
    merge path, not persist both rows."""
    from data_pipeline_python_aws_cdk_spark.streaming.events import run_upsert_sink

    src = tmp_path / "src"
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, version long, score double"
    src.mkdir()
    spark.createDataFrame(
        [(1, 1, 0.1), (2, 1, 0.2), (2, 2, 9.9)], schema
    ).coalesce(1).write.parquet(str(src / "backlog"))

    stream = spark.readStream.schema(schema).parquet(f"{src}/*")
    run_upsert_sink(stream, table, ckpt, key_cols=["user_id"], version_col="version")

    rows = spark.read.parquet(table).collect()
    assert len(rows) == 2  # one survivor per key, no duplicate user_id=2
    by_key = {r.user_id: r for r in rows}
    assert by_key[2].version == 2 and by_key[2].score == 9.9


def test_sliding_counts_double_cover_the_tumbling_series(spark):
    """Every event lands in exactly TWO 1h/30min sliding windows, so the
    sliding series' per-type event totals are exactly 2x the tumbling
    series', and each tumbling hour window appears among the sliding
    window starts."""
    from data_pipeline_python_aws_cdk_spark.streaming import events as events_mod

    sliding = events_mod.QUERIES["streaming_sliding_counts"](spark, SF_SMOKE).collect()
    tumbling = analytics.events_hourly_windows(spark, SF_SMOKE).collect()
    s_tot, t_tot = {}, {}
    for r in sliding:
        s_tot[r.event_type] = s_tot.get(r.event_type, 0) + r.events
    for r in tumbling:
        t_tot[r.event_type] = t_tot.get(r.event_type, 0) + r.events
    assert s_tot == {k: 2 * v for k, v in t_tot.items()}
    hour_starts = {r.window_start for r in tumbling}
    slide_starts = {r.window_start for r in sliding}
    assert hour_starts <= slide_starts


def test_stream_health_reports_state_and_watermark(spark, events_dir):
    """The health surface must expose input volume, batch timing, keyed
    state size, and the advanced watermark for a windowed aggregation."""
    from data_pipeline_python_aws_cdk_spark.streaming.events import (
        run_available_now_with_health,
    )

    stream = streaming.read_event_stream(spark, events_dir)
    rows, health = run_available_now_with_health(
        streaming.hourly_event_counts(stream), "health_probe"
    )
    assert rows and health["batches"] >= 1
    assert health["input_rows"] > 0
    assert health["max_batch_ms"] > 0
    assert health["state_rows"] > 0  # one row per open (window, type)
    assert health["watermark"]  # advanced past epoch by the drain


def test_stream_screen_matches_batch_probe(spark, tmp_path):
    """The continuous ingest dedup screen: foreachBatch probing the
    persisted LSH index must produce exactly the batch probe's verdicts
    (same docs, same index), and a checkpointed re-run must add nothing."""
    import pyspark.sql.functions as F

    from data_pipeline_python_aws_cdk_spark.operators.dedup import (
        lsh_build_index,
        lsh_probe_indexed,
    )
    from data_pipeline_python_aws_cdk_spark.streaming.events import run_stream_screen
    from data_pipeline_python_aws_cdk_spark.tables import load_table

    index_dir = str(tmp_path / "lsh_index")
    lsh_build_index(spark, SF_SMOKE, index_dir)
    docs_dir = str(tmp_path / "incoming")
    load_table(spark, SF_SMOKE, "documents").filter(
        F.col("source") == "src0"
    ).write.parquet(docs_dir)
    verdicts = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    run_stream_screen(spark, docs_dir, index_dir, verdicts, ckpt)
    got = {
        (r.doc_id, r.near_candidates)
        for r in spark.read.parquet(verdicts).collect()
    }
    want = {
        (r.doc_id, r.near_candidates)
        for r in lsh_probe_indexed(spark, index_dir, SF_SMOKE).collect()
    }
    assert got == want and want
    # replay: the checkpoint remembers processed files -> no new verdicts
    run_stream_screen(spark, docs_dir, index_dir, verdicts, ckpt)
    again = spark.read.parquet(verdicts).count()
    assert again == len(got)


def test_stream_quality_screen_matches_batch_and_replays_clean(spark, tmp_path):
    """The streaming quality screen must emit exactly the batch
    quality_verdicts frame for the same documents, and a checkpointed
    re-run must add nothing."""
    import pyspark.sql.functions as F

    from data_pipeline_python_aws_cdk_spark.operators.text import quality_verdicts
    from data_pipeline_python_aws_cdk_spark.streaming.events import (
        run_stream_quality_screen,
    )
    from data_pipeline_python_aws_cdk_spark.tables import load_table

    docs_dir = str(tmp_path / "incoming_q")
    load_table(spark, SF_SMOKE, "documents").filter(
        F.col("source") == "src0"
    ).write.parquet(docs_dir)
    verdicts = str(tmp_path / "qverdicts")
    ckpt = str(tmp_path / "qckpt")
    run_stream_quality_screen(spark, docs_dir, verdicts, ckpt)
    got = {
        (r.doc_id, r.quality_bucket, r.artifact_suspect, r.route)
        for r in spark.read.parquet(verdicts).collect()
    }
    want = {
        (r.doc_id, r.quality_bucket, r.artifact_suspect, r.route)
        for r in quality_verdicts(spark.read.parquet(docs_dir)).collect()
    }
    assert got == want and want
    assert {r[3] for r in got} <= {"keep", "review", "drop"}
    run_stream_quality_screen(spark, docs_dir, verdicts, ckpt)
    assert spark.read.parquet(verdicts).count() == len(got)


def test_streaming_scd2_matches_batch_rebuild(spark, events_dir):
    """The incremental stateful SCD2 must equal the batch window rebuild
    row-for-row on a full availableNow drain — closed intervals, the open
    tail, run numbering, and the MIN-state convention included."""
    stream = streaming.read_event_stream(spark, events_dir)
    rows = streaming.run_available_now(
        streaming.scd2_stream(stream), "scd2_stream", "update"
    )
    got = {
        (r.user_id, r.run_id): (r.state, r.valid_from, r.valid_to,
                                r.run_events, r.is_current)
        for r in rows
    }
    want = {
        (r.user_id, r.run_id): (r.state, r.valid_from, r.valid_to,
                                r.run_events, r.is_current)
        for r in analytics.events_scd2_user_state(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_streaming_scd2_incremental_across_triggers(spark, tmp_path):
    """Two files delivered as separate micro-batches: the second trigger
    must CLOSE the run left open by the first (state carried across
    triggers) and emit the new open tail — per-user state stays five
    scalars, never the history."""
    from datetime import datetime

    d = tmp_path / "scd2inc"
    d.mkdir()
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    t = [datetime(2026, 1, 1, 10, 0, i) for i in range(4)]
    spark.createDataFrame(
        [(1, t[0], 7, "view", 0.0, "{}"), (2, t[1], 7, "view", 0.0, "{}")],
        schema,
    ).coalesce(1).write.parquet(str(d / "f1.parquet"))
    spark.createDataFrame(
        [(3, t[2], 7, "click", 0.0, "{}"), (4, t[3], 7, "view", 0.0, "{}")],
        schema,
    ).coalesce(1).write.parquet(str(d / "f2.parquet"))
    stream = (
        spark.readStream.schema(streaming.events.EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d / "*.parquet"))
    )
    rows = streaming.run_available_now(
        streaming.scd2_stream(stream), "scd2_inc", "update"
    )
    # update-mode memory sink appends per trigger; the FINAL emission per
    # (user, run) is authoritative
    final = {}
    for r in rows:
        final[(r.user_id, r.run_id)] = (r.state, r.valid_from, r.valid_to,
                                        r.run_events, r.is_current)
    assert final == {
        (7, 1): ("view", "2026-01-01 10:00:00", "2026-01-01 10:00:02", 2, False),
        (7, 2): ("click", "2026-01-01 10:00:02", "2026-01-01 10:00:03", 1, False),
        (7, 3): ("view", "2026-01-01 10:00:03", None, 1, True),
    }


def test_stream_substring_screen_routes_against_standing_index(spark, tmp_path):
    """Arriving docs are screened against the persisted standing-corpus
    fingerprint index: a verbatim copy routes dup, a doc embedding a
    standing paragraph routes partial_dup, a novel doc routes new; the
    stream frame equals the batch frame and a checkpointed replay adds
    nothing."""
    from data_pipeline_python_aws_cdk_spark.operators.dedup import (
        substring_index_build,
        substring_screen_against_index,
    )
    from data_pipeline_python_aws_cdk_spark.streaming.events import (
        run_stream_substring_screen,
    )

    standing_text = " ".join(f"st{i}" for i in range(30))
    standing_dir = str(tmp_path / "standing")
    spark.createDataFrame(
        [(1, standing_text, "en", "s", 1),
         (2, " ".join(f"other{i}" for i in range(20)), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{standing_dir}/documents.parquet")
    index_dir = str(tmp_path / "substr_idx")
    substring_index_build(spark, standing_dir, index_dir)

    shared = " ".join(f"st{i}" for i in range(10, 20))  # 10 standing tokens
    arriving = spark.createDataFrame(
        [(100, standing_text, "en", "s", 1),
         (101, " ".join(f"pre{i}" for i in range(15)) + " " + shared, "en", "s", 1),
         (102, " ".join(f"nv{i}" for i in range(25)), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs_dir = str(tmp_path / "incoming_sdd")
    arriving.write.parquet(docs_dir)

    verdicts = str(tmp_path / "sdd_verdicts")
    ckpt = str(tmp_path / "sdd_ckpt")
    run_stream_substring_screen(spark, docs_dir, index_dir, verdicts, ckpt)
    got = {r.doc_id: r for r in spark.read.parquet(verdicts).collect()}
    assert {d: got[d].verdict for d in got} == {
        100: "dup", 101: "partial_dup", 102: "new"
    }
    assert got[100].standing_tokens == 30
    assert got[101].standing_tokens == 10 and got[101].n_hits == 3
    assert got[102].n_hits == 0

    # stream frame == batch frame (shared-frame discipline)
    want = {
        (r.doc_id, r.n_hits, r.standing_tokens, r.verdict)
        for r in substring_screen_against_index(
            spark.read.parquet(docs_dir), spark.read.parquet(index_dir)
        ).collect()
    }
    assert {
        (r.doc_id, r.n_hits, r.standing_tokens, r.verdict) for r in got.values()
    } == want

    run_stream_substring_screen(spark, docs_dir, index_dir, verdicts, ckpt)
    assert spark.read.parquet(verdicts).count() == 3


def test_stream_winnow_screen_routes_against_standing_index(spark, tmp_path):
    """Arriving docs are screened against the persisted winnowed-
    fingerprint index: a verbatim copy of a standing doc routes
    near_dup_candidate with that doc as its best candidate; a novel doc
    routes new; the stream frame equals the batch frame and a
    checkpointed replay adds nothing. Cross-mode probing refuses."""
    import pytest

    from data_pipeline_python_aws_cdk_spark.functions.hashing import HASH_MODE_ENV
    from data_pipeline_python_aws_cdk_spark.operators.dedup import (
        winnow_index_build,
        winnow_screen_against_index,
    )
    from data_pipeline_python_aws_cdk_spark.streaming.events import (
        run_stream_winnow_screen,
    )

    standing_text = " ".join(f"st{i}" for i in range(30))
    standing_dir = str(tmp_path / "w_standing")
    spark.createDataFrame(
        [(1, standing_text, "en", "s", 1),
         (2, " ".join(f"other{i}" for i in range(20)), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{standing_dir}/documents.parquet")
    index_dir = str(tmp_path / "winnow_idx")
    winnow_index_build(spark, standing_dir, index_dir)

    arriving = spark.createDataFrame(
        [(100, standing_text, "en", "s", 1),
         (102, " ".join(f"nv{i}" for i in range(25)), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs_dir = str(tmp_path / "incoming_wscr")
    arriving.write.parquet(docs_dir)

    verdicts = str(tmp_path / "wscr_verdicts")
    ckpt = str(tmp_path / "wscr_ckpt")
    run_stream_winnow_screen(spark, docs_dir, index_dir, verdicts, ckpt)
    got = {r.doc_id: r for r in spark.read.parquet(verdicts).collect()}
    assert {d: got[d].verdict for d in got} == {
        100: "near_dup_candidate", 102: "new"
    }
    # the verbatim copy's strongest candidate is the standing original,
    # sharing its full winnowed fingerprint set (identical text selects
    # identical local minima)
    assert got[100].best_standing_doc == 1
    assert got[100].best_common == got[100].n_fingerprints
    assert got[102].n_candidates == 0 and got[102].best_standing_doc is None

    # stream frame == batch frame (shared-frame discipline)
    want = {
        (r.doc_id, r.n_fingerprints, r.n_candidates, r.verdict)
        for r in winnow_screen_against_index(
            spark.read.parquet(docs_dir), spark.read.parquet(index_dir)
        ).collect()
    }
    assert {
        (r.doc_id, r.n_fingerprints, r.n_candidates, r.verdict)
        for r in got.values()
    } == want

    # replay idempotence: the same batch overwrites its own partition
    run_stream_winnow_screen(spark, docs_dir, index_dir, verdicts, ckpt)
    assert spark.read.parquet(verdicts).count() == 2

    # hash-mode pinning: a cross-mode screen must refuse loudly
    mp = pytest.MonkeyPatch()
    try:
        mp.setenv(HASH_MODE_ENV, "production")
        with pytest.raises(ValueError, match="HASH_MODE"):
            run_stream_winnow_screen(
                spark, docs_dir, index_dir,
                str(tmp_path / "v2"), str(tmp_path / "c2"),
            )
    finally:
        mp.undo()


def test_stream_ann_screen_routes_appends_and_replays(spark, tmp_path):
    """The embedding ingest loop: a batch vector identical to a standing
    corpus vector routes near_dup_candidate with it as match; an
    orthogonal vector routes new and (append=True) joins the standing
    index, so a LATER batch's copy of it routes near_dup_candidate
    against the appended vector — self-maintaining serving. The stream
    frame equals the batch backfill frame batch-for-batch, and replaying
    each batch against the post-append index reproduces its verdicts
    bit-identically (the batch-wide candidate exclusion: an appended
    batch must not match its own members on replay)."""
    import pyspark.sql.functions as F
    from data_pipeline_python_aws_cdk_spark.operators.similarity import (
        ann_screen_against_index,
        ivf_build_index,
    )
    from data_pipeline_python_aws_cdk_spark.streaming.events import (
        run_stream_ann_screen,
    )

    def one_hot(i):
        return [1.0 if j == i else 0.0 for j in range(64)]

    corpus = spark.createDataFrame(
        [(i, one_hot(i)) for i in range(32)],
        "vec_id long, embedding array<float>",
    )
    index_dir = str(tmp_path / "ivf_idx")
    ivf_build_index(spark, str(tmp_path), index_dir, vectors=corpus)

    vecs_dir = str(tmp_path / "incoming_vecs")
    spark.createDataFrame(
        [(100, one_hot(20)), (101, one_hot(50))],
        "vec_id long, embedding array<float>",
    ).write.parquet(vecs_dir)
    verdicts = str(tmp_path / "ann_verdicts")
    ckpt = str(tmp_path / "ann_ckpt")
    run_stream_ann_screen(spark, vecs_dir, index_dir, verdicts, ckpt, append=True)
    got = {r.vec_id: r for r in spark.read.parquet(verdicts).collect()}
    assert got[100].verdict == "near_dup_candidate"
    assert got[100].match_id == 20 and got[100].cosine == 1.0
    assert got[101].verdict == "new"
    idx_ids = {r.vec_id for r in spark.read.parquet(index_dir).collect()}
    assert 101 in idx_ids and 100 not in idx_ids and len(idx_ids) == 33

    # a later batch's copy of the APPENDED vector now matches it
    spark.createDataFrame(
        [(200, one_hot(50))], "vec_id long, embedding array<float>"
    ).write.mode("append").parquet(vecs_dir)
    run_stream_ann_screen(spark, vecs_dir, index_dir, verdicts, ckpt, append=True)
    got = {r.vec_id: r for r in spark.read.parquet(verdicts).collect()}
    assert got[200].verdict == "near_dup_candidate"
    assert got[200].match_id == 101 and got[200].cosine == 1.0
    assert {r.vec_id for r in spark.read.parquet(index_dir).collect()} == idx_ids

    # stream frames == the batch backfill frame, batch for batch, and a
    # checkpointed REPLAY of either batch against the now-appended index
    # reproduces its verdicts bit-identically (batch-wide exclusion:
    # 101's appended copy is invisible to its own batch's replay)
    all_vecs = spark.read.parquet(vecs_dir)
    for batch_ids in ({100, 101}, {200}):
        batch = all_vecs.filter(F.col("vec_id").isin(list(batch_ids)))
        replay = {
            (r.vec_id, r.verdict, r.match_id)
            for r in ann_screen_against_index(
                spark, batch, index_dir, resume=True
            ).collect()
        }
        assert replay == {
            (r.vec_id, r.verdict, r.match_id)
            for r in got.values()
            if r.vec_id in batch_ids
        }
    assert {r.vec_id for r in spark.read.parquet(index_dir).collect()} == idx_ids


def test_stream_ann_screen_replay_of_intra_batch_dups_is_deterministic(
    spark, tmp_path
):
    """The replay-determinism contract the append mode rests on: a batch
    holding two near-identical vectors (both far from the standing
    corpus) routes BOTH 'new', appends both — and a checkpointed replay
    of that same batch still routes both 'new', because the entire batch
    id set is excluded from candidates. Excluding only self-matches
    would flip them 'near_dup_candidate' against each other's appended
    copies, overwrite the verdict partition differently than the first
    run, and leave the index holding vectors whose recorded verdict
    disagrees."""
    import pyspark.sql.functions as F  # noqa: F401

    from data_pipeline_python_aws_cdk_spark.operators.similarity import (
        ann_screen_against_index,
        ivf_append_index,
        ivf_build_index,
    )

    def one_hot(i):
        return [1.0 if j == i else 0.0 for j in range(64)]

    corpus = spark.createDataFrame(
        [(i, one_hot(i)) for i in range(32)],
        "vec_id long, embedding array<float>",
    )
    index_dir = str(tmp_path / "ivf_idx")
    ivf_build_index(spark, str(tmp_path), index_dir, vectors=corpus)

    # intra-batch near-dup pair, both orthogonal to the standing corpus
    batch = spark.createDataFrame(
        [(300, one_hot(55)), (301, one_hot(55))],
        "vec_id long, embedding array<float>",
    )
    first = {
        r.vec_id: (r.verdict, r.match_id)
        for r in ann_screen_against_index(spark, batch, index_dir).collect()
    }
    # best standing-corpus match rides along even below threshold
    # (cosine 0 ties break to the lowest neighbor id)
    assert first == {300: ("new", 0), 301: ("new", 0)}
    ivf_append_index(spark, index_dir, batch)
    assert {300, 301} <= {
        r.vec_id for r in spark.read.parquet(index_dir).collect()
    }

    # the checkpointed replay: same batch, index now holds both members
    replay = {
        r.vec_id: (r.verdict, r.match_id)
        for r in ann_screen_against_index(
            spark, batch, index_dir, resume=True
        ).collect()
    }
    assert replay == first  # batch-wide exclusion, not just self-exclusion

    # ...while a genuinely LATER arrival of the same direction does match
    later = spark.createDataFrame(
        [(400, one_hot(55))], "vec_id long, embedding array<float>"
    )
    got = ann_screen_against_index(spark, later, index_dir).collect()[0]
    assert got.verdict == "near_dup_candidate" and got.match_id == 300


def test_stream_ann_screen_torn_append_recovery_is_reachable(spark, tmp_path):
    """A crash mid-ivf_append_index leaves the completion marker cleared;
    the checkpointed batch re-run IS the documented recovery, so the
    replayed screen must tolerate the torn marker (resume path) instead
    of asserting completeness and wedging the stream — then the
    convergent re-append repairs and re-marks the artifact."""
    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        INDEX_COMPLETE_SIDECAR,
        assert_index_complete,
        mark_torn_by_append,
        torn_by_append,
    )
    from data_pipeline_python_aws_cdk_spark.operators.similarity import (
        ivf_build_index,
    )
    from data_pipeline_python_aws_cdk_spark.streaming.events import (
        run_stream_ann_screen,
    )

    def one_hot(i):
        return [1.0 if j == i else 0.0 for j in range(64)]

    corpus = spark.createDataFrame(
        [(i, one_hot(i)) for i in range(32)],
        "vec_id long, embedding array<float>",
    )
    index_dir = str(tmp_path / "ivf_idx")
    ivf_build_index(spark, str(tmp_path), index_dir, vectors=corpus)

    vecs_dir = str(tmp_path / "incoming_vecs")
    spark.createDataFrame(
        [(500, one_hot(40)), (501, one_hot(10))],
        "vec_id long, embedding array<float>",
    ).write.parquet(vecs_dir)

    # simulate the torn append the previous run died in: ivf_append_index
    # drops its breadcrumb BEFORE clearing the marker, so the crash state
    # carries both
    mark_torn_by_append(spark, index_dir)
    shutil.rmtree(tmp_path / "ivf_idx" / INDEX_COMPLETE_SIDECAR)

    verdicts = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    run_stream_ann_screen(spark, vecs_dir, index_dir, verdicts, ckpt, append=True)

    got = {r.vec_id: r.verdict for r in spark.read.parquet(verdicts).collect()}
    assert got == {500: "new", 501: "near_dup_candidate"}
    assert_index_complete(spark, index_dir)  # the re-append re-marked it
    assert not torn_by_append(spark, index_dir)  # ...and dropped the crumb
    assert 500 in {r.vec_id for r in spark.read.parquet(index_dir).collect()}


def test_stream_ann_screen_resume_rejects_torn_build_or_compact(
    spark, tmp_path
):
    """The round-12 advice finding: the append-mode stream's resume gate
    must be SCOPED to append-tears. An index torn by a crashed BUILD or
    COMPACT (marker cleared, no _torn_by_append breadcrumb — those paths
    never drop one) can be missing whole inverted lists, so the screen
    must fail loudly even under resume instead of silently verdicting
    against a partial corpus."""
    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        INDEX_COMPLETE_SIDECAR,
    )
    from data_pipeline_python_aws_cdk_spark.operators.similarity import (
        ann_screen_against_index,
        ivf_build_index,
    )

    def one_hot(i):
        return [1.0 if j == i else 0.0 for j in range(64)]

    corpus = spark.createDataFrame(
        [(i, one_hot(i)) for i in range(32)],
        "vec_id long, embedding array<float>",
    )
    index_dir = str(tmp_path / "ivf_idx")
    ivf_build_index(spark, str(tmp_path), index_dir, vectors=corpus)

    # a torn build/compact clears the marker without a breadcrumb
    shutil.rmtree(tmp_path / "ivf_idx" / INDEX_COMPLETE_SIDECAR)

    batch = spark.createDataFrame(
        [(500, one_hot(40))], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="_torn_by_append"):
        ann_screen_against_index(spark, batch, index_dir, resume=True)
