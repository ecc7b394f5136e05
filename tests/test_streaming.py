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
