"""Structured Streaming tier: streaming twins of the batch event analytics."""

from .events import (
    click_purchase_join_stream,
    distinct_pairs_stream,
    hourly_event_counts,
    read_event_stream,
    run_available_now,
    scd2_stream,
    run_to_files,
    sessionize_stream,
    user_running_stats,
)

__all__ = [
    "click_purchase_join_stream",
    "distinct_pairs_stream",
    "hourly_event_counts",
    "read_event_stream",
    "run_available_now",
    "scd2_stream",
    "run_to_files",
    "sessionize_stream",
    "user_running_stats",
]
